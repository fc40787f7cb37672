"""DELTA_BINARY_PACKED — frame-of-reference over deltas (the flagship codec
for monotone int32 token streams).

Layout (reference ``DeltaBitPackEncoder``, ``src/encodings/encoding.rs:506-652``)::

    header    := uleb(block_size=128) uleb(num_mini_blocks=4)
                 uleb(total_value_count) zigzag_uleb(first_value)
    block     := zigzag_uleb(min_delta) <4 miniblock bit-width bytes>
                 <miniblocks bit-packed at their own widths>

- deltas use *wrapping* int32 (or int64) subtraction
  (``src/encodings/encoding.rs:748-768``);
- each block's min_delta is subtracted so packed values are unsigned
  (``flush_block_values``, ``src/encodings/encoding.rs:593-652``);
- the last partial miniblock is zero-padded to 32 values; unused trailing
  miniblock widths are written as 0 (fresh buffer in the reference);
- decode is cumulative wrapping add (``src/encodings/decoding.rs:535-572``),
  done here as one uint64 ``np.cumsum`` mod 2**32 / 2**64.
"""

from __future__ import annotations

import numpy as np

from . import bitpack

BLOCK_SIZE = 128
NUM_MINI_BLOCKS = 4
MINI_BLOCK_SIZE = BLOCK_SIZE // NUM_MINI_BLOCKS  # 32

_I32 = {"int32": (np.uint32, np.int32, 32), "int64": (np.uint64, np.int64, 64)}


def encode(values: np.ndarray, dtype: str = "int32") -> bytes:
    utype, itype, nbits = _I32[dtype]
    v = np.ascontiguousarray(values, dtype=itype).view(utype).astype(np.uint64)
    n = v.size
    first = int(v[0]) if n else 0
    first_signed = first - (1 << nbits) if first >= (1 << (nbits - 1)) else first

    out = bytearray()
    out += bitpack.uleb128_encode(BLOCK_SIZE)
    out += bitpack.uleb128_encode(NUM_MINI_BLOCKS)
    out += bitpack.uleb128_encode(n)
    out += bitpack.uleb128_encode(bitpack.zigzag_encode(first_signed))
    if n <= 1:
        return bytes(out)

    mask = np.uint64((1 << nbits) - 1)
    deltas = (v[1:] - v[:-1]) & mask  # wrapping subtraction in the uint domain
    nd = deltas.size
    nblocks = (nd + BLOCK_SIZE - 1) // BLOCK_SIZE
    padded = np.zeros(nblocks * BLOCK_SIZE, dtype=np.uint64)
    padded[:nd] = deltas
    blocks = padded.reshape(nblocks, NUM_MINI_BLOCKS, MINI_BLOCK_SIZE)

    # per-block min over REAL deltas only (padding must not affect min)
    block_valid = np.minimum(
        np.maximum(nd - np.arange(nblocks) * BLOCK_SIZE, 0), BLOCK_SIZE
    )
    half = np.uint64(1 << (nbits - 1))
    for b in range(nblocks):
        valid = int(block_valid[b])
        flat = blocks[b].reshape(-1)[:valid]
        # min over *signed* interpretation of the wrapped deltas
        if nbits == 64:
            signed = flat.view(np.int64)
        else:
            signed = flat.astype(np.int64)
            signed = np.where(flat >= half, signed - (1 << nbits), signed)
        min_delta = int(signed.min())
        out += bitpack.uleb128_encode(bitpack.zigzag_encode(min_delta))
        # subtract min_delta with wrapping in the nbits domain -> unsigned
        sub = (flat - (np.uint64(min_delta & int(mask)))) & mask
        widths = []
        packed_parts = []
        for m in range(NUM_MINI_BLOCKS):
            lo, hi = m * MINI_BLOCK_SIZE, (m + 1) * MINI_BLOCK_SIZE
            if lo >= valid:
                widths.append(0)
                packed_parts.append(b"")
                continue
            mb = sub[lo:min(hi, valid)]
            w = bitpack.num_required_bits(int(mb.max()))
            widths.append(w)
            if len(mb) < MINI_BLOCK_SIZE:  # zero-pad last partial miniblock
                mb = np.concatenate((mb, np.zeros(MINI_BLOCK_SIZE - len(mb), np.uint64)))
            packed_parts.append(bitpack.pack(mb, w) if w else b"")
        out += bytes(widths)
        for p in packed_parts:
            out += p
    return bytes(out)


def decode(buf: bytes | np.ndarray, n: int | None = None, dtype: str = "int32") -> np.ndarray:
    utype, itype, nbits = _I32[dtype]
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    pos = 0
    block_size, pos = bitpack.uleb128_decode(raw, pos)
    num_mini, pos = bitpack.uleb128_decode(raw, pos)
    total, pos = bitpack.uleb128_decode(raw, pos)
    zz_first, pos = bitpack.uleb128_decode(raw, pos)
    first = bitpack.zigzag_decode(zz_first)
    if n is None:
        n = total
    if n == 0:
        return np.empty(0, dtype=itype)
    mini_size = block_size // num_mini
    mask = (1 << nbits) - 1

    nd = total - 1
    deltas = np.empty(nd, dtype=np.uint64)
    got = 0
    while got < nd:
        zz_min, pos = bitpack.uleb128_decode(raw, pos)
        min_delta = bitpack.zigzag_decode(zz_min)
        widths = raw[pos : pos + num_mini]
        pos += num_mini
        for m in range(num_mini):
            if got >= nd:
                break
            w = int(widths[m])
            take = min(mini_size, nd - got)
            if w == 0:
                vals = np.zeros(take, dtype=np.uint64)
            else:
                nbytes = mini_size * w // 8
                vals = bitpack.unpack(raw[pos : pos + nbytes], w, mini_size)[:take]
                pos += nbytes
            deltas[got : got + take] = (vals + np.uint64(min_delta & mask)) & np.uint64(mask)
            got += take

    # cumulative wrapping add in uint64 (exact mod-2**nbits arithmetic)
    acc = np.empty(total, dtype=np.uint64)
    acc[0] = np.uint64(first & mask)
    acc[1:] = np.cumsum(deltas, dtype=np.uint64)
    acc[1:] = (acc[1:] + acc[0]) & np.uint64(mask)
    if nbits == 32:
        result = acc.astype(np.uint32).view(np.int32)
    else:
        result = acc.view(np.int64)
    return result[:n]
