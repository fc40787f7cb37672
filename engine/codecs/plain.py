"""PLAIN encoding: raw little-endian back-to-back values.

Reference: ``PlainEncoder`` ``src/encodings/encoding.rs:94-181`` /
``PlainDecoder`` ``src/encodings/decoding.rs:88-247``.

- fixed-width numerics: native LE bytes (numpy buffers already are);
- BOOLEAN: bit-packed 1 bit per value, LSB-first;
- BYTE_ARRAY: per value, u32 LE length + raw bytes.
"""

from __future__ import annotations

import numpy as np

from . import bitpack

_FIXED_DTYPES = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "float32": np.dtype("<f4"),
    "float64": np.dtype("<f8"),
}


def encode(values: np.ndarray, dtype: str = "int32") -> bytes:
    if dtype == "bool":
        v = np.ascontiguousarray(values, dtype=np.uint8)
        return np.packbits(v, bitorder="little").tobytes()
    return np.ascontiguousarray(values, dtype=_FIXED_DTYPES[dtype]).tobytes()


def decode(buf: bytes | np.ndarray, n: int, dtype: str = "int32") -> np.ndarray:
    raw = buf.tobytes() if isinstance(buf, np.ndarray) else buf
    if dtype == "bool":
        bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8), bitorder="little", count=n)
        return bits.astype(bool)
    dt = _FIXED_DTYPES[dtype]
    return np.frombuffer(raw, dtype=dt, count=n)


def encode_byte_arrays(lengths: np.ndarray, data: bytes) -> bytes:
    """BYTE_ARRAY plain layout: interleave u32 LE lengths with payload slices.

    ``data`` is the concatenation of all byte arrays; ``lengths`` their sizes.
    Vectorized via offset scatter (no per-value Python).
    """
    lengths = np.ascontiguousarray(lengths, dtype=np.uint32)
    n = lengths.size
    if n == 0:
        return b""
    payload = np.frombuffer(data, dtype=np.uint8)
    out_lens = lengths.astype(np.int64) + 4
    out_off = np.concatenate(([0], np.cumsum(out_lens)))
    out = np.empty(out_off[-1], dtype=np.uint8)
    # scatter the 4 length bytes
    len_le = lengths[:, None].view(np.uint8).reshape(n, 4)
    for k in range(4):
        out[out_off[:-1] + k] = len_le[:, k]
    # scatter payload bytes: build a gather index mapping
    src_off = np.concatenate(([0], np.cumsum(lengths.astype(np.int64))))
    mask = np.ones(out_off[-1], dtype=bool)
    for k in range(4):
        mask[out_off[:-1] + k] = False
    # positions of payload bytes in out, in order == payload order
    out[mask] = payload
    return out.tobytes()


def decode_byte_arrays(buf: bytes | np.ndarray, n: int) -> tuple[np.ndarray, bytes]:
    """Inverse -> (lengths, concatenated data)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if n == 0:
        return np.empty(0, dtype=np.uint32), b""
    lengths = np.empty(n, dtype=np.int64)
    pos = 0
    # first pass: walk headers (n iterations but O(1) each; header walk is
    # unavoidable for this self-describing layout)
    starts = np.empty(n, dtype=np.int64)
    for i in range(n):
        if pos + 4 > raw.size:
            # a lying value count or truncated payload would otherwise
            # read empty slices as zero-length values forever
            raise ValueError(
                f"byte-array payload exhausted at value {i} of {n}"
            )
        ln = int.from_bytes(raw[pos : pos + 4].tobytes(), "little")
        lengths[i] = ln
        starts[i] = pos + 4
        pos += 4 + ln
    if pos > raw.size:
        raise ValueError("byte-array payload truncated mid-value")
    mask = np.zeros(len(raw[:pos]), dtype=bool)
    ends = starts + lengths
    for i in range(n):
        mask[starts[i] : ends[i]] = True
    data = raw[:pos][mask].tobytes()
    return lengths.astype(np.uint32), data
