"""Byte-array (string) stream codecs.

- DELTA_LENGTH_BYTE_ARRAY: lengths as DELTA_BINARY_PACKED + concatenated raw
  bytes (reference ``src/encodings/encoding.rs:796-859``). The flat
  (lengths, data) form is exactly Arrow's string layout, so encode/decode is
  zero-copy-ish and fully vectorized.
- DELTA_BYTE_ARRAY (incremental / front coding): shared-prefix lengths as
  DELTA_BINARY_PACKED + suffixes as DELTA_LENGTH_BYTE_ARRAY (reference
  ``src/encodings/encoding.rs:866-952``, prefix-match loop ``:907-920``).
"""

from __future__ import annotations

import numpy as np

from . import delta_for


def flat_from_values(values) -> tuple[np.ndarray, bytes]:
    """(lengths, concat utf-8 data) from an iterable of str/bytes."""
    bs = [v.encode() if isinstance(v, str) else bytes(v) for v in values]
    lengths = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    return lengths, b"".join(bs)


def flat_from_arrow(arr) -> tuple[np.ndarray, bytes]:
    """(lengths int64, concat data) lifted straight from a NON-NULL Arrow
    string/binary array's (offsets, data) buffers — zero per-value Python.
    Shared by the encode hot path and the DICT_BA uniques extraction so the
    offset arithmetic (and its int32 overflow guard) live in one place.
    Handles both 32-bit (string/binary) and 64-bit (large_string/
    large_binary) offset layouts — the Arrow-native encode path hands
    Spark's batches over verbatim, and a session running with
    ``spark.sql.execution.arrow.useLargeVarTypes=true`` delivers large
    types; parsing their int64 offsets as int32 would silently corrupt
    every length (r8 review)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        # pa.Array.from_pandas silently chunks when the concatenated data
        # overflows int32 offsets — the frame format requires paging instead
        raise ValueError("byte-array chunk exceeds 2^31 bytes; page the column")
    if len(arr) == 0:
        return np.empty(0, np.int64), b""
    off_dt = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    offs = np.frombuffer(arr.buffers()[1], off_dt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    if offs[-1] - offs[0] > np.iinfo(np.int32).max:
        raise ValueError("byte-array chunk exceeds 2^31 bytes; page the column")
    lengths = np.diff(offs)
    data = arr.buffers()[2].slice(int(offs[0]), int(offs[-1] - offs[0])).to_pybytes()
    return lengths, data


def encode_delta_length(lengths: np.ndarray, data: bytes) -> bytes:
    lens32 = np.ascontiguousarray(lengths, dtype=np.int32)
    lens_enc = delta_for.encode(lens32, "int32")
    return len(lens_enc).to_bytes(4, "little") + lens_enc + data


def decode_delta_length(buf: bytes | np.ndarray, n: int) -> tuple[np.ndarray, bytes]:
    raw = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf
    hlen = int.from_bytes(raw[:4].tobytes(), "little")
    lengths = delta_for.decode(raw[4 : 4 + hlen], n, "int32").astype(np.int64)
    total = int(lengths.sum())
    data = raw[4 + hlen : 4 + hlen + total].tobytes()
    return lengths, data


def _common_prefix_lengths(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Vectorized shared-prefix length of each value with its predecessor."""
    n = len(lengths)
    out = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return out
    off = np.concatenate(([0], np.cumsum(lengths)))
    maxlens = np.minimum(lengths[:-1], lengths[1:])
    m = int(maxlens.max()) if len(maxlens) else 0
    # compare prefix bytes column-by-column (bounded by longest common span)
    alive = maxlens > 0
    eq_so_far = np.ones(n - 1, dtype=bool)
    for k in range(m):
        sel = alive & eq_so_far & (k < maxlens)
        if not sel.any():
            break
        idx = np.flatnonzero(sel)
        a = data[off[idx] + k]
        b = data[off[idx + 1] + k]
        match = a == b
        eq_so_far[idx[~match]] = False
        out[idx[match] + 1] += 1
    return out


def encode_delta_byte_array(lengths: np.ndarray, data: bytes) -> bytes:
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    if lengths.size == 0:
        pre_enc = delta_for.encode(np.empty(0, np.int32), "int32")
        return len(pre_enc).to_bytes(4, "little") + pre_enc + encode_delta_length(
            lengths, b""
        )
    arr = np.frombuffer(data, np.uint8)
    prefix = _common_prefix_lengths(lengths, arr)
    suffix_lens = lengths - prefix
    off = np.concatenate(([0], np.cumsum(lengths)))
    starts = off[:-1] + prefix
    total = int(suffix_lens.sum())
    rep = np.repeat(starts, suffix_lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(suffix_lens)[:-1])), suffix_lens
    )
    suffix_data = arr[rep + within].tobytes() if total else b""
    pre_enc = delta_for.encode(prefix.astype(np.int32), "int32")
    body = encode_delta_length(suffix_lens, suffix_data)
    return len(pre_enc).to_bytes(4, "little") + pre_enc + body


def decode_delta_byte_array(buf: bytes | np.ndarray, n: int) -> tuple[np.ndarray, bytes]:
    raw = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf
    plen = int.from_bytes(raw[:4].tobytes(), "little")
    prefix = delta_for.decode(raw[4 : 4 + plen], n, "int32").astype(np.int64)
    suffix_lens, suffix_data = decode_delta_length(raw[4 + plen :], n)
    return reassemble_front_coded(prefix, suffix_lens, suffix_data)


def reassemble_front_coded(
    prefix: np.ndarray, suffix_lens: np.ndarray, suffix_data: bytes
) -> tuple[np.ndarray, bytes]:
    """Rebuild (lengths, concat data) from front-coded parts. Shared by the
    engine's own DELTA_BYTE_ARRAY frame decode and the real-parquet
    golden-file reader (``engine/parquet_compat.py``), whose streams carry
    the identical (prefix, suffix) grammar without the 4-byte framing.

    Reconstruction is inherently sequential across values (each prefix
    copies from its predecessor), but every copy is a bulk C slice; the
    loop carries plain Python ints (.tolist(), ~3x cheaper than numpy
    scalar indexing). A fully vectorized per-column origin resolution was
    measured SLOWER (0.9x) — the per-column forward-fill over n values
    costs more than the interpreter loop it removes."""
    n = len(prefix)
    lengths = prefix + suffix_lens
    out = bytearray(int(lengths.sum()))
    offs = np.concatenate(([0], np.cumsum(lengths))).tolist()
    soffs = np.concatenate(([0], np.cumsum(suffix_lens))).tolist()
    prefs = prefix.tolist()
    prev = 0
    for i in range(n):
        o = offs[i]
        p = prefs[i]
        if p:
            out[o : o + p] = out[prev : prev + p]
        out[o + p : offs[i + 1]] = suffix_data[soffs[i] : soffs[i + 1]]
        prev = o
    return lengths, bytes(out)
