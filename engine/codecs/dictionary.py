"""Dictionary encoding: first-occurrence-ordered uniques + RLE-hybrid indices.

Reference ``DictEncoder`` (``src/encodings/encoding.rs:186-413``):

- the hash-table build preserves *insertion order* of uniques
  (``put_one``/``add_dict_key``, ``src/encodings/encoding.rs:292-321``) —
  ``pd.factorize`` produces the identical (codes, uniques) pair without any
  per-value Python;
- dict page = PLAIN-encoded uniques (``write_dict``,
  ``src/encodings/encoding.rs:262-267``);
- data page = 1 byte bit width + RLE/bit-packed hybrid of the indices
  (``write_indices``, ``src/encodings/encoding.rs:272-289``), with
  ``bit_width = log2(num_entries)`` (``:325-334``);
- decode gathers ``uniques[codes]`` — the batch fusion of
  ``RleDecoder::get_batch_with_dict`` (``src/encodings/rle.rs:437-487``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bitpack, plain, rle

_SIZES = {"int32": 4, "int64": 8, "float32": 4, "float64": 8}


def encode(values: np.ndarray, dtype: str = "int32") -> tuple[bytes, bytes]:
    """-> (dict page bytes, indices page bytes)."""
    codes, uniques = pd.factorize(np.ascontiguousarray(values), use_na_sentinel=False)
    dict_page = plain.encode(np.asarray(uniques), dtype)
    width = bitpack.dict_bit_width(len(uniques))
    indices = bytes([width]) + rle.encode(codes.astype(np.uint64), width)
    return dict_page, indices


def decode(dict_page: bytes, indices: bytes, n: int, dtype: str = "int32") -> np.ndarray:
    raw = np.frombuffer(indices, dtype=np.uint8)
    width = int(raw[0]) if len(raw) else 0
    codes = rle.decode(raw[1:], width, n).astype(np.int64)
    uniques = plain.decode(dict_page, len(dict_page) // _SIZES[dtype], dtype)
    return uniques[codes]


# --- string dictionaries ----------------------------------------------------


def encode_strings(values: pd.Series | np.ndarray) -> tuple[bytes, bytes]:
    """Dictionary-encode a string column (pandas Series / object array).

    Dict page uses the BYTE_ARRAY plain layout (u32 len + bytes per unique,
    reference ``src/encodings/encoding.rs:152-158``).
    """
    codes, uniques = pd.factorize(np.asarray(values, dtype=object), use_na_sentinel=False)
    ubytes = [u.encode() if isinstance(u, str) else bytes(u) for u in uniques]
    ulens = np.fromiter((len(u) for u in ubytes), dtype=np.int64, count=len(ubytes))
    dict_page = plain.encode_byte_arrays(ulens, b"".join(ubytes))
    width = bitpack.dict_bit_width(len(ubytes))
    indices = bytes([width]) + rle.encode(codes.astype(np.uint64), width)
    return dict_page, indices


def decode_strings(dict_page: bytes, indices: bytes, n: int) -> tuple[np.ndarray, bytes]:
    """-> (lengths uint32, concatenated utf-8 data) in original value order.

    Stays in flat (lengths, data) form — the Arrow string layout — so the
    caller can build an Arrow/pandas column with zero per-value Python.
    """
    if n == 0:
        return np.empty(0, dtype=np.uint32), b""
    raw = np.frombuffer(indices, dtype=np.uint8)
    width = int(raw[0]) if len(raw) else 0
    codes = rle.decode(raw[1:], width, n).astype(np.int64)
    draw = np.frombuffer(dict_page, dtype=np.uint8)
    ulens, udata = plain.decode_byte_arrays(draw, _count_byte_arrays(draw))
    uoff = np.concatenate(([0], np.cumsum(ulens.astype(np.int64))))
    out_lens = ulens.astype(np.int64)[codes]
    total = int(out_lens.sum())
    src = np.frombuffer(udata, dtype=np.uint8)
    # gather index: for output byte j belonging to value i at offset k,
    # src position = uoff[codes[i]] + k
    rep_starts = np.repeat(uoff[:-1][codes], out_lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(out_lens)[:-1])), out_lens
    )
    data = src[rep_starts + within].tobytes() if total else b""
    return out_lens.astype(np.uint32), data


def _count_byte_arrays(raw: np.ndarray) -> int:
    n = 0
    pos = 0
    while pos < len(raw):
        ln = int.from_bytes(raw[pos : pos + 4].tobytes(), "little")
        pos += 4 + ln
        n += 1
    return n
