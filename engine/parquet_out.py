"""Write REAL parquet files with the engine's own codecs — the inverse of
``engine/parquet_compat.py``'s golden-file read path. Together they close
the interop loop the reference lives in (``src/file/writer.rs`` emits
files Impala/Spark can read): chunk payloads produced by
``engine/codecs/{plain,rle,delta_for,bytearrays,dictionary-grammar}`` are
wrapped in thrift-compact page headers + a FileMetaData footer that
pyarrow, DuckDB and Spark's built-in reader all consume.

Scope (deliberately the engine's core value shapes, not a second general
writer): flat required/optional columns of bool / int32 / int64 / float32
/ float64 / byte_array (UTF8 or raw), plus REPEATED list columns
(``list<elem>``) via the 3-level LIST convention — rep/def level shredding
exactly as the reference's ``src/column/writer.rs:304-345`` (rows counted
where rep == 0, ``:325-345``), so ``tokens array<int32>`` — this engine's
flagship column — hands off to any plain parquet consumer; multiple row
groups (``row_group_size``) with per-group min/max/null_count statistics +
``column_orders`` so readers actually prune; data pages v1 AND v2
(``data_page_version``); encodings PLAIN, PLAIN_DICTIONARY (v2:
RLE_DICTIONARY), DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY,
DELTA_BYTE_ARRAY, RLE (boolean), BYTE_STREAM_SPLIT, plus
``encoding='AUTO'`` through the engine's chunk selector; optional
SNAPPY/GZIP/ZSTD/BROTLI/LZ4_RAW page compression. The engine's production
container remains its own chunk format (frames + lineage + snapshots);
this module is the interchange exit ramp — "a user of the reference could
switch" includes handing files back to plain parquet readers.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecs import bitpack, delta_for, plain, rle

MAGIC = b"PAR1"

_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_STRUCT = 12

_PHYS_IDS = {
    "bool": 0,
    "int32": 1,
    "int64": 2,
    "float32": 4,
    "float64": 5,
    "byte_array": 6,
}
_ENC_IDS = {
    "PLAIN": 0,
    "PLAIN_DICTIONARY": 2,
    "RLE": 3,
    "DELTA_BINARY_PACKED": 5,
    "DELTA_LENGTH_BYTE_ARRAY": 6,
    "DELTA_BYTE_ARRAY": 7,
    "RLE_DICTIONARY": 8,
    "BYTE_STREAM_SPLIT": 9,
}
# 'lz4' means LZ4_RAW (codec id 7): parquet id 5 is the DEPRECATED
# hadoop-framed variant, and pyarrow's Codec('lz4') is the LZ4 *frame*
# format — labeling frame bytes as id 5 would produce unreadable files
# (r5 review #2). Modern readers (arrow, DuckDB, Spark) all take LZ4_RAW.
_CODEC_IDS = {None: 0, "snappy": 1, "gzip": 2, "brotli": 4, "lz4": 7, "zstd": 6}
# logical column aliases -> (physical type, ConvertedType id). UTF8=0,
# DATE=6 (int32 days since epoch), TIMESTAMP_MILLIS=9, TIMESTAMP_MICROS=10
# — the annotations that make readers surface str/date/timestamp columns.
_LOGICAL = {
    "utf8": ("byte_array", 0),
    "date": ("int32", 6),
    "timestamp_ms": ("int64", 9),
    "timestamp_us": ("int64", 10),
}


def _list_struct_levels(counts, row_valid, sv_slice, fv_slice,
                        elem_opt: bool, field_opt: bool):
    """Rep/def streams for one leaf of a repeated GROUP element (LIST of
    struct, or MAP): def counts the defined optional ancestors along
    ``optional group (+1) / repeated (+1 when the row has entries) /
    [optional] element struct (+1 when non-null) / [optional] field (+1
    when non-null)``. ``sv_slice`` = element-struct validity over entries
    (None when the element is required — MAP key_value), ``fv_slice`` =
    this field's validity over entries (ignored where the struct is
    null). Same slot rule as _list_level_arrays: empty/null rows emit
    one pad slot."""
    counts = np.asarray(counts, np.int64)
    if len(counts) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    slots = np.maximum(counts, 1)
    n_lev = int(slots.sum())
    starts = np.concatenate(([0], np.cumsum(slots)[:-1])).astype(np.int64)
    rep = np.ones(n_lev, np.uint64)
    rep[starts] = 0
    zero = counts == 0
    n_entries = int(counts.sum())
    d = np.full(n_entries, 2, np.uint64)
    sv = None
    if elem_opt:
        sv = np.asarray(sv_slice, bool)
        d += sv
    if field_opt:
        fv = np.asarray(fv_slice, bool)
        d += (fv & sv) if sv is not None else fv
    defs = np.empty(n_lev, np.uint64)
    is_entry = np.ones(n_lev, bool)
    if zero.any():
        pad = starts[zero]
        is_entry[pad] = False
        defs[pad] = (
            1
            if row_valid is None
            else np.where(np.asarray(row_valid, bool)[zero], 1, 0)
        )
    defs[is_entry] = d
    return rep, defs


def _list_level_arrays(counts: np.ndarray, row_valid, ev_slice):
    """Rep/def level streams for one row group of a LIST column (3-level
    convention, always ``optional group (LIST) / repeated group list /
    optional element``): def 0 = null row, 1 = empty list, 2 = null
    element, 3 = present element; rep 0 starts a record (reference
    src/column/writer.rs:304-345). Rows with no entries still emit ONE
    level slot — that is where null-vs-empty lives."""
    counts = np.asarray(counts, np.int64)
    if len(counts) == 0:
        # empty row group (zero-row table): no level slots at all
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    slots = np.maximum(counts, 1)
    n_lev = int(slots.sum())
    starts = np.concatenate(([0], np.cumsum(slots)[:-1])).astype(np.int64)
    rep = np.ones(n_lev, np.uint64)
    rep[starts] = 0
    defs = np.full(n_lev, 3, np.uint64)
    zero = counts == 0
    if zero.any():
        pad = starts[zero]
        if row_valid is None:
            defs[pad] = 1
        else:
            defs[pad] = np.where(np.asarray(row_valid, bool)[zero], 1, 0)
    if ev_slice is not None:
        ev = np.asarray(ev_slice, bool)
        if not ev.all():
            is_entry = np.ones(n_lev, bool)
            is_entry[starts[zero]] = False
            entry_pos = np.flatnonzero(is_entry)
            defs[entry_pos[~ev]] = 2
    return rep, defs


class _Writer:
    """Thrift compact protocol writer (the mirror of parquet_compat's
    _Reader): structs are emitted from (field_id, type, value) triples in
    ascending id order so the delta encoding stays in range."""

    def __init__(self):
        self.parts: list[bytes] = []

    def _varint(self, v: int) -> None:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        self.parts.append(bytes(out))

    def _zigzag(self, v: int) -> None:
        self._varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def _value(self, ctype: int, v) -> None:
        if ctype in (_CT_I16, _CT_I32, _CT_I64):
            self._zigzag(int(v))
        elif ctype == _CT_BYTE:
            self.parts.append(bytes([int(v) & 0xFF]))
        elif ctype == _CT_DOUBLE:
            self.parts.append(struct.pack("<d", float(v)))
        elif ctype == _CT_BINARY:
            b = v.encode() if isinstance(v, str) else bytes(v)
            self._varint(len(b))
            self.parts.append(b)
        elif ctype == _CT_LIST:
            etype, items = v
            n = len(items)
            if n < 15:
                self.parts.append(bytes([(n << 4) | etype]))
            else:
                self.parts.append(bytes([0xF0 | etype]))
                self._varint(n)
            if etype in (_CT_TRUE, _CT_FALSE):
                # bool LIST ELEMENTS take a full byte (1=true, 2=false),
                # unlike struct fields where the type nibble carries the
                # value — needed by ColumnIndex.null_pages
                self.parts.append(
                    bytes(1 if it else 2 for it in items)
                )
            else:
                for it in items:
                    self._value(etype, it)
        elif ctype == _CT_STRUCT:
            self.struct(v)
        elif ctype in (_CT_TRUE, _CT_FALSE):
            pass  # value carried by the field type itself
        else:
            raise ValueError(f"unsupported thrift write type {ctype}")

    def struct(self, fields: list) -> None:
        """fields: [(field_id, ctype, value)] — bools pass ctype _CT_TRUE/
        _CT_FALSE directly."""
        last = 0
        for fid, ctype, v in fields:
            if isinstance(v, bool) and ctype in (_CT_TRUE, _CT_FALSE):
                ctype = _CT_TRUE if v else _CT_FALSE
            delta = fid - last
            if 0 < delta <= 15:
                self.parts.append(bytes([(delta << 4) | ctype]))
            else:
                self.parts.append(bytes([ctype]))
                self._zigzag(fid)
            last = fid
            self._value(ctype, v)
        self.parts.append(b"\x00")

    def bytes(self) -> bytes:
        return b"".join(self.parts)


def _tstruct(fields: list) -> bytes:
    w = _Writer()
    w.struct(fields)
    return w.bytes()


def _compress(buf: bytes, codec: str | None) -> bytes:
    if codec is None:
        return buf
    if codec == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(buf) + co.flush()
    import pyarrow as pa

    return pa.Codec("lz4_raw" if codec == "lz4" else codec).compress(
        buf
    ).to_pybytes()


def _plain_values(phys: str, values) -> bytes:
    if phys == "byte_array":
        lens, data = values
        return plain.encode_byte_arrays(lens, data)
    return plain.encode(values, phys)


def _encode_values(phys: str, enc: str, values) -> bytes:
    """Dense (non-null) values -> parquet value-section bytes. byte_array
    values arrive as (lengths, concat-data)."""
    if enc == "PLAIN":
        return _plain_values(phys, values)
    if enc == "DELTA_BINARY_PACKED":
        return delta_for.encode(values, phys)
    if enc == "DELTA_LENGTH_BYTE_ARRAY":
        lens, data = values
        # real parquet embeds the self-delimiting delta stream directly
        # (no 4-byte frame like the engine's own chunk format)
        return delta_for.encode(
            np.ascontiguousarray(lens, np.int32), "int32"
        ) + (data if isinstance(data, bytes) else bytes(data))
    if enc == "DELTA_BYTE_ARRAY":
        from .codecs import bytearrays

        lens, data = values
        lens = np.ascontiguousarray(lens, np.int64)
        if lens.size == 0:
            # all-null group: two empty self-delimiting delta streams
            # (prefix lengths + suffix lengths), no suffix bytes
            # (hypothesis-found: the offset scatter below assumes >=1 value)
            empty = delta_for.encode(np.empty(0, np.int32), "int32")
            return empty + empty
        arr = np.frombuffer(data, np.uint8)
        prefix = bytearrays._common_prefix_lengths(lens, arr)
        suffix_lens = lens - prefix
        off = np.concatenate(([0], np.cumsum(lens)))
        starts = off[:-1] + prefix
        total = int(suffix_lens.sum())
        rep = np.repeat(starts, suffix_lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(suffix_lens)[:-1])), suffix_lens
        )
        suffix = arr[rep + within].tobytes() if total else b""
        return (
            delta_for.encode(prefix.astype(np.int32), "int32")
            + delta_for.encode(suffix_lens.astype(np.int32), "int32")
            + suffix
        )
    if enc == "RLE":
        if phys != "bool":
            raise ValueError("RLE value encoding is boolean-only")
        return rle.encode_len_prefixed(
            np.ascontiguousarray(values, np.uint64), 1
        )
    if enc == "BYTE_STREAM_SPLIT":
        # NOTE: pyarrow and DuckDB read BSS pages; Spark's vectorized
        # reader (as of 4.1) raises "Unsupported encoding" — pick PLAIN
        # for files Spark itself must read back
        dt = {"float32": "<f4", "float64": "<f8", "int32": "<i4", "int64": "<i8"}
        if phys not in dt:
            raise ValueError(f"BYTE_STREAM_SPLIT unsupported on {phys}")
        v = np.ascontiguousarray(values, dt[phys])
        k = v.dtype.itemsize
        # transpose value-major bytes into k byte streams: after this,
        # same-significance bytes sit together, which is what makes float
        # pages compress (the codec pairs with snappy/zstd)
        return v.view(np.uint8).reshape(len(v), k).T.copy().tobytes()
    raise ValueError(f"unsupported write encoding {enc}")


_STATS_TRUNC = 64  # parquet-mr's default byte-array stats truncation


def _truncate_max(hi: bytes) -> bytes | None:
    """Bound a byte-array max to a _STATS_TRUNC-byte prefix that still
    upper-bounds the value: truncate, then increment the last byte that
    can carry (parquet-mr's BinaryTruncator); an all-0xFF prefix has no
    finite upper bound at this length -> None (stat omitted) so footers
    never embed multi-KB document bodies (r5 advice #2)."""
    if len(hi) <= _STATS_TRUNC:
        return hi
    pre = bytearray(hi[:_STATS_TRUNC])
    for i in range(len(pre) - 1, -1, -1):
        if pre[i] != 0xFF:
            pre[i] += 1
            return bytes(pre[: i + 1])
    return None


def _utf8_trunc_min(lo: bytes) -> bytes:
    """UTF8 columns must truncate at CODEPOINT boundaries (r6 review #1 —
    a byte-sliced prefix can split a multi-byte char, and DuckDB then
    rejects the whole file's statistics as invalid string encoding;
    parquet-mr's BinaryTruncator is likewise UTF8-aware). A codepoint
    prefix of a valid string is valid and sorts <= the original."""
    if len(lo) <= _STATS_TRUNC:
        return lo
    cut = lo[:_STATS_TRUNC]
    k = len(cut)
    # back off any trailing continuation bytes plus a split lead byte
    while k > 0 and (cut[k - 1] & 0xC0) == 0x80:
        k -= 1
    if k > 0 and (cut[k - 1] & 0xC0) == 0xC0:
        k -= 1
    return cut[:k]


def _utf8_trunc_max(hi: bytes) -> bytes | None:
    """Upper-bound a UTF8 max within _STATS_TRUNC bytes: truncate at a
    codepoint boundary, then increment the last codepoint (skipping the
    surrogate block) — UTF-8 byte order tracks codepoint order, so the
    result strictly upper-bounds every string sharing the prefix. None
    when no prefix can be incremented (degenerate all-U+10FFFF)."""
    if len(hi) <= _STATS_TRUNC:
        return hi
    chars = list(_utf8_trunc_min(hi).decode())
    while chars:
        cp = ord(chars[-1])
        nxt = 0xE000 if cp == 0xD7FF else cp + 1
        if nxt <= 0x10FFFF and not 0xD800 <= nxt <= 0xDFFF:
            chars[-1] = chr(nxt)
            return "".join(chars).encode()
        chars.pop()
    return None


def _column_stats(phys: str, values, validity, n: int, utf8: bool = False):
    """Per-row-group Statistics (min_value/max_value/null_count) — the
    metadata that lets ANY parquet reader prune row groups on engine-
    written files, the interchange analog of the engine's own typed chunk
    statistics (jobs/encode.py). min/max serialize as single PLAIN values
    (spec fields 5/6); NaN-containing float groups skip min/max the way
    parquet-mr does (NaN ordering is undefined in the spec)."""
    null_count = 0 if validity is None else int(n - validity.sum())
    if (n - null_count) == 0:
        return {"null_count": null_count, "min": None, "max": None}
    if phys == "byte_array":
        import pyarrow as pa
        import pyarrow.compute as pac

        lens, data = values
        offs = np.concatenate(([0], np.cumsum(np.asarray(lens, np.int64))))
        # zero-copy BinaryArray over (offsets, data) — py_buffer wraps
        # bytes AND ndarrays without copying — then one vectorized C++
        # min_max pass; per-page stats sit in the writer's hot loop and a
        # per-value Python scan dominated wide string chunks
        arr = pa.Array.from_buffers(
            pa.large_binary(),
            len(lens),
            [None, pa.py_buffer(offs), pa.py_buffer(data)],
        )
        mm = pac.min_max(arr)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if utf8:
            # the two bounds fail independently: _utf8_trunc_min never
            # decodes (pure byte backoff) but a declared-UTF8 column can
            # still carry undecodable bytes that make the codepoint
            # prefix unusable; _utf8_trunc_max decodes and can raise.
            # Keep whichever bound is computable (r6 ADVICE #1).
            mn = _utf8_trunc_min(lo)
            try:
                mn.decode()
            except UnicodeDecodeError:
                mn = None
            try:
                mx = _utf8_trunc_max(hi)
                if mx is not None:
                    # the short path returns hi verbatim without decoding
                    # (r7 review #3): an undecodable SHORT max must drop
                    # too, or DuckDB rejects the file's string statistics
                    mx.decode()
            except UnicodeDecodeError:
                mx = None
            return {"null_count": null_count, "min": mn, "max": mx}
        return {
            "null_count": null_count,
            "min": lo[:_STATS_TRUNC],
            "max": _truncate_max(hi),
        }
    v = np.asarray(values)
    if phys in ("float32", "float64") and np.isnan(v).any():
        return {"null_count": null_count, "min": None, "max": None}
    if phys == "bool":
        mn, mx = bool(v.min()), bool(v.max())
        return {
            "null_count": null_count,
            "min": b"\x01" if mn else b"\x00",
            "max": b"\x01" if mx else b"\x00",
        }
    return {
        "null_count": null_count,
        "min": plain.encode(v.min(keepdims=True), phys),
        "max": plain.encode(v.max(keepdims=True), phys),
    }


def _stats_struct(stats: dict) -> list:
    """Thrift Statistics struct fields: 3 null_count, 5 max_value, 6
    min_value (the order-defined v2 fields readers trust). Each bound is
    written independently: a chunk whose max is un-boundable after
    truncation (all-0xFF prefix / degenerate all-U+10FFFF) still carries
    its perfectly valid truncated min, preserving min-based row-group
    pruning (r6 ADVICE #1)."""
    fields = [(3, _CT_I64, stats["null_count"])]
    if stats["max"] is not None:
        fields.append((5, _CT_BINARY, stats["max"]))
    if stats["min"] is not None:
        fields.append((6, _CT_BINARY, stats["min"]))
    return fields


def _auto_encoding(phys: str, values) -> str:
    """Resolve encoding='AUTO' through the engine's codec auto-selector
    (engine/selector.py — the same argmin-over-size-estimates that drives
    the native chunk format), restricted to encodings parquet can express:
    the engine's bitpack/rle int codecs have no parquet value-encoding
    analog, and FSST maps to DELTA_LENGTH_BYTE_ARRAY (plain length-split)
    since parquet has no FSST."""
    from . import selector

    if phys == "bool":
        choice = selector.select_bool_codec(np.asarray(values))
        return {"rle_bool": "RLE", "plain": "PLAIN"}[choice]
    if phys in ("float32", "float64"):
        choice = selector.select_float_codec(np.asarray(values))
        return {"dict": "PLAIN_DICTIONARY", "plain": "PLAIN"}[choice]
    if phys == "byte_array":
        lens, data = values
        # fsst is excluded from the argmin itself: parquet cannot express
        # it, and remapping an fsst WIN afterwards would pick the wrong
        # encoding for prefix-sorted strings (r5 review pass 2 #3)
        choice = selector.select_ba_codec(
            np.asarray(lens),
            data,
            candidates=("dict_ba", "delta_ba", "delta_length_ba"),
        )
        return {
            "dict_ba": "PLAIN_DICTIONARY",
            "delta_ba": "DELTA_BYTE_ARRAY",
            "delta_length_ba": "DELTA_LENGTH_BYTE_ARRAY",
        }[choice]
    choice, _, _ = selector.select_codec(
        np.asarray(values), candidates=("plain", "dict", "delta")
    )
    return {
        "plain": "PLAIN",
        "dict": "PLAIN_DICTIONARY",
        "delta": "DELTA_BINARY_PACKED",
    }[choice]


def _dict_build(phys: str, values):
    """PLAIN_DICTIONARY: (dict page bytes, int64 index array, n_dict,
    per-unique serialized sizes). Uniques keep first-appearance order —
    same contract as the engine's DictEncoder (pd.factorize / arrow
    dictionary_encode order), which also means unique k's serialized
    bytes are dict_page[cum_sizes[k-1]:cum_sizes[k]] — the property the
    mid-chunk dict fallback uses to truncate the dictionary to exactly
    the uniques the dict-encoded page prefix saw. The caller slices the
    index array per data page (one shared dictionary per column chunk,
    parquet's layout)."""
    if phys == "byte_array":
        # arrow dictionary_encode over zero-copy buffers — first-appearance
        # order, no per-value Python (r5 review #6; same idiom the engine's
        # own DICT_BA encode uses in jobs/encode.py)
        import pyarrow as pa

        lens, data = values
        lens64 = np.asarray(lens, np.int64)
        offs32 = np.concatenate(([0], np.cumsum(lens64))).astype(np.int32)
        arr = pa.Array.from_buffers(
            pa.binary(),
            len(lens64),
            [None, pa.py_buffer(offs32.tobytes()), pa.py_buffer(data)],
        )
        denc = arr.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        from .codecs import bytearrays

        u_lens, u_data = bytearrays.flat_from_arrow(denc.dictionary)
        dict_plain = plain.encode_byte_arrays(
            u_lens.astype(np.uint32), u_data
        )
        n_dict = len(u_lens)
        u_sizes = 4 + np.asarray(u_lens, np.int64)  # u32 length prefix
    else:
        import pandas as pd

        # use_na_sentinel=False keeps NaN as a REAL dictionary value;
        # the default emits code -1, which uint-wraps into an arbitrary
        # valid index and silently corrupts the column (r5 review #1)
        codes, uniques = pd.factorize(
            np.asarray(values), use_na_sentinel=False
        )
        idx = codes.astype(np.int64)
        dict_plain = plain.encode(np.asarray(uniques), phys)
        n_dict = len(uniques)
        u_sizes = np.full(n_dict, len(dict_plain) // max(n_dict, 1), np.int64)
    if n_dict == 0:
        raise ValueError("dictionary encoding of an empty column")
    return dict_plain, idx, n_dict, u_sizes


def _page_header(ptype: int, raw_len: int, comp_len: int, inner) -> bytes:
    fields = [(1, _CT_I32, ptype), (2, _CT_I32, raw_len), (3, _CT_I32, comp_len)]
    if ptype == 0:
        fields.append((5, _CT_STRUCT, inner))
    elif ptype == 3:
        fields.append((8, _CT_STRUCT, inner))
    else:
        fields.append((7, _CT_STRUCT, inner))
    return _tstruct(fields)


def _norm_struct_fields(name: str, fields, struct_valid):
    """Normalize a STRUCT column into per-leaf norm entries.

    Each leaf carries a ``grp`` descriptor: parent name + optionality,
    the leaf's own optionality, the combined max definition level
    (optional ancestors count toward it — Dremel shredding, the same
    rule engine/levels.py applies to the engine's own nested chunks)
    and the per-row definition-level array when two levels are needed.
    """
    if not isinstance(fields, (list, tuple)) or not fields:
        raise ValueError(f"{name}: struct values must be a non-empty field list")
    parent_opt = struct_valid is not None
    if parent_opt:
        struct_valid = np.asarray(struct_valid, bool)
    n = None if struct_valid is None else len(struct_valid)
    entries = []
    for fname, alias, fenc, fvalues, fvalid in fields:
        if alias == "struct" or alias.startswith("list<"):
            raise ValueError(
                f"{name}.{fname}: nested {alias} inside struct not supported "
                "(scalar leaves only — same scope as the compat reader)"
            )
        phys, conv = _LOGICAL.get(alias, (alias, None))
        if phys not in _PHYS_IDS:
            raise ValueError(f"{name}.{fname}: unsupported field type {alias}")
        field_opt = fvalid is not None
        if field_opt:
            fvalid = np.asarray(fvalid, bool)
            fn = len(fvalid)
        elif phys != "byte_array":
            fvalues = np.asarray(fvalues)
            fn = len(fvalues)
        elif struct_valid is not None:
            fn = n  # dense byte arrays: row count comes from the struct mask
        else:
            fn = len(fvalues[0])  # required field in required struct
        if n is None:
            n = fn
        elif fn != n:
            raise ValueError(f"{name}.{fname}: {fn} rows vs {n} in struct")
        # present = slots holding an actual leaf value (def == max_def)
        if parent_opt and field_opt:
            present = struct_valid & fvalid
        elif parent_opt:
            present = struct_valid
        elif field_opt:
            present = fvalid
        else:
            present = None
        max_def = int(parent_opt) + int(field_opt)
        # two optional levels need the real 0/1/2 def array; one collapses
        # to the binary validity path the flat writer already has
        def_rows = (
            struct_valid.astype(np.uint8) + present.astype(np.uint8)
            if max_def == 2
            else None
        )
        if phys != "byte_array":
            fvalues = np.asarray(fvalues)
            if len(fvalues) != n:
                raise ValueError(f"{name}.{fname}: {len(fvalues)} values vs {n} rows")
            if present is not None:
                fvalues = fvalues[present]
        elif present is not None and len(fvalues[0]) != int(present.sum()):
            raise ValueError(
                f"{name}.{fname}: byte-array values must be dense over "
                "present entries"
            )
        aux = {
            "offs": (
                np.concatenate(([0], np.cumsum(np.asarray(fvalues[0], np.int64))))
                if phys == "byte_array"
                else None
            ),
            "vpre": (
                np.concatenate(([0], np.cumsum(present, dtype=np.int64)))
                if present is not None
                else None
            ),
        }
        grp = {
            "kind": "struct",
            "parent": name,
            "parent_opt": parent_opt,
            "field_opt": field_opt,
            "max_def": max_def,
            "def_rows": def_rows,
        }
        entries.append((fname, phys, conv, fenc, fvalues, present, aux, None, grp))
    if n is None:
        raise ValueError(f"{name}: cannot infer row count from required fields")
    return n, entries


def _norm_repeated_group(name: str, kind: str, spec, values, validity):
    """Normalize a repeated-GROUP column — ``list<struct>`` (array of
    structs) or ``map<key,value>`` — into per-leaf norm entries that ride
    the existing LIST slicing machinery: every leaf shares the row
    offsets, carries its own dense values + combined entry-validity
    prefix sums, and a ``grp`` descriptor with the element/field
    optionality the level builder needs. MAP is the same shape with a
    required key_value element and key leaf (parquet MAP convention)."""
    if kind == "map":
        kalias, valias = (a.strip() for a in spec.split(",", 1))
        offsets, kvals, vvals, vvalid = values
        fields = [("key", kalias, "AUTO", kvals, None),
                  ("value", valias, "AUTO", vvals, vvalid)]
        elem_valid = None
    else:
        offsets, fields, elem_valid = values
        if not isinstance(fields, (list, tuple)) or not fields:
            raise ValueError(f"{name}: struct element needs a non-empty field list")
    elem_opt = elem_valid is not None
    offsets = np.ascontiguousarray(offsets, np.int64)
    if len(offsets) == 0 or (np.diff(offsets) < 0).any():
        raise ValueError(f"{name}: offsets must be non-decreasing")
    n = len(offsets) - 1
    n_entries = int(offsets[-1])
    if validity is not None:
        validity = np.asarray(validity, bool)
        if len(validity) != n:
            raise ValueError(f"{name}: validity length != rows")
        if (np.diff(offsets)[~validity] != 0).any():
            raise ValueError(f"{name}: null rows must be empty")
    if elem_opt:
        elem_valid = np.asarray(elem_valid, bool)
        if len(elem_valid) != n_entries:
            raise ValueError(f"{name}: elem_validity length != entries")
    entries = []
    for fname, alias, fenc, fvalues, fvalid in fields:
        if alias == "struct" or alias.startswith(("list<", "map<")):
            raise ValueError(
                f"{name}.{fname}: nested {alias} inside a repeated group "
                "not supported (scalar leaves only)"
            )
        phys, conv = _LOGICAL.get(alias, (alias, None))
        if phys not in _PHYS_IDS:
            raise ValueError(f"{name}.{fname}: unsupported field type {alias}")
        field_opt = fvalid is not None
        if field_opt:
            fvalid = np.asarray(fvalid, bool)
            if len(fvalid) != n_entries:
                raise ValueError(f"{name}.{fname}: field validity != entries")
        if elem_opt and field_opt:
            combined = elem_valid & fvalid
        elif elem_opt:
            combined = elem_valid
        elif field_opt:
            combined = fvalid
        else:
            combined = None
        n_present = n_entries if combined is None else int(combined.sum())
        if phys != "byte_array":
            fvalues = np.asarray(fvalues)
            n_dense = len(fvalues)
        else:
            n_dense = len(fvalues[0])
        if n_dense != n_present:
            raise ValueError(
                f"{name}.{fname}: {n_dense} dense values vs {n_present} present"
            )
        aux = {
            "offs": (
                np.concatenate(([0], np.cumsum(np.asarray(fvalues[0], np.int64))))
                if phys == "byte_array"
                else None
            ),
            "vpre": None,
        }
        lst = {
            "offsets": offsets,
            "elem_valid": combined,
            "evpre": (
                np.concatenate(([0], np.cumsum(combined, dtype=np.int64)))
                if combined is not None
                else None
            ),
            "sv": elem_valid if elem_opt else None,
            "fv": fvalid if field_opt else None,
        }
        grp = {
            "kind": kind,
            "parent": name,
            "elem_opt": elem_opt,
            "field_opt": field_opt,
            "max_def": 2 + int(elem_opt) + int(field_opt),
            "def_rows": None,
        }
        entries.append((fname, phys, conv, fenc, fvalues, validity, aux, lst, grp))
    return n, entries


def write_table(path: str, columns: list, codec: str | None = None,
                created_by: str = "spark-graft encoder",
                row_group_size: int | None = None,
                data_page_version: int = 1,
                page_size_rows: int | None = None,
                dict_page_size_limit: int = 1024 * 1024,
                sorting_columns: list | None = None) -> dict:
    """Write flat columns as a real parquet file.

    ``columns``: list of (name, phys, encoding, values, validity) where
    phys is an engine dtype name ('bool'/'int32'/'int64'/'float32'/
    'float64'/'byte_array'/'utf8'), values is a numpy array (fixed types,
    null slots may hold anything) or (lengths, data) for byte arrays
    (dense: non-null values only), and validity is a bool array or None
    for required. Logical aliases annotate the physical type so readers
    surface typed columns: 'utf8' = byte_array + UTF8 (str), 'date' =
    int32 days + DATE, 'timestamp_us' / 'timestamp_ms' = int64 epoch
    micros/millis + TIMESTAMP_MICROS/_MILLIS.

    LIST columns: phys ``'list<elem>'`` (elem = any alias above), values =
    ``(offsets, elem_values, elem_validity)`` — offsets is an int64 array
    of length rows+1 over element ENTRIES (null elements included),
    elem_values holds the dense non-null elements (numpy or (lengths,
    data)), elem_validity is a bool array over entries or None. The row
    ``validity`` argument distinguishes null lists from empty ones (a
    null row must have zero entries). Written as the standard 3-level
    LIST group, readable by Spark/pyarrow/DuckDB as ``array<elem>``.

    STRUCT columns: phys ``'struct'``, values = a list of
    ``(field_name, field_alias, field_enc, field_values, field_validity)``
    (alias = any scalar alias above; no nested list/struct yet — the same
    one-group-deep scope the compat reader documents). Fixed-type field
    values span ALL rows (null slots may hold anything); byte-array field
    values are dense over PRESENT entries (struct non-null AND field
    non-null). ``field_validity`` spans all rows; its value at struct-null
    rows is ignored. The column-level ``validity`` makes the struct itself
    optional (a null struct row masks every field). Written as a real
    parquet group — ``optional group name {{ fields }}`` with two-level
    definition levels, surfaced by Spark/pyarrow/DuckDB as
    ``struct<...>``; the reference writes the same shape via its
    SchemaDescriptor + per-leaf writers (src/schema/types.rs,
    src/column/writer.rs:304-345).

    LIST-of-STRUCT columns: phys ``'list<struct>'``, values =
    ``(offsets, fields, elem_validity)`` — fields as for STRUCT but with
    per-ENTRY validity arrays and dense values over present entries
    (entry struct non-null AND field non-null); ``elem_validity`` over
    entries makes the element struct itself optional. Surfaced as
    ``array<struct<...>>``. MAP columns: phys ``'map<key,value>'``
    (scalar aliases), values = ``(offsets, key_values, value_values,
    value_validity)`` — keys required per the parquet MAP convention,
    value_values dense over non-null entries. Surfaced as
    ``map<key,value>``. Row ``validity`` distinguishes null from empty
    lists/maps in both shapes.

    ``row_group_size`` splits
    rows into multiple row
    groups (each with its own dictionary pages) — at fleet scale bounded
    groups are what keep a reader's memory bounded; default is a single
    group. ``data_page_version=2`` emits DataPageV2 (levels sectioned
    outside the compressed area, lengths in the header — the modern page
    form parquet-mr/arrow default to). ``page_size_rows`` splits each
    column chunk into multiple data pages (one shared dictionary page per
    chunk); every file also carries the PageIndex (ColumnIndex with
    per-page min/max/null_count + OffsetIndex) so external readers can
    page-prune — the reference leaves page stats as a TODO
    (src/column/writer.rs:356,480-481); the engine's own PAGED container
    already had per-page selection, and this exports it to the
    interchange format. Returns {'rows': n, 'bytes': file size}.
    """
    if sorting_columns:
        declared = {c[0] for c in columns}
        for nm, _, _ in sorting_columns:
            if nm not in declared:
                raise ValueError(
                    f"sorting_columns names unknown column {nm!r}; "
                    f"columns are {sorted(declared)}"
                )
    # -- normalize once: 9-tuples of (name, phys, conv, enc, dense values,
    # validity, aux prefix-sums, list-shape, struct-group) --
    norm = []
    num_rows = None
    for name, phys, enc, values, validity in columns:
        lst = None
        if (
            phys == "struct"
            or phys == "list<struct>"
            or (phys.startswith("map<") and phys.endswith(">"))
        ):
            if phys == "struct":
                n, entries = _norm_struct_fields(name, values, validity)
            elif phys == "list<struct>":
                n, entries = _norm_repeated_group(
                    name, "list_struct", None, values, validity
                )
            else:
                n, entries = _norm_repeated_group(
                    name, "map", phys[4:-1], values, validity
                )
            if num_rows is None:
                num_rows = n
            elif num_rows != n:
                raise ValueError(f"{name}: {n} rows vs {num_rows} in prior columns")
            norm.extend(entries)
            continue
        if phys.startswith("list<") and phys.endswith(">"):
            elem_alias = phys[5:-1]
            phys, conv = _LOGICAL.get(elem_alias, (elem_alias, None))
            if phys not in _PHYS_IDS:
                raise ValueError(f"{name}: unsupported list element {elem_alias}")
            offsets, values, elem_valid = values
            offsets = np.ascontiguousarray(offsets, np.int64)
            if len(offsets) == 0 or (np.diff(offsets) < 0).any():
                raise ValueError(f"{name}: list offsets must be non-decreasing")
            n = len(offsets) - 1
            if validity is not None:
                validity = np.asarray(validity, bool)
                if len(validity) != n:
                    raise ValueError(f"{name}: validity length != rows")
                if (np.diff(offsets)[~validity] != 0).any():
                    raise ValueError(f"{name}: null list rows must be empty")
            if elem_valid is not None:
                elem_valid = np.asarray(elem_valid, bool)
                if len(elem_valid) != int(offsets[-1]):
                    raise ValueError(f"{name}: elem_validity length != entries")
            n_dense = len(values[0]) if phys == "byte_array" else len(values)
            n_present = (
                int(offsets[-1]) if elem_valid is None else int(elem_valid.sum())
            )
            if n_dense != n_present:
                raise ValueError(
                    f"{name}: {n_dense} dense elements vs {n_present} present"
                )
            if phys != "byte_array":
                values = np.asarray(values)
            lst = {
                "offsets": offsets,
                "elem_valid": elem_valid,
                "evpre": (
                    np.concatenate(([0], np.cumsum(elem_valid, dtype=np.int64)))
                    if elem_valid is not None
                    else None
                ),
            }
        else:
            phys, conv = _LOGICAL.get(phys, (phys, None))
            if phys == "byte_array":
                n_dense = len(values[0])
            else:
                values = np.asarray(values)
                n_dense = len(values)
            n = n_dense if validity is None else len(validity)
        if num_rows is None:
            num_rows = n
        elif num_rows != n:
            raise ValueError(f"{name}: {n} rows vs {num_rows} in prior columns")
        if lst is None and validity is not None:
            validity = np.asarray(validity, bool)
            if phys != "byte_array":
                values = values[validity]
            elif len(values[0]) != int(validity.sum()):
                raise ValueError(
                    f"{name}: byte-array values must be dense (non-null only)"
                )
        # prefix sums ONCE per column, not per row group (the per-group
        # recompute made write_table O(rows x groups); r5 review pass 2 #4)
        aux = {
            "offs": (
                np.concatenate(
                    ([0], np.cumsum(np.asarray(values[0], np.int64)))
                )
                if phys == "byte_array"
                else None
            ),
            "vpre": (
                np.concatenate(([0], np.cumsum(validity, dtype=np.int64)))
                if validity is not None and lst is None
                else None
            ),
        }
        norm.append((name, phys, conv, enc, values, validity, aux, lst, None))
    num_rows = num_rows or 0

    out = bytearray(MAGIC)
    rowgroups = []
    step = row_group_size if row_group_size and row_group_size > 0 else max(num_rows, 1)
    for lo in range(0, max(num_rows, 1), step):
        hi = min(lo + step, num_rows)
        col_meta = _write_group(
            out, norm, lo, hi, codec, data_page_version, page_size_rows,
            dict_page_size_limit,
        )
        rowgroups.append((col_meta, hi - lo))
        if num_rows == 0:
            break
    col_meta0 = rowgroups[0][0]
    return _finish_file(
        path, out, rowgroups, col_meta0, num_rows, codec, created_by,
        sorting_columns,
    )


def _slice_col(phys, values, validity, aux, lo, hi):
    """Row-range slice of one normalized column -> (dense values, validity
    slice); O(group size) via the precomputed prefix sums."""
    if validity is None:
        if phys == "byte_array":
            lens, data = values
            offs = aux["offs"]
            return (lens[lo:hi], data[offs[lo] : offs[hi]]), None
        return values[lo:hi], None
    vslice = validity[lo:hi]
    dlo = int(aux["vpre"][lo])
    dhi = int(aux["vpre"][hi])
    if phys == "byte_array":
        lens, data = values
        offs = aux["offs"]
        return (lens[dlo:dhi], data[offs[dlo] : offs[dhi]]), vslice
    return values[dlo:dhi], vslice


def _slice_list_dense(phys, values, aux, lst, lo, hi):
    """Row-range slice of a LIST column's DENSE element values -> (dense,
    ev_slice); dense ranges come off the entry offsets + element-validity
    prefix sums, all O(group size)."""
    offsets = lst["offsets"]
    elo, ehi = int(offsets[lo]), int(offsets[hi])
    if lst["elem_valid"] is None:
        dlo, dhi = elo, ehi
        ev_slice = None
    else:
        dlo = int(lst["evpre"][elo])
        dhi = int(lst["evpre"][ehi])
        ev_slice = lst["elem_valid"][elo:ehi]
    if phys == "byte_array":
        lens, data = values
        boffs = aux["offs"]
        dense = (lens[dlo:dhi], data[boffs[dlo] : boffs[dhi]])
    else:
        dense = values[dlo:dhi]
    return dense, ev_slice


def _write_group(out: bytearray, norm: list, lo: int, hi: int,
                 codec: str | None, data_page_version: int = 1,
                 page_rows: int | None = None,
                 dict_page_size_limit: int = 1024 * 1024) -> list:
    if data_page_version not in (1, 2):
        raise ValueError(f"data_page_version must be 1 or 2")
    col_meta = []
    for name, phys, conv, enc, all_values, all_validity, aux, lst, grp in norm:
        n = hi - lo
        # -- group-level pass: resolve AUTO + build the dictionary over
        # the WHOLE group so every page shares one encoding and one dict
        # page; levels are NOT materialized here (the page pass builds
        # them, and the default single-page case reuses these slices
        # outright — r6 review #6 removed the doubled work) --
        if lst is not None:
            g_values, g_ev = _slice_list_dense(
                phys, all_values, aux, lst, lo, hi
            )
            g_validity = None
            max_def = grp["max_def"] if grp is not None else 3
            max_rep = 1
            counts = np.diff(lst["offsets"][lo : hi + 1])
            g_nlev = int(np.maximum(counts, 1).sum()) if n else 0
        else:
            g_values, g_validity = _slice_col(
                phys, all_values, all_validity, aux, lo, hi
            )
            max_def = (
                grp["max_def"]
                if grp is not None
                else (0 if g_validity is None else 1)
            )
            max_rep = 0
            g_nlev = n
        g_dense = len(g_values[0]) if phys == "byte_array" else len(g_values)
        if g_dense == 0 and enc in ("AUTO", "PLAIN_DICTIONARY"):
            # an all-null group has nothing to dictionary-encode (and
            # nothing for the selector to sample) — PLAIN of zero values
            # is the canonical empty value section (hypothesis-found)
            enc = "PLAIN"
        elif enc == "AUTO":
            # per-row-group adaptivity, same granularity as the engine's
            # per-chunk selection
            enc = _auto_encoding(phys, g_values)
        def_width = max(int(max_def).bit_length(), 1)

        start = len(out)
        encodings = set()
        raw_total = 0  # uncompressed bytes of all pages INCL headers (spec)
        # page row ranges (hoisted above the dict build: the mid-chunk
        # fallback needs per-page dense boundaries before the dict page
        # is emitted)
        step = page_rows if page_rows and page_rows > 0 else max(n, 1)
        ranges = [
            (plo, min(plo + step, hi)) for plo in range(lo, hi, step)
        ] or [(lo, hi)]
        single = ranges == [(lo, hi)]
        dict_idx = None
        dict_cut = None  # dense position where dict-encoded pages stop
        if enc == "PLAIN_DICTIONARY":
            dict_plain, dict_idx, n_dict, u_sizes = _dict_build(
                phys, g_values
            )
            if len(dict_plain) > dict_page_size_limit:
                # mid-chunk dict_fallback (reference src/column/writer.rs:
                # 392-420; parquet-mr's FallbackValuesWriter): the pages
                # already written under the dictionary STAY dict-encoded
                # and the SAME chunk continues with the fallback encoding.
                # This one-shot writer knows the full (codes, uniques)
                # stream upfront, so the spill point is computed instead
                # of discovered: uniques keep first-appearance order, so
                # the dictionary after d dense values is codes[:d].max()+1
                # entries and its serialized size is the cumulative-size
                # prefix — keep the longest page prefix whose dictionary
                # fits, truncate the dict page to exactly those uniques,
                # and encode the remaining pages PLAIN.
                cut = None
                if not single and lst is None and grp is None:
                    dcum = (
                        np.concatenate(
                            ([0], np.cumsum(g_validity.astype(np.int64)))
                        )
                        if g_validity is not None
                        else np.arange(n + 1, dtype=np.int64)
                    )
                    bounds = [dcum[phi - lo] for _, phi in ranges]
                    runmax = np.maximum.accumulate(dict_idx)
                    cum = np.cumsum(u_sizes)
                    for b in bounds[:-1]:  # full-dict case already failed
                        if b == 0 or cum[int(runmax[b - 1])] > \
                                dict_page_size_limit:
                            break
                        cut = int(b)
                if cut is None:
                    # dictionary overflows inside the first page (or a
                    # shape the split doesn't cover): the whole group
                    # falls back before any bytes are emitted
                    enc = "PLAIN"
                    dict_idx = None
                else:
                    dict_cut = cut
                    n_dict = int(runmax[cut - 1]) + 1
                    dict_plain = dict_plain[: int(cum[n_dict - 1])]
        if enc == "PLAIN_DICTIONARY":
            dict_width = max(int(n_dict - 1).bit_length(), 1)
            comp_dict = _compress(dict_plain, codec)
            # v2 convention: dict page declares PLAIN, data pages
            # RLE_DICTIONARY (PLAIN_DICTIONARY is deprecated for v2
            # pages; r5 review pass 3 #6). v1 keeps the legacy pairing.
            dict_page_enc = (
                "PLAIN" if data_page_version == 2 else "PLAIN_DICTIONARY"
            )
            hdr = _page_header(
                2,
                len(dict_plain),
                len(comp_dict),
                [(1, _CT_I32, n_dict), (2, _CT_I32, _ENC_IDS[dict_page_enc])],
            )
            dict_off = start
            out += hdr
            out += comp_dict
            raw_total += len(hdr) + len(dict_plain)
            # the data-page encoding name: RLE_DICTIONARY for v2 pages
            enc = "RLE_DICTIONARY" if data_page_version == 2 else enc
            encodings.add(enc)
            if data_page_version == 2:
                encodings.add("PLAIN")  # the dict page's declared encoding
        else:
            dict_off = None
            dict_page_enc = None
            encodings.add(enc)

        # -- per-page pass: slice rows, shred levels, encode, record the
        # page's location + stats (the ColumnIndex/OffsetIndex inputs) --
        data_off = None
        pages = []
        dcur = 0  # dense-value cursor into the group's dictionary indices
        for plo, phi in ranges:
            if lst is not None:
                if single:
                    values = g_values
                    ev_slice = g_ev
                    pcounts = counts  # same [lo, hi) range — no re-diff
                else:
                    values, ev_slice = _slice_list_dense(
                        phys, all_values, aux, lst, plo, phi
                    )
                    pcounts = np.diff(lst["offsets"][plo : phi + 1])
                prow_valid = (
                    None
                    if all_validity is None
                    else all_validity[plo:phi]
                )
                if grp is not None:
                    # repeated GROUP element (list<struct> / map): levels
                    # carry the element-struct and field validity
                    # separately so struct-null vs field-null stay
                    # distinct def values
                    elo = int(lst["offsets"][plo])
                    ehi = int(lst["offsets"][phi])
                    rep_lev, def_lev = _list_struct_levels(
                        pcounts,
                        prow_valid,
                        None if lst["sv"] is None else lst["sv"][elo:ehi],
                        None if lst["fv"] is None else lst["fv"][elo:ehi],
                        grp["elem_opt"],
                        grp["field_opt"],
                    )
                else:
                    rep_lev, def_lev = _list_level_arrays(
                        pcounts, prow_valid, ev_slice
                    )
                validity = None
                n_lev = len(def_lev)
            else:
                if single:
                    values, validity = g_values, g_validity
                else:
                    values, validity = _slice_col(
                        phys, all_values, all_validity, aux, plo, phi
                    )
                rep_lev = None
                if grp is not None and grp["def_rows"] is not None:
                    # two optional levels (optional struct + optional
                    # field): the 0/1/2 def array computed at normalize
                    def_lev = grp["def_rows"][plo:phi].astype(np.uint64)
                elif validity is not None:
                    def_lev = validity.astype(np.uint64)
                else:
                    def_lev = None
                n_lev = phi - plo
            n_dense = len(values[0]) if phys == "byte_array" else len(values)
            if lst is not None:
                pstats = _column_stats(phys, values, None, n_dense, conv == 0)
                pstats["null_count"] = n_lev - n_dense
            else:
                pstats = _column_stats(phys, values, validity, phi - plo, conv == 0)
            if data_page_version == 2:
                # v2: raw hybrid, no length prefix (lengths in the header);
                # repetition levels FIRST, then definition levels
                rep_bytes = b"" if max_rep == 0 else rle.encode(rep_lev, 1)
                dl_bytes = (
                    b"" if def_lev is None else rle.encode(def_lev, def_width)
                )
            else:
                rep_bytes = (
                    b""
                    if max_rep == 0
                    else rle.encode_len_prefixed(rep_lev, 1)
                )
                dl_bytes = (
                    b""
                    if def_lev is None
                    else rle.encode_len_prefixed(def_lev, def_width)
                )
            levels = rep_bytes + dl_bytes
            if dict_idx is not None and (
                dict_cut is None or dcur + n_dense <= dict_cut
            ):
                idx_slice = dict_idx[dcur : dcur + n_dense]
                vals_raw = bytes([dict_width]) + rle.encode(
                    idx_slice.astype(np.uint64), dict_width
                )
                page_enc = enc
            else:
                # PLAIN continuation page of a mixed chunk (mid-chunk
                # dict_fallback) — or just a non-dict chunk's page
                page_enc = "PLAIN" if dict_idx is not None else enc
                vals_raw = _encode_values(phys, page_enc, values)
                if dict_idx is not None:
                    encodings.add("PLAIN")
            dcur += n_dense
            page_off = len(out)
            if data_off is None:
                data_off = page_off
            if data_page_version == 2:
                # v2: levels live OUTSIDE the compressed section, lengths
                # in the header; only the value bytes compress
                comp_vals = _compress(vals_raw, codec)
                is_comp = codec is not None and len(comp_vals) < len(vals_raw)
                body_vals = comp_vals if is_comp else vals_raw
                dph2 = [
                    (1, _CT_I32, n_lev),
                    (2, _CT_I32, n_lev - n_dense),
                    (3, _CT_I32, phi - plo),  # rows (slots where rep == 0)
                    (4, _CT_I32, _ENC_IDS[page_enc]),
                    (5, _CT_I32, len(dl_bytes)),
                    (6, _CT_I32, len(rep_bytes)),
                    (7, _CT_TRUE, bool(is_comp)),
                ]
                hdr = _page_header(
                    3,
                    len(levels) + len(vals_raw),
                    len(levels) + len(body_vals),
                    dph2,
                )
                out += hdr
                out += levels
                out += body_vals
                raw_total += len(hdr) + len(levels) + len(vals_raw)
            else:
                data_raw = levels + vals_raw
                comp = _compress(data_raw, codec)
                dph = [
                    (1, _CT_I32, n_lev),
                    (2, _CT_I32, _ENC_IDS[page_enc]),
                    (3, _CT_I32, _ENC_IDS["RLE"]),  # def level encoding
                    (4, _CT_I32, _ENC_IDS["RLE"]),  # rep level encoding
                ]
                hdr = _page_header(0, len(data_raw), len(comp), dph)
                out += hdr
                out += comp
                raw_total += len(hdr) + len(data_raw)
            pages.append(
                {
                    "offset": page_off,
                    "comp_size": len(out) - page_off,
                    "first_row": plo - lo,
                    "n_dense": n_dense,
                    "stats": pstats,
                    "enc": page_enc,
                }
            )
        # chunk-level Statistics: the single-page default reuses the
        # page's stats verbatim; multi-page chunks pay one group pass
        # (byte-order folding of serialized page bounds would be wrong
        # for numeric types)
        if single:
            stats = dict(pages[0]["stats"])
        elif lst is not None:
            # leaf stats over the present elements; null_count counts
            # every def < max_def slot (missing-by-ancestor + null
            # elements), the parquet-mr/arrow convention
            stats = _column_stats(phys, g_values, None, g_dense, conv == 0)
            stats["null_count"] = g_nlev - g_dense
        else:
            stats = _column_stats(phys, g_values, g_validity, n, conv == 0)
        total_comp = len(out) - start
        encodings.add("RLE")
        col_meta.append(
            {
                "name": name,
                "phys": phys,
                "conv": conv,
                "max_def": max_def,
                "is_list": lst is not None,
                "grp": grp,
                "encodings": sorted(_ENC_IDS[e] for e in encodings),
                "n": g_nlev,
                "start": start,
                "data_off": data_off,
                "dict_off": dict_off,
                "dict_page_enc": dict_page_enc,
                "page_type": 3 if data_page_version == 2 else 0,
                "total_comp": total_comp,
                "total_raw": raw_total,
                "stats": stats,
                "pages": pages,
            }
        )
    return col_meta


def _finish_file(path, out: bytearray, rowgroups: list, col_meta0: list,
                 num_rows: int, codec, created_by: str,
                 sorting_columns: list | None = None) -> dict:
    """Footer: schema elements (root + one per column, from the first
    group's metadata) then one RowGroup struct per group."""
    # root num_children counts TOP-LEVEL fields: each run of consecutive
    # struct leaves shares one parent group element
    n_top = 0
    prev_parent = object()
    for c in col_meta0:
        g = c["grp"]
        parent = g["parent"] if g is not None else None
        if g is None or parent != prev_parent:
            n_top += 1
        prev_parent = parent
    schema = [
        (
            [(4, _CT_BINARY, "schema"), (5, _CT_I32, n_top)]
        )
    ]
    idx = 0
    while idx < len(col_meta0):
        c = col_meta0[idx]
        g = c["grp"]
        if g is not None:
            # grouped run (struct / list<struct> / map): one set of group
            # elements, then the run's scalar leaves
            end = idx
            while (
                end < len(col_meta0)
                and col_meta0[end]["grp"] is not None
                and col_meta0[end]["grp"]["parent"] == g["parent"]
            ):
                end += 1
            if g["kind"] == "struct":
                schema.append(
                    [
                        (3, _CT_I32, 1 if g["parent_opt"] else 0),
                        (4, _CT_BINARY, g["parent"]),
                        (5, _CT_I32, end - idx),
                    ]
                )
            elif g["kind"] == "list_struct":
                # optional group (LIST) / repeated group list /
                # optional-or-required group element { leaves }
                schema.append(
                    [
                        (3, _CT_I32, 1),
                        (4, _CT_BINARY, g["parent"]),
                        (5, _CT_I32, 1),
                        (6, _CT_I32, 3),  # ConvertedType LIST
                    ]
                )
                schema.append(
                    [(3, _CT_I32, 2), (4, _CT_BINARY, "list"), (5, _CT_I32, 1)]
                )
                schema.append(
                    [
                        (3, _CT_I32, 1 if g["elem_opt"] else 0),
                        (4, _CT_BINARY, "element"),
                        (5, _CT_I32, end - idx),
                    ]
                )
            else:  # map
                # optional group (MAP) / repeated group key_value
                # { required key, value }
                schema.append(
                    [
                        (3, _CT_I32, 1),
                        (4, _CT_BINARY, g["parent"]),
                        (5, _CT_I32, 1),
                        (6, _CT_I32, 1),  # ConvertedType MAP
                    ]
                )
                schema.append(
                    [
                        (3, _CT_I32, 2),
                        (4, _CT_BINARY, "key_value"),
                        (5, _CT_I32, end - idx),
                        (6, _CT_I32, 2),  # ConvertedType MAP_KEY_VALUE
                    ]
                )
            for ck in col_meta0[idx:end]:
                el = [
                    (1, _CT_I32, _PHYS_IDS[ck["phys"]]),
                    (3, _CT_I32, 1 if ck["grp"]["field_opt"] else 0),
                    (4, _CT_BINARY, ck["name"]),
                ]
                if ck["conv"] is not None:
                    el.append((6, _CT_I32, ck["conv"]))
                schema.append(el)
            idx = end
            continue
        idx += 1
        if c["is_list"]:
            # 3-level LIST convention: optional group (LIST, ConvertedType
            # 3) / repeated group "list" / optional "element" — the shape
            # Spark, pyarrow and DuckDB all surface as array<elem>
            schema.append(
                [
                    (3, _CT_I32, 1),  # optional
                    (4, _CT_BINARY, c["name"]),
                    (5, _CT_I32, 1),
                    (6, _CT_I32, 3),  # ConvertedType LIST
                ]
            )
            schema.append(
                [(3, _CT_I32, 2), (4, _CT_BINARY, "list"), (5, _CT_I32, 1)]
            )
            el = [
                (1, _CT_I32, _PHYS_IDS[c["phys"]]),
                (3, _CT_I32, 1),  # optional element
                (4, _CT_BINARY, "element"),
            ]
            if c["conv"] is not None:
                el.append((6, _CT_I32, c["conv"]))
            schema.append(el)
            continue
        el = [
            (1, _CT_I32, _PHYS_IDS[c["phys"]]),
            (3, _CT_I32, 1 if c["max_def"] else 0),  # optional / required
            (4, _CT_BINARY, c["name"]),
        ]
        if c["conv"] is not None:
            el.append((6, _CT_I32, c["conv"]))  # ConvertedType
        schema.append(el)

    def _boundary_order(phys: str, pages) -> int:
        """ColumnIndex.boundary_order (0 UNORDERED / 1 ASCENDING / 2
        DESCENDING), computed over the non-null pages' WRITTEN bounds —
        the exact lists a reader binary-searches, so truncated byte-array
        bounds stay consistent with the order claim (parquet-mr's
        ColumnIndexBuilder makes the same call). Byte arrays and bools
        compare as unsigned bytes (the file's declared TypeDefinedOrder);
        fixed types decode their PLAIN stat bytes back to scalars."""
        keys = []
        for p in pages:
            if p["n_dense"] == 0:
                continue
            mn, mx = p["stats"]["min"], p["stats"]["max"]
            if phys not in ("byte_array", "bool"):
                mn = plain.decode(mn, 1, phys)[0]
                mx = plain.decode(mx, 1, phys)[0]
            keys.append((mn, mx))
        if all(a[0] <= b[0] and a[1] <= b[1] for a, b in zip(keys, keys[1:])):
            return 1
        if all(a[0] >= b[0] and a[1] >= b[1] for a, b in zip(keys, keys[1:])):
            return 2
        return 0

    # -- PageIndex: all ColumnIndex structs, then all OffsetIndex structs,
    # after the data and before the footer (parquet-mr's layout). A chunk
    # with a non-null page whose min/max could not be computed (NaN floats,
    # un-boundable byte-array max) skips its ColumnIndex — a wrong bound
    # would corrupt pruning; the OffsetIndex is unconditional. --
    for col_meta, _ in rowgroups:
        for c in col_meta:
            pages = c["pages"]
            indexable = all(
                p["n_dense"] == 0
                or (
                    p["stats"]["min"] is not None
                    and p["stats"]["max"] is not None
                )
                for p in pages
            )
            if not indexable:
                c["ci_off"] = None
                continue
            ci = _tstruct(
                [
                    (1, _CT_LIST, (_CT_TRUE,
                                   [p["n_dense"] == 0 for p in pages])),
                    (2, _CT_LIST, (_CT_BINARY,
                                   [p["stats"]["min"] or b"" for p in pages])),
                    (3, _CT_LIST, (_CT_BINARY,
                                   [p["stats"]["max"] or b"" for p in pages])),
                    (4, _CT_I32, _boundary_order(c["phys"], pages)),
                    (5, _CT_LIST, (_CT_I64,
                                   [p["stats"]["null_count"] for p in pages])),
                ]
            )
            c["ci_off"], c["ci_len"] = len(out), len(ci)
            out += ci
    for col_meta, _ in rowgroups:
        for c in col_meta:
            oi = _tstruct(
                [
                    (
                        1,
                        _CT_LIST,
                        (
                            _CT_STRUCT,
                            [
                                [
                                    (1, _CT_I64, p["offset"]),
                                    (2, _CT_I32, p["comp_size"]),
                                    (3, _CT_I64, p["first_row"]),
                                ]
                                for p in c["pages"]
                            ],
                        ),
                    )
                ]
            )
            c["oi_off"], c["oi_len"] = len(out), len(oi)
            out += oi

    rg_structs = []
    for col_meta, rg_rows in rowgroups:
        chunks = []
        for c in col_meta:
            g = c["grp"]
            if g is not None and g["kind"] == "list_struct":
                col_path = [g["parent"], "list", "element", c["name"]]
            elif g is not None and g["kind"] == "map":
                col_path = [g["parent"], "key_value", c["name"]]
            elif c["is_list"]:
                col_path = [c["name"], "list", "element"]
            elif g is not None:
                col_path = [g["parent"], c["name"]]
            else:
                col_path = [c["name"]]
            meta = [
                (1, _CT_I32, _PHYS_IDS[c["phys"]]),
                (2, _CT_LIST, (_CT_I32, c["encodings"])),
                (3, _CT_LIST, (_CT_BINARY, col_path)),
                (4, _CT_I32, _CODEC_IDS[codec]),
                (5, _CT_I64, c["n"]),
                (6, _CT_I64, c["total_raw"]),
                (7, _CT_I64, c["total_comp"]),
                (9, _CT_I64, c["data_off"]),
            ]
            if c["dict_off"] is not None:
                meta.append((11, _CT_I64, c["dict_off"]))
            meta.append((12, _CT_STRUCT, _stats_struct(c["stats"])))
            # PageEncodingStats (field 13): per-(page type, encoding)
            # page counts — Spark's vectorized reader consults this to
            # take the dictionary-only fast path, and it is how readers
            # see a mixed dict+PLAIN chunk (mid-chunk dict_fallback)
            # without scanning page headers
            enc_counts: dict = {}
            for p in c["pages"]:
                key = (c["page_type"], p["enc"])
                enc_counts[key] = enc_counts.get(key, 0) + 1
            if c["dict_off"] is not None:
                enc_counts[(2, c["dict_page_enc"])] = 1  # dictionary page
            meta.append(
                (
                    13,
                    _CT_LIST,
                    (
                        _CT_STRUCT,
                        [
                            [
                                (1, _CT_I32, pt),
                                (2, _CT_I32, _ENC_IDS[e]),
                                (3, _CT_I32, n),
                            ]
                            for (pt, e), n in sorted(enc_counts.items())
                        ],
                    ),
                )
            )
            chunk = [(2, _CT_I64, c["start"]), (3, _CT_STRUCT, meta)]
            chunk.append((4, _CT_I64, c["oi_off"]))
            chunk.append((5, _CT_I32, c["oi_len"]))
            if c["ci_off"] is not None:
                chunk.append((6, _CT_I64, c["ci_off"]))
                chunk.append((7, _CT_I32, c["ci_len"]))
            chunks.append(chunk)
        rg_fields = [
            (1, _CT_LIST, (_CT_STRUCT, chunks)),
            # total_byte_size is the UNCOMPRESSED data size by spec
            # (readers use it for split planning; r5 advice #1) — the
            # compressed size lives per-chunk in field 7
            (2, _CT_I64, sum(c["total_raw"] for c in col_meta)),
            (3, _CT_I64, rg_rows),
        ]
        if sorting_columns:
            # SortingColumn: declared sort of the rows WITHIN each group
            # (readers use it for merge planning and sort-aware scans) —
            # the caller asserts the order; this writer does not re-sort
            name_idx = {c["name"]: i for i, c in enumerate(col_meta)}
            rg_fields.append(
                (
                    4,
                    _CT_LIST,
                    (
                        _CT_STRUCT,
                        [
                            [
                                (1, _CT_I32, name_idx[nm]),
                                (2, _CT_TRUE, bool(desc)),
                                (3, _CT_TRUE, bool(nulls_first)),
                            ]
                            for nm, desc, nulls_first in sorting_columns
                        ],
                    ),
                )
            )
        rg_structs.append(rg_fields)

    footer = _tstruct(
        [
            (1, _CT_I32, 1),  # version
            (2, _CT_LIST, (_CT_STRUCT, schema)),
            (3, _CT_I64, num_rows),
            (4, _CT_LIST, (_CT_STRUCT, rg_structs)),
            (6, _CT_BINARY, created_by),
            # column_orders: TypeDefinedOrder per column — without it,
            # readers (parquet-cpp/Spark) DISTRUST the v2 min_value/
            # max_value statistics and row-group pruning never happens
            (7, _CT_LIST, (_CT_STRUCT, [[(1, _CT_STRUCT, [])] for _ in col_meta0])),
        ]
    )
    out += footer
    out += struct.pack("<I", len(footer))
    out += MAGIC
    with open(path, "wb") as f:
        f.write(out)
    return {"rows": num_rows, "bytes": len(out)}


def flat_strings(values) -> tuple[np.ndarray, bytes]:
    """Convenience: list of str/bytes -> the (lengths, data) dense form."""
    bs = [v.encode() if isinstance(v, str) else bytes(v) for v in values]
    return np.asarray([len(b) for b in bs], np.int64), b"".join(bs)
