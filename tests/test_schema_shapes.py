"""Schema-shape fixtures (FIXTURES.md F4): the reference's golden-file shapes
recreated as Spark DataFrames, flattened to leaf columns, and round-tripped
through the chunk layer — pins the SURVEY.md §1.7 type mapping.

(We do not read the reference's parquet files; we reproduce their shapes.)
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import chunk, levels
from engine.codecs import bytearrays


def test_alltypes_shape_roundtrip(spark):
    """alltypes_plain.parquet shape: id int32, bool, tinyint/smallint/int
    (all int32 per src/basic.rs:33-36), bigint, float, double, date_string
    binary, string binary, timestamp (int96 -> int64 micros)."""
    pdf = pd.DataFrame(
        {
            "id": np.arange(8, dtype=np.int32),
            "bool_col": np.array([True, False] * 4),
            "tinyint_col": np.arange(8, dtype=np.int32) % 2,
            "smallint_col": np.arange(8, dtype=np.int32) % 2,
            "int_col": np.arange(8, dtype=np.int32) % 2,
            "bigint_col": (np.arange(8, dtype=np.int64) % 2) * 10,
            "float_col": (np.arange(8) % 2).astype(np.float32) * 1.1,
            "double_col": (np.arange(8) % 2).astype(np.float64) * 10.1,
            "date_string_col": [f"0{(i // 2) % 2 + 1}/01/09" for i in range(8)],
            "string_col": [str(i % 2) for i in range(8)],
            "ts_us": np.arange(8, dtype=np.int64) * 1_000_000,
        }
    )
    kinds = {
        "id": "int32", "bool_col": "bool", "tinyint_col": "int32",
        "smallint_col": "int32", "int_col": "int32", "bigint_col": "int64",
        "float_col": "float32", "double_col": "float64",
        "date_string_col": "bytes", "string_col": "bytes", "ts_us": "int64",
    }
    for col, kind in kinds.items():
        if kind == "bytes":
            lengths, data = bytearrays.flat_from_values(pdf[col].tolist())
            blob = chunk.encode_chunk((lengths, data), "plain_ba", "bytes")
            out_lens, out_data = chunk.decode_chunk(blob)
            np.testing.assert_array_equal(out_lens, lengths)
            assert out_data == data
        else:
            vals = pdf[col].to_numpy(dtype=kind if kind != "bool" else bool)
            codec = "plain" if kind.startswith("float") or kind == "bool" else "dict"
            blob = chunk.encode_chunk(vals, codec, kind)
            np.testing.assert_array_equal(chunk.decode_chunk(blob), vals)


def test_nested_list_shape_roundtrip(spark):
    """nested_lists shape: optional list columns — rep levels via shred_lists
    + def levels for null lists, leaf values chunk-encoded."""
    lists = [[1, 2, 3], None, [], [4], [5, 6]]
    valid = np.array([x is not None for x in lists])
    non_null = [x for x in lists if x is not None]
    lens = np.array([len(x) for x in non_null], np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = np.concatenate([np.asarray(x, np.int32) for x in non_null if len(x)])
    rep = levels.shred_lists(offsets)
    # encode: def levels (null lists) + lengths + leaf values
    def_buf = levels.encode_v1(valid.astype(np.uint64), 1)
    len_blob = chunk.encode_chunk(lens.astype(np.int32), "rle", "int32")
    val_blob = chunk.encode_chunk(flat, "dict", "int32")
    # decode + reassemble
    d_def, _ = levels.decode_v1(def_buf, 1, len(lists))
    d_lens = chunk.decode_chunk(len_blob).astype(np.int64)
    d_flat = chunk.decode_chunk(val_blob)
    d_off = np.concatenate(([0], np.cumsum(d_lens)))
    rebuilt, k = [], 0
    for i, v in enumerate(d_def.astype(bool)):
        if not v:
            rebuilt.append(None)
        else:
            rebuilt.append(list(d_flat[d_off[k] : d_off[k + 1]]))
            k += 1
    assert rebuilt == lists
    assert (rep == np.array([0, 1, 1, 0, 0, 1])).all()


def test_nested_map_shape_roundtrip(spark):
    """nested_maps shape: map<string,int> as parallel key/value leaf streams
    with shared lengths (parquet's repeated key_value group)."""
    maps = [{"a": 1, "b": 2}, {}, {"c": 3}]
    lens = np.array([len(m) for m in maps], np.int32)
    keys = [k for m in maps for k in m]
    vals = np.array([v for m in maps for v in m.values()], np.int32)
    klens, kdata = bytearrays.flat_from_values(keys)
    len_blob = chunk.encode_chunk(lens, "rle", "int32")
    key_blob = chunk.encode_chunk((klens, kdata), "dict_ba", "bytes")
    val_blob = chunk.encode_chunk(vals, "plain", "int32")
    d_lens = chunk.decode_chunk(len_blob).astype(np.int64)
    d_klens, d_kdata = chunk.decode_chunk(key_blob)
    d_vals = chunk.decode_chunk(val_blob)
    koff = np.concatenate(([0], np.cumsum(d_klens.astype(np.int64))))
    d_keys = [d_kdata[koff[i] : koff[i + 1]].decode() for i in range(len(keys))]
    out, p = [], 0
    for ln in d_lens:
        out.append(dict(zip(d_keys[p : p + ln], d_vals[p : p + ln])))
        p += int(ln)
    assert out == maps


def test_all_null_page_shape(spark):
    """nulls.snappy.parquet shape: an optional column whose page is entirely
    null — def levels all zero, zero-length value stream."""
    vals = np.zeros(64, np.int32)
    blob = chunk.encode_chunk(vals, "plain", "int32", valid=np.zeros(64, bool))
    out, valid = chunk.decode_chunk(blob)
    assert not valid.any() and len(out) == 64


def test_spark_type_mapping_table(spark):
    """SURVEY §1.7: Spark schema for the corpus + generic tables matches the
    declared mapping (REQUIRED/OPTIONAL -> nullable)."""
    from engine.jobs.decode import DECODED_SCHEMA

    fields = {f.name: f for f in DECODED_SCHEMA.fields}
    assert fields["tokens"].dataType.simpleString() == "array<int>"
    assert not fields["tokens"].nullable  # REQUIRED
    assert fields["doc_id"].dataType.simpleString() == "string"
