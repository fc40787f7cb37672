"""Nullable chunk framing (def levels) + projected decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import chunk, datagen
from engine.jobs import decode as decode_job
from engine.jobs import encode as encode_job


@pytest.mark.parametrize("codec", ["plain", "dict", "delta", "bitpack", "rle"])
def test_nullable_chunk_roundtrip(codec):
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 1000, 500).astype(np.int32)
    valid = rng.integers(0, 4, 500) > 0
    blob = chunk.encode_chunk(vals, codec, "int32", valid=valid)
    info = chunk.read_info(blob)
    assert info.flags & chunk.FLAG_NULLABLE
    assert info.n_values == 500
    out, out_valid = chunk.decode_chunk(blob)
    np.testing.assert_array_equal(out_valid, valid)
    np.testing.assert_array_equal(out[valid], vals[valid])


def test_nullable_all_null_and_all_valid():
    vals = np.arange(100, dtype=np.int32)
    for valid in (np.zeros(100, bool), np.ones(100, bool)):
        blob = chunk.encode_chunk(vals, "delta", "int32", valid=valid)
        out, out_valid = chunk.decode_chunk(blob)
        np.testing.assert_array_equal(out_valid, valid)
        np.testing.assert_array_equal(out[valid], vals[valid])


def test_float_chunks_roundtrip():
    rng = np.random.default_rng(5)
    for dtype in ("float32", "float64"):
        vals = rng.standard_normal(1000).astype(dtype)
        blob = chunk.encode_chunk(vals, "plain", dtype)
        np.testing.assert_array_equal(chunk.decode_chunk(blob), vals)
        # low-cardinality floats dictionary-encode
        lc = rng.choice(np.array([0.5, 1.5, 2.5], dtype), 1000)
        dblob = chunk.encode_chunk(lc, "dict", dtype)
        np.testing.assert_array_equal(chunk.decode_chunk(dblob), lc)
        assert len(dblob) < len(chunk.encode_chunk(lc, "plain", dtype))


def test_projected_decode(spark):
    df = spark.createDataFrame(datagen.generate_pandas(120, seed=6))
    chunks = encode_job.encode_table(df, rows_per_bucket=64).persist()
    proj = decode_job.decode_chunks(chunks, columns=["doc_id", "n_tok"])
    assert proj.columns == ["doc_id", "n_tok"]
    pdf = proj.toPandas()
    assert len(pdf) == 120
    full = decode_job.decode_chunks(chunks).select("doc_id", "n_tok").toPandas()
    a = pdf.sort_values("doc_id").reset_index(drop=True)
    b = full.sort_values("doc_id").reset_index(drop=True)
    assert (a == b).all().all()
    # tokens-only projection still works (pulls n_tok for offsets internally)
    tok = decode_job.decode_chunks(chunks, columns=["tokens"]).toPandas()
    assert list(tok.columns) == ["tokens"] and len(tok) == 120
    chunks.unpersist()
