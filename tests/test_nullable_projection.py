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


def test_decode_table_projection(spark):
    """decode_table(select=...): only requested columns' payload rows enter
    the decode, results match a full decode + select, and chunks written
    before every requested column existed still contribute all-NULL rows."""
    from pyspark.sql import functions as F

    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    old = spark.range(0, 100).select(
        F.col("id").alias("event_id"),
        F.lit("g").alias("grp"),
        (F.col("id") * 2).cast("double").alias("a"),
    )
    new = spark.range(100, 200).select(
        F.col("id").alias("event_id"),
        F.lit("g").alias("grp"),
        (F.col("id") * 2).cast("double").alias("a"),
        F.concat(F.lit("v"), F.col("id")).alias("b"),  # added later
    )
    cols_old = encode_job.derive_columns(old)
    cols_new = encode_job.derive_columns(new)
    ch_old = encode_job.encode_table(
        old, columns=cols_old, rows_per_bucket=64,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
        chunk_suffix="era1",
    )
    ch_new = encode_job.encode_table(
        new, columns=cols_new, rows_per_bucket=64,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
        chunk_suffix="era2",
    )
    chunks = ch_old.unionByName(ch_new, allowMissingColumns=True).persist()

    # projection over a column both eras have
    got = decode_job.decode_table(chunks, cols_new, select=["a"])
    assert got.columns == ["a"]
    assert got.count() == 200
    assert got.agg(F.sum("a")).first()[0] == float(sum(i * 2 for i in range(200)))

    # projection over the era-2-only column: era-1 chunks (which carry NO
    # requested column at all) come back as all-NULL rows, not lost rows
    got_b = decode_job.decode_table(chunks, cols_new, select=["b"])
    assert got_b.count() == 200
    assert got_b.where(F.col("b").isNull()).count() == 100
    assert got_b.where(F.col("b").isNotNull()).count() == 100

    # unknown column fails loudly
    import pytest

    with pytest.raises(ValueError, match="unknown columns"):
        decode_job.decode_table(chunks, cols_new, select=["nope"])
    chunks.unpersist()


def test_pruned_decode_with_projection(spark):
    """Predicate pruning composes with projection: stats select the chunks,
    then only the requested (non-predicate) column's payload decodes."""
    from pyspark.sql import functions as F

    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 500, F.lit("lo")).otherwise(F.lit("hi")).alias("grp"),
        F.when(F.col("id") < 500, (F.col("id") % 10).cast("double"))
        .otherwise((F.col("id") % 10 + 1000).cast("double"))
        .alias("value"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=128,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
    ).persist()
    out = decode_job.decode_table_pruned(
        chunks, cols, "value", 0.0, 100.0, select=["name"]
    )
    # the predicate column is force-included: pruning is chunk-granular, so
    # the caller must be able to apply the row-level predicate afterwards
    assert out.columns == ["name", "value"]
    assert out.count() == 500  # only 'lo' chunks decoded
    assert out.where(F.col("value") <= 100.0).count() == 500
    # explicit select keeps the requested order
    out2 = decode_job.decode_table_pruned(
        chunks, cols, "value", 0.0, 100.0, select=["value", "name"]
    )
    assert out2.columns == ["value", "name"]
    chunks.unpersist()
