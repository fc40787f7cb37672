"""Point lookups: fetch specific doc_ids decoding only candidate chunks."""

import pytest
from pyspark.sql import functions as F

from engine import datagen, lineage


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lkp")
    s = lineage.ChunkStore(spark, str(base / "store"))
    df = spark.createDataFrame(datagen.generate_pandas(400, seed=17))
    lineage.encode_with_resume(spark, df, s, rows_per_bucket=32)
    return s, df


def test_lookup_returns_exact_rows(spark, store):
    s, df = store
    wanted = [r["doc_id"] for r in df.select("doc_id").limit(5).collect()]
    out = lineage.lookup_docs(s, wanted)
    rows = {r["doc_id"]: (list(r["tokens"]), r["source"]) for r in out.collect()}
    assert set(rows) == set(wanted)
    orig = {
        r["doc_id"]: (list(r["tokens"]), r["source"])
        for r in df.where(F.col("doc_id").isin(wanted)).collect()
    }
    assert rows == orig


def test_lookup_decodes_only_candidate_chunks(spark, store):
    s, df = store
    wanted = [df.select("doc_id").first()[0]]
    n_chunks_total = s.read_lineage().select("chunk_id").distinct().count()
    # candidate set: one chunk per source (unknown source) << total chunks
    n_sources = s.read_lineage().select("bucket_key").distinct().count()
    assert n_chunks_total > n_sources  # pruning is meaningful here
    out = lineage.lookup_docs(s, wanted)
    assert out.count() == 1


def test_lookup_missing_id_returns_empty(spark, store):
    s, _ = store
    assert lineage.lookup_docs(s, ["doc-nonexistent-999"]).count() == 0


def test_lookup_survives_empty_top_salt_bucket(spark, tmp_path):
    """bucket_n is persisted, not inferred: drop every lineage row of the
    highest salt bucket of one source and lookups must still resolve (a
    max(salt)+1 reconstruction would recompute the wrong pmod)."""
    s = lineage.ChunkStore(spark, str(tmp_path / "store"))
    df = spark.createDataFrame(datagen.generate_pandas(300, seed=23))
    lineage.encode_with_resume(spark, df, s, rows_per_bucket=16)
    lin = spark.read.parquet(s.lineage_path)
    top = (
        lin.groupBy("bucket_key")
        .agg(F.max("bucket_salt").alias("m"))
        .orderBy(F.desc("m"))
        .collect()
    )
    key0, m0 = top[0]["bucket_key"], top[0]["m"]
    assert m0 > 0  # salting actually happened
    pruned_pdf = lin.where(
        ~((F.col("bucket_key") == key0) & (F.col("bucket_salt") == m0))
    ).toPandas()
    spark.createDataFrame(pruned_pdf, lin.schema).write.mode("overwrite").parquet(
        s.lineage_path
    )
    pruned = spark.read.parquet(s.lineage_path)
    # pick ids NOT in the dropped bucket so their chunks still exist
    surviving = {r["chunk_id"] for r in pruned.select("chunk_id").distinct().collect()}
    rows = s.read_chunks().select("chunk_id").distinct().collect()
    from engine.jobs import decode as decode_job

    live = decode_job.decode_chunks(
        s.read_chunks().where(F.col("chunk_id").isin(list(surviving)))
    )
    wanted = [r["doc_id"] for r in live.select("doc_id").limit(3).collect()]
    out = lineage.lookup_docs(s, wanted)
    assert {r["doc_id"] for r in out.collect()} == set(wanted)


def test_hash_in_bucket_key_is_safe(spark):
    """A key value containing the '#' delimiter must not corrupt bucket
    recovery (ADVICE r1): chunk ids stay collision-free and lookups work."""
    import pandas as pd

    from engine import skew

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(40)],
            "tokens": [[1, 2, 3]] * 40,
            "n_tok": [3] * 40,
            "source": (["we#b"] * 20) + (["we", ] * 10) + (["b"] * 10),
        }
    )
    df = spark.createDataFrame(pdf)
    b = skew.plan_buckets(df, rows_per_bucket=8)
    rows = b.select("chunk_id", "bucket_key", "bucket_salt").collect()
    # distinct (key, salt) pairs <-> distinct chunk ids, bijectively
    pairs = {(r["bucket_key"], r["bucket_salt"]) for r in rows}
    ids = {r["chunk_id"] for r in rows}
    assert len(pairs) == len(ids)
