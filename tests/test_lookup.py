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
    parts = F.split(F.col("chunk_id"), "#")
    n_chunks_total = s.read_lineage().select("chunk_id").distinct().count()
    # candidate set: one chunk per source (unknown source) << total chunks
    n_sources = (
        s.read_lineage()
        .select(parts.getItem(0).alias("s"))
        .distinct()
        .count()
    )
    assert n_chunks_total > n_sources  # pruning is meaningful here
    out = lineage.lookup_docs(s, wanted)
    assert out.count() == 1


def test_lookup_missing_id_returns_empty(spark, store):
    s, _ = store
    assert lineage.lookup_docs(s, ["doc-nonexistent-999"]).count() == 0
