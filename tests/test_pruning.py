"""Statistics-based chunk pruning (chunk-level predicate pushdown)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.jobs import decode as decode_job
from engine.jobs import encode as encode_job


@pytest.fixture(scope="module")
def banded_corpus(spark):
    """Each source occupies a disjoint token range -> disjoint chunk stats."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(300):
        band = i % 3  # 0: [0,100), 1: [1000,1100), 2: [100000,100100)
        base = [0, 1000, 100000][band]
        toks = (base + rng.integers(0, 100, 50)).astype(np.int32)
        rows.append(
            {
                "doc_id": f"d{i:05d}",
                "tokens": toks,
                "n_tok": np.int32(50),
                "source": f"band{band}",
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    df.persist().count()
    return df


def test_chunk_stats_recorded(spark, banded_corpus):
    chunks = encode_job.encode_table(banded_corpus, rows_per_bucket=64).toPandas()
    tok = chunks[chunks["column"] == "tokens"]
    assert tok["vmin"].notna().all() and tok["vmax"].notna().all()
    b0 = tok[tok["chunk_id"].str.startswith("band0#")]
    assert (b0["vmax"] < 1000).all()


def test_pruned_decode_skips_chunks_and_stays_correct(spark, banded_corpus):
    chunks = encode_job.encode_table(banded_corpus, rows_per_bucket=64).persist()
    # predicate range [1000, 1100): only band1 chunks qualify
    pruned = decode_job.decode_chunks_pruned(chunks, "tokens", 1000, 1099)
    docs = pruned.select("doc_id", "source").toPandas()
    assert set(docs["source"]) == {"band1"}
    assert len(docs) == 100  # all band1 docs, nothing else decoded
    # transparent: filter-after-prune == filter-after-full-scan
    full = (
        decode_job.decode_chunks(chunks)
        .select(F.explode("tokens").alias("t"))
        .where((F.col("t") >= 1000) & (F.col("t") <= 1099))
        .count()
    )
    got = (
        pruned.select(F.explode("tokens").alias("t"))
        .where((F.col("t") >= 1000) & (F.col("t") <= 1099))
        .count()
    )
    assert got == full == 100 * 50
    chunks.unpersist()


def test_prune_empty_range(spark, banded_corpus):
    chunks = encode_job.encode_table(banded_corpus, rows_per_bucket=64)
    assert decode_job.decode_chunks_pruned(chunks, "tokens", 500, 800).count() == 0
