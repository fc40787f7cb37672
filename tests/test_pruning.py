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


def test_string_pruning_skips_chunks(spark):
    """vmin_s/vmax_s actually prune: fewer chunks decode than a full scan,
    and the result equals full-scan + filter."""
    from pyspark.sql import functions as F

    from engine import datagen
    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.createDataFrame(datagen.generate_pandas(400, seed=11))
    chunks = encode_job.encode_table(df, rows_per_bucket=32).persist()
    total = chunks.select("chunk_id").distinct().count()
    kept = decode_job._pruned_chunk_ids(chunks, "source", "web", "web").count()
    assert 0 < kept < total
    pruned = decode_job.decode_chunks_pruned(chunks, "source", "web", "web")
    got = pruned.where(F.col("source") == "web").count()
    want = df.where(F.col("source") == "web").count()
    assert got == want > 0


def test_float_pruning_generic_table(spark):
    from pyspark.sql import functions as F

    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    # two value regimes in separate bucket keys -> prunable float stats
    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit("lo")).otherwise(F.lit("hi")).alias("grp"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 10).cast("double"))
        .otherwise((F.col("id") % 10 + 1000).cast("double"))
        .alias("value"),
    )
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=128,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
    ).persist()
    total = chunks.select("chunk_id").distinct().count()
    kept = decode_job._pruned_chunk_ids(chunks, "value", 0.0, 100.0).count()
    assert 0 < kept < total
    out = decode_job.decode_table_pruned(chunks, cols, "value", 0.0, 100.0)
    got = out.where(F.col("value") <= 100.0).count()
    assert got == 500


def test_all_null_chunk_pruned_away(spark):
    from pyspark.sql import functions as F

    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 100, F.lit("a")).otherwise(F.lit("b")).alias("grp"),
        # grp 'b' rows are ALL NULL for value -> its chunks have no float stats
        F.when(F.col("id") < 100, F.col("id").cast("double")).alias("value"),
    )
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=512,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
    ).persist()
    kept = decode_job._pruned_chunk_ids(chunks, "value", 0.0, 1e9)
    keys = {
        r["bucket_key"]
        for r in chunks.join(kept, "chunk_id", "left_semi").select("bucket_key").collect()
    }
    assert keys == {"a"}  # the all-null bucket can't qualify and is skipped


def test_token_histogram_matches_explode(spark):
    """Histogram from encoded chunks (no record assembly) equals the naive
    decode + explode + groupBy, including over nullable scalar columns."""
    from pyspark.sql import functions as F

    from engine import datagen
    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.createDataFrame(datagen.generate_pandas(300, seed=9))
    chunks = encode_job.encode_table(df, rows_per_bucket=64).persist()
    fast = decode_job.token_histogram(chunks).toPandas().set_index("token")["n"]
    naive = (
        decode_job.decode_chunks(chunks)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .count()
        .toPandas()
        .set_index("token")["count"]
    )
    assert fast.sort_index().equals(naive.sort_index().astype("int64"))
    # nullable scalar column histogram counts non-null values only
    ev = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        F.lit("g").alias("grp"),
        F.when(F.col("id") % 3 != 0, (F.col("id") % 5).cast("int")).alias("v"),
    )
    cols = encode_job.derive_columns(ev)
    ech = encode_job.encode_table(
        ev, columns=cols, rows_per_bucket=64,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
    )
    h = decode_job.token_histogram(ech, column="v").agg(F.sum("n")).first()[0]
    assert h == ev.where(F.col("v").isNotNull()).count()
    # loud error on non-numeric columns
    import pytest

    with pytest.raises(Exception, match="numeric flat"):
        decode_job.token_histogram(chunks, column="doc_id").count()


def test_binary_column_prune_keeps_chunks(spark):
    """Binary columns carry NO stat family; a bound against one must keep
    every non-all-null chunk (decode-and-filter fallback) — before the fix,
    the NULL stats failed the range predicate and EVERY chunk dropped
    (wrong results, not a missed prune)."""
    from pyspark.sql import functions as F

    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        F.lit("g").alias("grp"),
        F.col("id").cast("string").cast("binary").alias("payload"),
    )
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=64,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
    ).persist()
    total = chunks.select("chunk_id").distinct().count()
    kept = decode_job._pruned_chunk_ids(chunks, "payload", 0, 10).count()
    assert kept == total  # no stats -> keep, never drop
    out = decode_job.decode_table_pruned(chunks, cols, "payload", 0, 10)
    assert out.count() == 200
    chunks.unpersist()


def test_bool_column_pruning(spark):
    """Bool chunks carry 0/1 min/max in the integer stat family: a
    flag == true predicate skips all-false chunks and stays transparent."""
    from pyspark.sql import functions as F

    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 100, F.lit("a")).otherwise(F.lit("b")).alias("grp"),
        # grp 'a' chunks are all-false, grp 'b' all-true
        (F.col("id") >= 100).alias("flag"),
    )
    cols = encode_job.derive_columns(df)
    chunks = encode_job.encode_table(
        df, columns=cols, rows_per_bucket=512,
        bucket_key="grp", salt_col="event_id", sort_col="event_id",
    ).persist()
    kept = decode_job._pruned_chunk_ids(chunks, "flag", 1, 1)
    keys = {
        r["bucket_key"]
        for r in chunks.join(kept, "chunk_id", "left_semi")
        .select("bucket_key")
        .collect()
    }
    assert keys == {"b"}  # all-false chunks pruned
    out = decode_job.decode_table_pruned(chunks, cols, "flag", 1, 1)
    assert out.where(F.col("flag")).count() == 100
    chunks.unpersist()


def test_float_bounds_on_int_column_prune_correctly(spark):
    """A float predicate against an int column must not silently drop
    everything (int columns carry vmin/vmax, not vmin_d) — coalesced
    family comparison keeps pruning transparent."""
    from pyspark.sql import functions as F

    from engine import datagen
    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    df = spark.createDataFrame(datagen.generate_pandas(200, seed=4))
    chunks = encode_job.encode_table(df, rows_per_bucket=64).persist()
    out = decode_job.decode_chunks_pruned(chunks, "tokens", 0.5, 1e12)
    assert out.count() == 200  # nothing falsely pruned
    assert decode_job._pruned_chunk_ids(chunks, "n_tok", -0.5, 0.5).count() == 0
