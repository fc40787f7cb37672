"""Structured Streaming ingest: file-source micro-batches -> chunk store."""

import os

import pytest
from pyspark.sql import functions as F

from engine import datagen, lineage, streaming
from engine.jobs import decode as decode_job


def test_stream_encode_file_source(spark, tmp_path):
    # stage the corpus as two parquet files (two potential micro-batches)
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    pdf = datagen.generate_pandas(200, seed=33)
    spark.createDataFrame(pdf.iloc[:100]).write.parquet(src_dir + "/p1")
    spark.createDataFrame(pdf.iloc[100:]).write.parquet(src_dir + "/p2")

    static = spark.read.option("recursiveFileLookup", "true").parquet(src_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    store = lineage.ChunkStore(spark, str(tmp_path / "store"))
    q = streaming.encode_stream(
        stream,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
        rows_per_bucket=64,
    )
    q.awaitTermination(120)

    decoded = decode_job.decode_chunks(store.read_chunks())
    assert decoded.count() == 200
    # exact round trip through the stream path
    orig = spark.createDataFrame(pdf)
    bad = (
        orig.alias("a")
        .join(decoded.alias("b"), "doc_id", "full")
        .where(
            ~(F.col("a.tokens") == F.col("b.tokens"))
            | F.col("a.tokens").isNull()
            | F.col("b.tokens").isNull()
        )
        .count()
    )
    assert bad == 0
    # lineage recorded one run per micro-batch
    runs = {r["run_id"] for r in store.read_lineage().select("run_id").distinct().collect()}
    assert all(r.startswith("stream-batch-") for r in runs)
    assert len(runs) >= 1


def test_windowed_token_stats_watermark(spark, tmp_path):
    """Event-time tumbling windows + watermark: closed windows emit once in
    append mode; the result equals the batch aggregation of on-time rows."""
    import datetime

    import pandas as pd

    src_dir = str(tmp_path / "win_in")
    os.makedirs(src_dir)
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(120):
        rows.append(
            {
                "doc_id": f"d{i:04d}",
                "source": "web" if i % 2 == 0 else "books",
                "n_tok": 10 + i % 7,
                "ts": base + datetime.timedelta(seconds=10 * i),  # spans 20 min
            }
        )
    pdf = pd.DataFrame(rows)
    static = spark.createDataFrame(pdf)
    static.write.parquet(src_dir + "/p1")

    stream = (
        spark.readStream.schema(static.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out = streaming.windowed_token_stats(stream, "1 minute", "2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_stats").toPandas()
    assert len(got) > 0
    # every emitted window is closed w.r.t. the final watermark (max ts - 2min)
    wm = pdf["ts"].max() - datetime.timedelta(minutes=2)
    assert (got["win_end"] <= wm).all()
    # values match the batch aggregation for those windows
    batch = (
        static.groupBy(F.window("ts", "1 minute"), "source")
        .agg(F.count("*").alias("n_docs"), F.sum(F.col("n_tok").cast("long")).alias("n_tokens"))
        .select(F.col("window.start").alias("win_start"), "source", "n_docs", "n_tokens")
        .toPandas()
    )
    merged = got.merge(batch, on=["win_start", "source"], suffixes=("", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_docs"] == merged["n_docs_b"]).all()
    assert (merged["n_tokens"] == merged["n_tokens_b"]).all()


def test_stateful_exact_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates are suppressed WITHIN a
    micro-batch and ACROSS micro-batches (state persists)."""
    import pandas as pd

    src_dir = str(tmp_path / "dd_in")
    os.makedirs(src_dir)
    schema = "doc_id string, text string"
    b1 = pd.DataFrame(
        {
            "doc_id": ["a1", "a2", "a3"],
            "text": ["alpha text", "alpha text", "beta text"],  # a2 dup of a1
        }
    )
    b2 = pd.DataFrame(
        {
            "doc_id": ["b1", "b2"],
            "text": ["alpha text", "gamma text"],  # b1 dup from PREVIOUS batch
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(src_dir + "/p1")

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming.stateful_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r["survivor_id"])
            for r in spark.sql("select * from dd_out").collect()
        }
        assert first == {"a1", "a3"}  # within-batch dup suppressed, min id wins
        spark.createDataFrame(b2).coalesce(1).write.parquet(src_dir + "/p2")
        q.processAllAvailable()
        after = {
            (r["survivor_id"])
            for r in spark.sql("select * from dd_out").collect()
        }
        assert after == {"a1", "a3", "b2"}  # cross-batch dup b1 suppressed
    finally:
        q.stop()
