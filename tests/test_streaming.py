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
