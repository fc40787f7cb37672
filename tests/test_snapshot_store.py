"""Snapshot-commit ChunkStore: atomic visibility, resume, conflict retry.

Iceberg-style optimistic commits on plain files (no Iceberg runtime in this
container): data lands in an invisible directory, one atomic manifest link
publishes it; readers always see a complete snapshot.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from engine import datagen, lineage
from engine.jobs import decode as decode_job


def test_snapshot_commit_roundtrip_and_resume(spark, tmp_path):
    store = lineage.ChunkStore(spark, str(tmp_path / "s"), table_format="snapshot")
    df = spark.createDataFrame(datagen.generate_pandas(300, seed=21))
    n1 = lineage.encode_with_resume(
        spark, df.where(F.col("source") != "web"), store, rows_per_bucket=64
    )
    assert n1 > 0 and store.current_version() == 1
    n2 = lineage.encode_with_resume(spark, df, store, rows_per_bucket=64)
    assert n2 > 0 and store.current_version() == 2
    n3 = lineage.encode_with_resume(spark, df, store, rows_per_bucket=64)
    assert n3 == 0 and store.current_version() == 2  # no empty snapshots
    dec = decode_job.decode_chunks(store.read_chunks())
    assert dec.count() == 300
    bad = (
        df.alias("a").join(dec.alias("b"), "doc_id")
        .where(~(F.col("a.tokens") == F.col("b.tokens"))).count()
    )
    assert bad == 0


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """A crash between data write and manifest publish leaves NO visible
    state: simulate by writing a data dir without publishing."""
    store = lineage.ChunkStore(spark, str(tmp_path / "s"), table_format="snapshot")
    df = spark.createDataFrame(datagen.generate_pandas(100, seed=22))
    lineage.encode_with_resume(spark, df, store, rows_per_bucket=64)
    v = store.current_version()
    n_before = store.read_chunks().count()
    # orphan directory (crashed commit): data exists, never published
    orphan = os.path.join(store.data_path, "deadbeef")
    store.read_chunks().limit(1).write.parquet(os.path.join(orphan, "chunks"))
    assert store.current_version() == v
    assert store.read_chunks().count() == n_before  # invisible


def test_conflicting_publish_retries(spark, tmp_path):
    """Optimistic concurrency: a writer that loses the manifest race
    re-reads the latest snapshot and publishes the next version."""
    store = lineage.ChunkStore(spark, str(tmp_path / "s"), table_format="snapshot")
    df = spark.createDataFrame(datagen.generate_pandas(80, seed=23))
    lineage.encode_with_resume(spark, df, store, rows_per_bucket=64)
    # simulate a concurrent winner: hand-publish v2 before our next commit
    snap = store._latest_snapshot()
    winner = dict(snap, version=2, run_id="intruder")
    with open(os.path.join(store.snapshots_path, "v000000000002.json"), "w") as f:
        json.dump(winner, f)
    more = spark.createDataFrame(datagen.generate_pandas(40, seed=24)).withColumn(
        "doc_id", F.concat(F.lit("x-"), F.col("doc_id"))
    )
    # chunk_suffix scopes the new batch's buckets (new data, same store)
    n = lineage.encode_with_resume(
        spark, more, store, rows_per_bucket=64, chunk_suffix="b2"
    )
    assert n > 0
    assert store.current_version() == 3  # lost race at v2, retried into v3
    assert store.read_chunks().select("chunk_id").distinct().count() > 0


def test_conflict_exhaustion_raises(spark, tmp_path):
    store = lineage.ChunkStore(spark, str(tmp_path / "s"), table_format="snapshot")
    df = spark.createDataFrame(datagen.generate_pandas(40, seed=25))
    lineage.encode_with_resume(spark, df, store, rows_per_bucket=64)

    class _Racer:
        def __init__(self, store):
            self.store = store
            self.orig = store._latest_snapshot

        def __call__(self):
            snap = self.orig()
            # always pre-create the version this writer is about to claim
            v = (snap["version"] if snap else 0) + 1
            p = os.path.join(self.store.snapshots_path, f"v{v:012d}.json")
            if not os.path.exists(p):
                with open(p, "w") as f:
                    json.dump(dict(snap, version=v, run_id="racer"), f)
            return snap

    store._latest_snapshot = _Racer(store)
    with pytest.raises(lineage.CommitConflict):
        store._publish_snapshot("d1", "d1", "run-x", max_retries=3)
