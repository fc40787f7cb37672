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

Concurrency: with the default parquet backend, two writers racing the same
store can both encode the same missing bucket (parquet append has no commit
coordination) — the chunks are byte-identical so reads stay correct, but
storage duplicates. ``table_format='snapshot'`` adds Iceberg-style
optimistic snapshot commits on top of plain files: every commit writes its
data to a fresh directory and publishes it by atomically creating the next
manifest version (``os.link`` fails on EEXIST — the loser re-reads the new
latest snapshot and retries). Readers always see a complete snapshot; a
crash mid-commit leaves only an invisible orphan directory. On a real
cluster with Iceberg jars, ``writeTo(...).append()`` replaces this layer
with the genuine article; the logic above it is identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

CHUNKS_SUBDIR = "chunks"
LINEAGE_SUBDIR = "lineage"
DATA_SUBDIR = "data"
SNAPSHOTS_SUBDIR = "snapshots"


class CommitConflict(RuntimeError):
    """Another writer published a snapshot first and retries ran out."""


class ChunkStore:
    """A chunk dataset + its lineage table rooted at ``path``.

    ``table_format``: 'parquet' (append datasets, default) or 'snapshot'
    (atomic manifest-versioned commits, optimistic concurrency).

    Chunk-id format: v2 (10-digit zero-padded salts). Stores written by the
    v1 (5-digit) revision are NOT resume/lookup-compatible — recomputed ids
    no longer match the persisted ones; re-encode such stores.
    """

    def __init__(self, spark: SparkSession, path: str, table_format: str = "parquet"):
        self.spark = spark
        self.path = path
        self.table_format = table_format
        self.chunks_path = os.path.join(path, CHUNKS_SUBDIR)
        self.lineage_path = os.path.join(path, LINEAGE_SUBDIR)
        self.snapshots_path = os.path.join(path, SNAPSHOTS_SUBDIR)
        self.data_path = os.path.join(path, DATA_SUBDIR)

    # -- snapshot manifest helpers --------------------------------------------

    def _latest_snapshot(self) -> dict | None:
        if not os.path.isdir(self.snapshots_path):
            return None
        versions = sorted(
            f for f in os.listdir(self.snapshots_path)
            if f.startswith("v") and f.endswith(".json")
        )
        if not versions:
            return None
        with open(os.path.join(self.snapshots_path, versions[-1])) as f:
            return json.load(f)

    def current_version(self) -> int:
        snap = self._latest_snapshot()
        return snap["version"] if snap else 0

    def _publish_snapshot(self, chunk_dir: str, lineage_dir: str, run_id: str,
                          max_retries: int = 5, replace: bool = False,
                          expected_base: int | None = None) -> int:
        """Atomically publish the next snapshot version including all prior
        data dirs + this commit's. ``os.link`` onto the version path fails
        with EEXIST if a concurrent writer won — re-read and retry.
        ``replace=True`` publishes a snapshot containing ONLY this commit's
        dirs (compaction: the rewritten dataset supersedes every prior dir;
        prior versions' files stay on disk for time travel / GC). A replace
        MUST pin ``expected_base`` — if any writer published past that
        version, blindly retrying would silently drop their commit from
        the replacing manifest, so the publish aborts with CommitConflict
        instead (Iceberg's REPLACE validation; the caller re-runs
        compaction over the newer snapshot)."""
        os.makedirs(self.snapshots_path, exist_ok=True)
        for _ in range(max_retries):
            snap = self._latest_snapshot()
            if replace and (snap["version"] if snap else 0) != expected_base:
                raise CommitConflict(
                    f"snapshot advanced past v{expected_base} during "
                    "compaction; re-run against the latest snapshot"
                )
            version = (snap["version"] if snap else 0) + 1
            prior_c = [] if replace else (snap["chunks_dirs"] if snap else [])
            prior_l = [] if replace else (snap["lineage_dirs"] if snap else [])
            manifest = {
                "version": version,
                "run_id": run_id,
                "ts": time.time(),
                "chunks_dirs": prior_c + [chunk_dir],
                "lineage_dirs": prior_l + [lineage_dir],
            }
            tmp = os.path.join(self.snapshots_path, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            target = os.path.join(self.snapshots_path, f"v{version:012d}.json")
            try:
                os.link(tmp, target)  # atomic create-if-absent on POSIX
                os.unlink(tmp)
                return version
            except FileExistsError:
                os.unlink(tmp)  # lost the race: re-read latest, retry
        raise CommitConflict(
            f"could not publish a snapshot after {max_retries} attempts"
        )

    def _snapshot_paths(self, kind: str) -> list[str]:
        snap = self._latest_snapshot()
        if not snap:
            return []
        return [os.path.join(self.data_path, d, kind) for d in snap[f"{kind}_dirs"]]

    # -- reads ---------------------------------------------------------------

    def committed_chunk_ids(self) -> DataFrame | None:
        """Distinct chunk_ids whose lineage row is committed (None if empty)."""
        if self.table_format == "snapshot":
            paths = self._snapshot_paths("lineage")
            if not paths:
                return None
            df = self.spark.read.parquet(*paths)
        else:
            if not self._exists(self.lineage_path):
                return None
            df = self.spark.read.parquet(self.lineage_path)
        return (
            df.where(F.col("status") == "committed").select("chunk_id").distinct()
        )

    def read_chunks(self) -> DataFrame:
        if self.table_format == "snapshot":
            paths = self._snapshot_paths("chunks")
            if not paths:
                raise FileNotFoundError(f"no snapshot in {self.path}")
            return self.spark.read.parquet(*paths)
        return self.spark.read.parquet(self.chunks_path)

    def read_lineage(self) -> DataFrame:
        if self.table_format == "snapshot":
            paths = self._snapshot_paths("lineage")
            if not paths:
                raise FileNotFoundError(f"no snapshot in {self.path}")
            return self.spark.read.parquet(*paths)
        return self.spark.read.parquet(self.lineage_path)

    # -- writes --------------------------------------------------------------

    def commit(self, chunks_df: DataFrame, run_id: str | None = None) -> None:
        """Write chunk payloads, then their lineage rows.

        parquet mode: payloads land first, lineage marks them committed
        second — a crash between the two leaves orphan payload files that a
        resumed run simply rewrites (same deterministic bytes), never a
        committed chunk without its payload.

        snapshot mode: both land in a fresh invisible directory; one atomic
        manifest link makes them visible together (or not at all).
        """
        run_id = run_id or f"run-{int(time.time() * 1000)}"
        lineage = (
            chunks_df.drop("payload", "bloom")
            .withColumn("run_id", F.lit(run_id))
            .withColumn("status", F.lit("committed"))
            .withColumn("committed_at", F.current_timestamp())
        )
        if self.table_format == "snapshot":
            commit_dir = uuid.uuid4().hex
            base = os.path.join(self.data_path, commit_dir)
            chunks_df.write.mode("errorifexists").parquet(os.path.join(base, "chunks"))
            lineage.write.mode("errorifexists").parquet(os.path.join(base, "lineage"))
            self._publish_snapshot(commit_dir, commit_dir, run_id)
            return
        chunks_df.write.mode("append").parquet(self.chunks_path)
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

    When the store was encoded with ``bloom_columns=["doc_id"]``, candidate
    chunks whose Bloom filter admits NONE of the requested ids are dropped
    before any payload decodes — absent keys (the dominant probe case) then
    read zero payload bytes.
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
    hits = _bloom_prune(hits, doc_ids)
    return decode_job.decode_chunks(hits).where(F.col("doc_id").isin(doc_ids))


def _bloom_prune(hits: DataFrame, doc_ids: list[str]) -> DataFrame:
    """Drop candidate chunks whose doc_id Bloom filter admits NONE of the
    requested ids. No-op for stores without the bloom column; chunks with a
    NULL bloom are always kept."""
    if "bloom" not in hits.columns:
        return hits
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    from . import bloom as bloom_mod

    key_hs = [bloom_mod.key_hashes(d) for d in doc_ids]

    @F.pandas_udf(BooleanType())
    def _any_key_hits(bm):
        return pd.Series(
            [
                b is None
                or any(
                    bloom_mod.might_contain(bytes(b), h1, h2)
                    for h1, h2 in key_hs
                )
                for b in bm
            ]
        )

    misses = (
        hits.where((F.col("column") == "doc_id") & F.col("bloom").isNotNull())
        .where(~_any_key_hits(F.col("bloom")))
        .select("chunk_id")
    )
    return hits.join(F.broadcast(misses), "chunk_id", "left_anti")


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
