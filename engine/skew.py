"""Skew-defusing deterministic bucketing.

The input corpus is skewed by ``source`` (FIXTURES.md F1: weights
0.55/0.2/0.12/0.08/0.05). Encoding wants *source-homogeneous* chunks (dict,
FSST and delta all compress better within one source's distribution), but
hash-partitioning by ``source`` alone would put 55% of 10^12 sequences on one
task. We salt: each source gets a number of buckets proportional to its row
count, and rows route to ``(source, salt)`` with
``salt = pmod(xxhash64(doc_id), buckets(source))``.

Properties that matter at 10^12 scale:
- bucket assignment is a pure function of (doc_id, source, bucket plan) —
  re-running a killed job reproduces identical chunks (checkpoint/resume
  anti-joins on chunk_id);
- the bucket count map is tiny (one row per source) and ships as a broadcast
  join, never a driver-side collect of data rows (only of the per-source
  aggregate, which is O(#sources));
- chunk size is bounded by ``rows_per_bucket`` regardless of key skew, so
  executor memory use is flat at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_ROWS_PER_BUCKET = 65_536


def plan_buckets(
    df: DataFrame,
    key: str = "source",
    salt_col: str = "doc_id",
    rows_per_bucket: int = DEFAULT_ROWS_PER_BUCKET,
    chunk_suffix: str | None = None,
) -> DataFrame:
    """Add deterministic ``chunk_id`` = ``{key}#{salt}[#{suffix}]`` to ``df``.

    One small aggregation computes per-key counts; the per-key bucket counts
    come back as a broadcast join (never a data-row collect).
    ``chunk_suffix`` scopes buckets to a window/micro-batch so incremental
    ingest closes buckets instead of appending into committed ones.
    """
    counts = df.groupBy(key).agg(F.count("*").alias("_rows"))
    buckets = counts.select(
        F.col(key),
        F.greatest(
            F.lit(1), F.ceil(F.col("_rows") / F.lit(rows_per_bucket))
        ).cast("int").alias("_n_buckets"),
    )
    out = df.join(F.broadcast(buckets), key, "left")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.col("_n_buckets")).cast("int")
    parts = [F.col(key), F.lpad(salt.cast("string"), 5, "0")]
    if chunk_suffix:
        parts.append(F.lit(chunk_suffix))
    return out.withColumn("chunk_id", F.concat_ws("#", *parts)).drop("_n_buckets")
