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

# metadata columns added by plan_buckets and carried into chunk/lineage rows
# (consumers read these instead of re-parsing chunk_id — a key containing the
# '#' delimiter must not corrupt bucket recovery)
BUCKET_META_COLS = ("bucket_key", "bucket_salt", "bucket_n", "bucket_suffix")


def _escape_key(col):
    """chunk_id-safe key: escape '%' then '#' so the id segments stay
    unambiguous for any key value (ids are opaque to consumers, but two
    distinct (key, salt) pairs must never collide on one chunk_id)."""
    return F.regexp_replace(
        F.regexp_replace(col.cast("string"), "%", "%25"), "#", "%23"
    )


def chunk_id_expr(key_col, salt_col, suffix_col):
    """The ONE way a chunk_id is built: ``esc(key)#{salt:010d}[#suffix]``.
    Shared by the encode planner and lineage point-lookup recomputation so
    the two can never drift. Width 10 covers every int32 salt (bucket_n is
    int32, so salts < 2^31 < 10^10) — F.lpad TRUNCATES overlong input, so a
    too-small width would silently collide distinct buckets at scale."""
    return _chunk_id_from_escaped(_escape_key(key_col), salt_col, suffix_col)


def _chunk_id_from_escaped(esc_key_col, salt_col, suffix_col):
    """chunk_id from an ALREADY-ESCAPED key column — the bucket planner
    escapes once per distinct key in the tiny broadcast side instead of
    running two regexp_replace over every data row (r8: the per-row escape
    was ~half the bucket-planning stage's expression cost)."""
    base = F.concat_ws(
        "#", esc_key_col, F.lpad(salt_col.cast("string"), 10, "0")
    )
    return F.when(
        suffix_col.isNotNull(), F.concat_ws("#", base, suffix_col)
    ).otherwise(base)


def bucket_counts(df: DataFrame, key: str, rows_per_bucket: int) -> DataFrame:
    """Per-key bucket counts ``(key, bucket_n)`` — the ONE copy of the
    sizing formula, shared by :func:`plan_buckets` and the export job's
    resumed-unit enumeration so the two can never drift."""
    counts = df.groupBy(key).agg(F.count("*").alias("_rows"))
    return counts.select(
        F.col(key),
        F.greatest(
            F.lit(1), F.ceil(F.col("_rows") / F.lit(rows_per_bucket))
        ).cast("int").alias("bucket_n"),
    )


def plan_buckets(
    df: DataFrame,
    key: str = "source",
    salt_col: str = "doc_id",
    rows_per_bucket: int = DEFAULT_ROWS_PER_BUCKET,
    chunk_suffix: str | None = None,
) -> DataFrame:
    """Add deterministic ``chunk_id`` plus bucket metadata columns
    (``bucket_key``, ``bucket_salt``, ``bucket_n``, ``bucket_suffix``) to
    ``df``. The metadata rides into chunk/lineage rows so point lookups can
    recompute bucket assignment exactly — never inferred from observed salts
    (an empty highest-salt bucket would corrupt a max(salt)+1 guess).

    One small aggregation computes per-key counts; the per-key bucket counts
    come back as a broadcast join (never a data-row collect).
    ``chunk_suffix`` scopes buckets to a window/micro-batch so incremental
    ingest closes buckets instead of appending into committed ones.
    """
    reserved = set(BUCKET_META_COLS) | {"chunk_id", "_key_str", "_esc_key"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with reserved bucket "
            "metadata names; rename them before encoding"
        )
    # the key's string form AND its chunk_id escaping are computed ONCE PER
    # KEY on the broadcast side (one row per source), not via per-row
    # regexp_replace over the data. bucket_key deliberately comes from the
    # SAME broadcast-side representative as the escaped key, so the
    # chunk_id and the bucket_key metadata can never drift (a per-row cast
    # could differ from the groupBy representative for float keys where
    # -0.0 and 0.0 collapse into one group — lineage recomputes chunk_id
    # FROM bucket_key, so they must share one source of truth).
    buckets = (
        bucket_counts(df, key, rows_per_bucket)
        .withColumn("_key_str", F.col(key).cast("string"))
        .withColumn("_esc_key", _escape_key(F.col(key)))
    )
    out = df.join(F.broadcast(buckets), key, "left")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.col("bucket_n")).cast("int")
    suffix = F.lit(chunk_suffix) if chunk_suffix else F.lit(None).cast("string")
    return (
        out.withColumn("bucket_key", F.col("_key_str"))
        .withColumn("bucket_salt", salt)
        .withColumn("bucket_suffix", suffix)
        .withColumn(
            "chunk_id",
            _chunk_id_from_escaped(
                F.col("_esc_key"), F.col("bucket_salt"), F.col("bucket_suffix")
            ),
        )
        .drop("_esc_key", "_key_str")
    )
