"""Resumable distributed export to ENGINE-WRITTEN parquet files.

The chunk store already satisfies the checkpoint-resume contract
(``lineage.encode_with_resume``: a killed job re-runs without re-encoding
finished chunks); this module applies the same contract to the PARQUET
sink. Units are the deterministic buckets the encode planner uses
(``skew.plan_buckets`` — same chunk_id grammar, same skew handling), each
unit writes exactly ONE parquet file whose name is a digest of its
chunk_id, writes go through tmp + atomic rename (a task killed mid-write
never leaves a truncated committed file, and speculative twin attempts
write byte-identical content to unique tmps before racing the idempotent
rename), and a re-run anti-joins the already-committed file list BEFORE
the shuffle — finished units are never re-encoded, re-shuffled, or even
re-read past the scan.

Reference: the FileSink/write_table half of ``src/file/writer.rs``;
resumability is this engine's north-rule addition (the reference has no
job layer to resume).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import skew

_MANIFEST_SCHEMA = "chunk_id string, path string, rows long, resumed boolean"


def _auto_cols_fn(expected: dict):
    """Default column-spec builder from the DataFrame's OWN schema: int32/
    int64/float/double/boolean/string map to the writer's aliases with the
    AUTO selector. NULLs are supported in string columns (validity mask);
    a NULL in a numeric column surfaces in pandas as a dtype change
    (int64 -> float64) and raises here with instructions — numeric-null
    tables need an explicit ``cols_fn`` that builds validity masks, the
    same contract the export gates use."""
    kind = {
        "int": ("int32", np.int32),
        "bigint": ("int64", np.int64),
        "float": ("float32", np.float32),
        "double": ("float64", np.float64),
        "boolean": ("bool", np.bool_),
        "string": ("utf8", None),
    }

    def cols_fn(pdf, parquet_out):
        cols = []
        for name, spark_t in expected.items():
            s = pdf[name]
            if spark_t.startswith("array<") and spark_t[6:-1] in kind:
                # list column (e.g. the flagship tokens array<int>):
                # null rows allowed; null ELEMENTS need a custom cols_fn
                elem_alias, elem_t = kind[spark_t[6:-1]]
                if elem_alias == "utf8":
                    raise ValueError(
                        f"export_parquet default spec cannot write "
                        f"{name}: {spark_t} — pass cols_fn"
                    )
                valid = s.notna().to_numpy()
                seqs = [np.asarray(x) for x in s if x is not None]
                dense = (
                    np.concatenate(seqs) if seqs else np.empty(0, elem_t)
                )
                if not np.issubdtype(dense.dtype, np.number) and \
                        dense.dtype != np.bool_:
                    raise ValueError(
                        f"export_parquet: list column {name} carries "
                        "null elements — pass cols_fn building an "
                        "explicit element validity mask"
                    )
                # offsets span EVERY row (null rows = zero entries — the
                # writer's null-list contract)
                offsets = np.concatenate(
                    ([0],
                     np.cumsum([0 if x is None else len(x) for x in s]))
                ).astype(np.int64)
                cols.append(
                    (name, f"list<{elem_alias}>", "AUTO",
                     (offsets, dense.astype(elem_t), None),
                     None if valid.all() else valid)
                )
                continue
            if spark_t not in kind:
                raise ValueError(
                    f"export_parquet default spec cannot write {name}: "
                    f"{spark_t} — pass cols_fn for this table"
                )
            alias, np_t = kind[spark_t]
            if alias == "utf8":
                valid = s.notna().to_numpy()
                dense = parquet_out.flat_strings(
                    [x for x in s if x is not None]
                )
                cols.append(
                    (name, "utf8", "AUTO", dense,
                     None if valid.all() else valid)
                )
                continue
            if s.dtype != np_t:
                raise ValueError(
                    f"export_parquet: column {name} arrived as {s.dtype} "
                    f"instead of {np_t.__name__} — it carries NULLs "
                    "(Spark widens nullable numerics in pandas); pass "
                    "cols_fn building an explicit validity mask"
                )
            cols.append((name, alias, "AUTO", s.to_numpy(np_t), None))
        return cols

    return cols_fn


def export_parquet(
    df: DataFrame,
    out_dir: str,
    cols_fn=None,
    bucket_key: str = "source",
    salt_col: str = "doc_id",
    rows_per_bucket: int = skew.DEFAULT_ROWS_PER_BUCKET,
    sort_col: str | None = None,
    resume: bool = True,
    chunk_suffix: str | None = None,
    **write_kwargs,
) -> DataFrame:
    """Write ``df`` as a directory of engine-made parquet files, one per
    deterministic bucket, resumable after a kill.

    ``cols_fn(pdf, parquet_out) -> columns spec`` customizes the writer
    input (same contract as :func:`engine.parquet_out.write_table`);
    default derives the spec from the DataFrame schema. ``sort_col``
    orders rows inside each file (defaults to ``salt_col`` — file bytes
    must be deterministic so retried attempts commit identical content).
    Extra ``write_kwargs`` flow to ``write_table`` (codec,
    page_size_rows, data_page_version, sorting_columns, ...).

    Returns the manifest DataFrame ``(chunk_id, path, rows, resumed)`` —
    one row per unit; ``resumed`` rows were committed by a previous run
    and carry NULL ``rows`` (their payloads were never re-read). Resume
    is unit-granular over the SAME logical input: re-running with the
    same df skips everything already committed; a third run writes 0.
    ``chunk_suffix`` scopes unit ids to a window/micro-batch (the
    streaming sink passes the batch id) so incremental appends CLOSE
    their units instead of colliding with committed ones."""
    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    if "_fname" in df.columns:
        raise ValueError("input column _fname collides with export metadata")
    expected = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
    }
    fn = cols_fn or _auto_cols_fn(expected)
    planned = skew.plan_buckets(
        df, key=bucket_key, salt_col=salt_col,
        rows_per_bucket=rows_per_bucket, chunk_suffix=chunk_suffix,
    ).withColumn(
        "_fname",
        F.concat(
            F.lit("part-"),
            F.substring(F.sha2(F.col("chunk_id"), 256), 1, 32),
            F.lit(".parquet"),
        ),
    )
    for f in os.listdir(out_dir):
        # a tmp present BEFORE the job starts belongs to a dead attempt
        # (live tmps only exist while tasks run) — sweep it; the leading
        # underscore also keeps Hadoop/Spark readers from ever seeing one
        if f.startswith("_tmp-"):
            os.remove(os.path.join(out_dir, f))
    existing = sorted(
        f for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    todo = planned
    if resume and existing:
        ex_df = spark.createDataFrame([(f,) for f in existing],
                                      "_fname string")
        # committed units drop BEFORE the shuffle (broadcast anti-join —
        # the encode_with_resume shape): a resumed run never re-encodes,
        # re-shuffles, or carries finished units past the scan
        todo = planned.join(F.broadcast(ex_df), "_fname", "left_anti")
    meta = set(skew.BUCKET_META_COLS) | {"chunk_id", "_fname"}
    order = sort_col or salt_col
    out_cols = [c for c in df.columns]

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        from engine import parquet_out

        chunk_id = pdf["chunk_id"].iloc[0]
        name = pdf["_fname"].iloc[0]
        # deterministic bytes: a speculative/retried attempt must commit
        # IDENTICAL content under the same final name
        pdf = pdf.sort_values(order, kind="mergesort")
        data = pdf[[c for c in pdf.columns if c not in meta]]
        data = data[out_cols]
        path = os.path.join(out_dir, name)
        tmp = os.path.join(out_dir, f"_tmp-{uuid.uuid4().hex}-{name}")
        info = parquet_out.write_table(tmp, fn(data, parquet_out),
                                       **write_kwargs)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"chunk_id": [chunk_id], "path": [path],
             "rows": [info["rows"]], "resumed": [False]}
        )

    written = todo.groupBy("chunk_id").applyInPandas(
        lambda _key, pdf: write_one(pdf), _MANIFEST_SCHEMA
    )
    if resume and existing:
        done = (
            planned.select("chunk_id", "_fname").distinct()
            .join(F.broadcast(ex_df), "_fname")
            .select(
                "chunk_id",
                F.concat(F.lit(out_dir.rstrip("/") + "/"),
                         F.col("_fname")).alias("path"),
                F.lit(None).cast("long").alias("rows"),
                F.lit(True).alias("resumed"),
            )
        )
        return written.unionByName(done)
    return written
