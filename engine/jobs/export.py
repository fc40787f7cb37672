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

NULL faithfulness across the pandas hop: Arrow's arrow->pandas
conversion (the one ``applyInPandas`` uses) turns a NULL in a numeric
column into NaN — int64 silently widens to float64, and a double NULL
becomes indistinguishable from a NaN VALUE. The default column spec
therefore ships Spark-side validity companions (``F.isnotnull`` columns
computed BEFORE the hop, the same pattern the encode job uses), so
scalar NULLs of every type round-trip as real parquet nulls, and list
columns get per-ELEMENT companions (``F.transform`` isNotNull arrays),
so element NULLs round-trip too — including float lists, where a
post-hop NaN would otherwise be ambiguous between element NULL and a
genuine NaN value.

Reference: the FileSink/write_table half of ``src/file/writer.rs``;
resumability is this engine's north-rule addition (the reference has no
job layer to resume).
"""

from __future__ import annotations

import os
import re
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import skew

_MANIFEST_SCHEMA = "chunk_id string, path string, rows long, resumed boolean"

_KINDS = {
    "int": ("int32", np.int32),
    "bigint": ("int64", np.int64),
    "float": ("float32", np.float32),
    "double": ("float64", np.float64),
    "boolean": ("bool", np.bool_),
    "string": ("utf8", None),
}


def _auto_cols_fn(expected: dict, with_evalid: frozenset = frozenset()):
    """Default column-spec builder from the DataFrame's OWN schema:
    int/bigint/float/double/boolean/string plus array<numeric> map to
    the writer's aliases with the AUTO selector. Scalar NULLs restore
    from the ``__valid_*`` companions export_parquet computes Spark-side
    (values at null slots may hold anything — the writer's contract);
    string NULLs survive the hop as None directly; list-element NULLs
    restore from the ``__evalid_*`` per-element companions."""

    def cols_fn(pdf, parquet_out):
        cols = []
        for name, spark_t in expected.items():
            s = pdf[name]
            if spark_t.startswith("array<") and spark_t[6:-1] in _KINDS:
                elem_alias, elem_t = _KINDS[spark_t[6:-1]]
                if elem_alias == "utf8":
                    raise ValueError(
                        f"export_parquet default spec cannot write "
                        f"{name}: {spark_t} — pass cols_fn"
                    )
                valid = s.notna().to_numpy()
                if name in with_evalid:
                    # element validity rides the Spark-side __evalid_
                    # companion (F.transform isNotNull arrays, computed
                    # BEFORE the hop) — a null int element otherwise
                    # arrives as NaN in a float64 array and astype would
                    # stamp garbage, while a null float element would
                    # conflate with a genuine NaN value
                    ev = pdf[f"__evalid_{name}"]
                    masks = [
                        np.asarray(m, bool) for m in ev if m is not None
                    ]
                    elem_valid = (
                        np.concatenate(masks) if masks
                        else np.empty(0, bool)
                    )
                    parts = [
                        np.asarray(x)[m]
                        for x, m in zip(
                            (x for x in s if x is not None), masks
                        )
                    ]
                else:
                    # schema declared containsNull=false: no companion
                    # was shipped, every entry is valid
                    elem_valid = np.empty(0, bool)  # .all() -> None below
                    parts = [np.asarray(x) for x in s if x is not None]
                dense = (
                    np.concatenate(parts) if parts
                    else np.empty(0, elem_t)
                )
                if (
                    elem_t == np.int64
                    and np.issubdtype(dense.dtype, np.floating)
                    and (np.abs(dense) >= float(2**53)).any()
                ):
                    raise ValueError(
                        f"export_parquet: list column {name} mixes "
                        "null elements with values at or beyond 2^53 — "
                        "the pandas hop widened it to float64 and lost "
                        "exactness; pass cols_fn"
                    )
                # offsets span EVERY row (null rows = zero entries — the
                # writer's null-list contract)
                offsets = np.concatenate(
                    ([0],
                     np.cumsum([0 if x is None else len(x) for x in s]))
                ).astype(np.int64)
                cols.append(
                    (name, f"list<{elem_alias}>", "AUTO",
                     (offsets, dense.astype(elem_t),
                      None if elem_valid.all() else elem_valid),
                     None if valid.all() else valid)
                )
                continue
            if spark_t not in _KINDS:
                raise ValueError(
                    f"export_parquet default spec cannot write {name}: "
                    f"{spark_t} — pass cols_fn for this table"
                )
            alias, np_t = _KINDS[spark_t]
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
            # scalar numerics/bools: the Spark-side companion is the
            # truth about NULLs — the value column may have widened to
            # float64 (int NULLs) or hide NULL inside NaN (doubles)
            valid = pdf[f"__valid_{name}"].to_numpy(bool)
            if (
                np_t == np.int64
                and np.issubdtype(s.dtype, np.floating)
            ):
                # widened bigint: float64 holds ints exactly only below
                # 2^53 — beyond that the value was ALREADY corrupted by
                # the hop and no cast can recover it (r7 review pass 7
                # #1; int32 always fits exactly). >= because corrupted
                # values ROUND ONTO the 2^53 boundary (2^53+1 -> 2^53),
                # so the boundary itself is unprovable-exact
                big = np.abs(s.to_numpy()[valid]) >= float(2**53)
                if big.any():
                    raise ValueError(
                        f"export_parquet: bigint column {name} mixes "
                        "NULLs with values beyond 2^53 — the pandas hop "
                        "widened it to float64 and lost exactness; pass "
                        "cols_fn (e.g. split validity Spark-side and "
                        "keep the values column non-null)"
                    )
            if valid.all():
                if s.dtype != np_t:
                    vals = s.to_numpy().astype(np_t)
                else:
                    vals = s.to_numpy(np_t)
                cols.append((name, alias, "AUTO", vals, None))
                continue
            full = np.zeros(len(s), np_t)
            full[valid] = s.to_numpy()[valid].astype(np_t)
            cols.append((name, alias, "AUTO", full, valid))
        return cols

    return cols_fn


def export_parquet(
    df: DataFrame,
    out_dir: str,
    cols_fn=None,
    bucket_key: str | None = "source",
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
    default derives the spec from the DataFrame schema, NULL-faithfully
    for every scalar type (see module docstring). ``sort_col`` leads the
    in-file row order (defaults to ``salt_col``); remaining scalar
    columns, validity companions, and byte-serialized numeric-list keys
    tie-break so retried attempts commit byte-identical files even
    under duplicate sort keys (rows distinguishable only by a
    non-numeric list under a custom cols_fn are the remaining
    caveat — give such tables a unique ``sort_col``). Extra ``write_kwargs`` flow to
    ``write_table`` (codec, page_size_rows, data_page_version, ...).

    Returns the manifest as an INERT (pre-materialized) DataFrame
    ``(chunk_id, path, rows, resumed)`` — one row per unit, safe to act
    on any number of times; the export itself runs exactly once, inside
    this call. ``resumed`` rows were committed by a previous run and
    carry NULL ``rows`` (their payloads were never re-read — the
    resumed-unit list is enumerated from the per-key bucket counts, not
    a second data scan).

    ``chunk_suffix`` scopes unit ids AND file names to a window/
    micro-batch (the streaming sink passes the batch id): resume listing
    and the dead-tmp sweep then consider only this suffix's files, so a
    long-lived stream's cost per batch stays bounded by the batch, and
    concurrent exports into one directory are safe as long as their
    suffixes differ (suffix-less concurrent exports into one directory
    are NOT supported — the tmp sweep assumes it owns the directory)."""
    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    clash = {c for c in df.columns
             if c in ("_fname", "__all")
             or c.startswith(("__valid_", "__evalid_"))}
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with export metadata"
        )
    expected = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
    }
    out_cols = list(df.columns)
    if bucket_key is None:
        # no natural key: uniform salted buckets over ONE logical key —
        # unit count = ceil(rows / rows_per_bucket), skew-free by salt
        bucket_key = "__all"
        df = df.withColumn("__all", F.lit("all"))
    elif df.where(F.col(bucket_key).isNull()).limit(1).count():
        # plan_buckets' broadcast join misses NULL keys (they collapse
        # into one unsalted degenerate unit) and the resumed-unit
        # enumeration could not reproduce its id (r7 review pass 7 #2)
        raise ValueError(
            f"export_parquet: bucket_key {bucket_key!r} contains NULLs "
            "— coalesce the key first (e.g. F.coalesce(col, lit('?'))) "
            "or use bucket_key=None for uniform buckets"
        )
    companions = []
    list_companions = []
    if cols_fn is None:
        # Spark-side validity companions: computed BEFORE the pandas hop,
        # where NULL is still distinguishable from NaN / dtype widening —
        # scalar isnotnull flags plus per-ELEMENT isnotnull arrays for
        # numeric/bool list columns
        companions = [
            n for n, t in expected.items()
            if t in _KINDS and _KINDS[t][0] != "utf8"
        ]
        for n in companions:
            df = df.withColumn(f"__valid_{n}", F.col(n).isNotNull())
        # only arrays whose schema ADMITS null elements ship a companion
        # (containsNull=false lists — e.g. the flagship tokens column —
        # would pay a same-shape boolean array per row for nothing)
        nullable_elems = {
            f.name for f in df.schema.fields
            if f.dataType.simpleString().startswith("array<")
            and getattr(f.dataType, "containsNull", True)
        }
        list_companions = [
            n for n, t in expected.items()
            if t.startswith("array<") and t[6:-1] in _KINDS
            and _KINDS[t[6:-1]][0] != "utf8" and n in nullable_elems
        ]
        for n in list_companions:
            df = df.withColumn(
                f"__evalid_{n}",
                F.transform(F.col(n), lambda x: x.isNotNull()),
            )
    fn = cols_fn or _auto_cols_fn(expected, frozenset(list_companions))
    prefix = f"part-{chunk_suffix}-" if chunk_suffix else "part-"

    def _fname_expr():
        return F.concat(
            F.lit(prefix),
            F.substring(F.sha2(F.col("chunk_id"), 256), 1, 32),
            F.lit(".parquet"),
        )

    # this run's OWN file-name shape, exactly: a suffix-less run owns
    # part-<32 hex>.parquet and nothing else, so it neither sweeps a
    # concurrent suffixed stream's live tmps nor lists that stream's
    # committed files as resume candidates (r7 review pass 7 #5)
    own = re.compile(re.escape(prefix) + r"[0-9a-f]{32}\.parquet$")
    for f in os.listdir(out_dir):
        # a tmp present BEFORE the job starts belongs to a dead attempt
        # (live tmps only exist while tasks run) — sweep it; the leading
        # underscore also keeps Hadoop/Spark readers from ever seeing one
        if f.startswith("_tmp-") and own.search(f):
            os.remove(os.path.join(out_dir, f))
    existing = sorted(
        f for f in os.listdir(out_dir) if own.fullmatch(f)
    )
    planned = skew.plan_buckets(
        df, key=bucket_key, salt_col=salt_col,
        rows_per_bucket=rows_per_bucket, chunk_suffix=chunk_suffix,
    ).withColumn("_fname", _fname_expr())
    todo = planned
    ex_df = None
    if resume and existing:
        ex_df = spark.createDataFrame([(f,) for f in existing],
                                      "_fname string")
        # committed units drop BEFORE the shuffle (broadcast anti-join —
        # the encode_with_resume shape): a resumed run never re-encodes,
        # re-shuffles, or carries finished units past the scan
        todo = planned.join(F.broadcast(ex_df), "_fname", "left_anti")
    order = sort_col or salt_col
    # byte determinism: tie-break by EVERY remaining sortable column,
    # including the validity companions (a NULL and a NaN double arrive
    # as identical NaN values — only the companion separates them; r7
    # review pass 7 #4) and non-_KINDS scalars under a custom cols_fn;
    # numeric list columns tie-break through derived byte keys built in
    # write_one (values + element companions — r7 review pass 8 #1)
    scalar_cols = [
        c for c in out_cols
        if c != order
        and not expected[c].startswith(("array<", "map<", "struct<"))
    ] + [f"__valid_{n}" for n in companions]
    # tie-break serialization dtype per numeric list column: integer lists
    # keep their NATIVE int64 width — routing them through float64 would
    # collapse distinct array<bigint> values at/above 2^53 under duplicate
    # leading keys, letting retried attempts commit non-byte-identical
    # files (r7 ADVICE #4); floats keep float64 (NaN payloads normalize)
    list_sort_dt = {
        n: (np.int64 if _KINDS[t[6:-1]][1] in (np.int32, np.int64)
            else np.float64)
        for n, t in expected.items()
        if t.startswith("array<") and t[6:-1] in _KINDS
        and _KINDS[t[6:-1]][0] != "utf8"
    }
    list_cols = list(list_sort_dt)

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        from engine import parquet_out

        chunk_id = pdf["chunk_id"].iloc[0]
        name = pdf["_fname"].iloc[0]
        # deterministic bytes: a speculative/retried attempt must commit
        # IDENTICAL content under the same final name — sort by the
        # leading key, tie-broken by every remaining scalar column and
        # byte-serialized numeric-list keys (each list normalizes to ONE
        # dtype per column — int64 for integer elements, float64 for float
        # elements — so per-cell dtype widening cannot split equal lists
        # and bigint values at/above 2^53 stay distinct)
        extra = {}
        for n in list_cols:
            dt = list_sort_dt[n]
            extra[f"__lsort_{n}"] = [
                None if x is None else np.asarray(x, dt).tobytes()
                for x in pdf[n]
            ]
        for n in list_companions:
            extra[f"__evsort_{n}"] = [
                None if m is None
                else np.packbits(np.asarray(m, bool)).tobytes()
                for m in pdf[f"__evalid_{n}"]
            ]
        if extra:
            pdf = pdf.assign(**extra)
        pdf = pdf.sort_values(
            [order, *scalar_cols, *extra], kind="mergesort"
        )
        data = pdf[[*out_cols,
                    *(f"__valid_{n}" for n in companions),
                    *(f"__evalid_{n}" for n in list_companions)]]
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
    # materialize NOW: the export must run exactly once, not once per
    # caller action on a lazy plan
    rows = [tuple(r) for r in written.collect()]
    if resume and existing:
        # resumed-unit manifest WITHOUT re-scanning data rows: per-key
        # counts -> bucket_n -> every (key, salt) chunk_id, joined with
        # the committed file list (counts is a column-pruned aggregate;
        # bucket sizing shares skew.bucket_counts with plan_buckets)
        suffix = (
            F.lit(chunk_suffix) if chunk_suffix
            else F.lit(None).cast("string")
        )
        units = (
            skew.bucket_counts(df, bucket_key, rows_per_bucket)
            .select(
                F.col(bucket_key),
                F.explode(
                    F.sequence(F.lit(0), F.col("bucket_n") - 1)
                ).alias("_salt"),
            )
            .select(
                skew.chunk_id_expr(
                    F.col(bucket_key), F.col("_salt"), suffix
                ).alias("chunk_id")
            )
            .withColumn("_fname", _fname_expr())
            .join(F.broadcast(ex_df), "_fname")
            .select(
                "chunk_id",
                F.concat(F.lit(out_dir.rstrip("/") + "/"),
                         F.col("_fname")).alias("path"),
            )
        )
        rows += [(r["chunk_id"], r["path"], None, True)
                 for r in units.collect()]
    return spark.createDataFrame(rows, _MANIFEST_SCHEMA)
