"""Debug CLI: the engine's equivalent of the reference's ``parquet-read``
(print N records, ``src/bin/parquet-read.rs:30-94``) and ``parquet-schema``
(print schema + metadata, ``src/bin/parquet-schema.rs``) binaries, pointed at
a chunk store.

Usage::

    python -m engine.cli read   <store_dir> [num_records]
    python -m engine.cli schema <store_dir>
    python -m engine.cli chunks <store_dir>      # per-chunk lineage/metrics
    python -m engine.cli lookup <store_dir> <doc_id> [doc_id ...]  # point lookup
    python -m engine.cli read-parquet   <path> [n] [col:lo:hi | col:in:v1,v2 | col:isnull|notnull]
                                                 # optional predicate runs the
                                                 # PageIndex-pruned engine read
    python -m engine.cli schema-parquet <path>
    python -m engine.cli index-parquet  <path>   # PageIndex: per-page bounds
    python -m engine.cli compact-parquet <out_dir> <file> [file ...]
                                                 # bin-pack row groups into
                                                 # merged files (byte-verbatim)
    python -m engine.cli compact-store  <store_dir>  # snapshot-store rewrite
    python -m engine.cli export-parquet <in_path> <out_dir> [bucket_key [salt_col]]
                                                 # re-encode any parquet dataset
                                                 # through the engine writer,
                                                 # RESUMABLE (re-run to finish)
"""

from __future__ import annotations

import struct
import sys


def _spark():
    from engine.session import get_spark, ship_package

    spark = get_spark(app="engine-cli", master="local[4]", shuffle_partitions=8)
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def read_df(store):
    """Decoded records of a chunk store — the DataFrame behind ``read``
    (kept separate so the driver's oracle gate can hash it; the command
    only adds ``show``)."""
    from engine.jobs import decode as decode_job

    return decode_job.decode_chunks(store.read_chunks())


def cmd_read(store_dir: str, n: int = 10) -> None:
    from engine.lineage import ChunkStore

    spark = _spark()
    read_df(ChunkStore(spark, store_dir)).show(n, truncate=80)


def cmd_schema(store_dir: str) -> None:
    from engine.jobs import decode as decode_job
    from engine.lineage import ChunkStore

    spark = _spark()
    store = ChunkStore(spark, store_dir)
    print("== decoded schema")
    decode_job.decode_chunks(store.read_chunks()).printSchema()
    print("== chunk store schema")
    store.read_chunks().printSchema()


def cmd_chunks(store_dir: str) -> None:
    from engine.lineage import ChunkStore

    spark = _spark()
    chunks_df(ChunkStore(spark, store_dir)).show(100, truncate=False)


def chunks_df(store):
    """Per-(column, codec) lineage metrics — the DataFrame behind
    ``chunks``."""
    from pyspark.sql import functions as F

    return (
        store.read_lineage()
        .groupBy("column", "codec")
        .agg(
            F.count("*").alias("chunks"),
            F.sum("n_values").alias("values"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
            F.round(F.sum("enc_bytes") / F.sum("raw_bytes"), 4).alias("ratio"),
        )
        .orderBy("column", "codec")
    )


def cmd_lookup(store_dir: str, doc_ids: list[str]) -> None:
    """Point lookup by doc_id: decodes only candidate chunks (bucket-plan
    recomputation + Bloom pruning when the store carries filters)."""
    from engine.lineage import ChunkStore, lookup_docs

    spark = _spark()
    store = ChunkStore(spark, store_dir)
    lookup_docs(store, doc_ids).show(len(doc_ids) + 1, truncate=80)


def _leaf_columns(pc, path: str) -> list:
    """Leaf paths of one file — the pruned read's projection universe
    (list leaves re-assemble from the selected pages; predicates stay on
    flat columns)."""
    seen = []
    for c in pc.read_file_info(path).columns:
        if c.path not in seen:
            seen.append(c.path)
    return seen


def cmd_read_parquet(path: str, n: int = 10, where: str | None = None) -> None:
    """Print records of a plain parquet file/dataset — the literal
    ``parquet-read`` UX (``src/bin/parquet-read.rs:30-94``) for users coming
    from the reference with existing parquet data. ``where`` pushes a
    filter through the ENGINE's PageIndex-pruned reader (no Spark
    session needed): ``col:lo:hi`` for a range, ``col:>=:v`` (or
    ``> <= < ==``) for a one-sided comparison, ``col:in:v1,v2,...``
    for membership, or ``col:isnull`` / ``col:notnull``; numeric bounds
    auto-detect, anything else compares as a string. Prints how many
    pages the predicate skipped."""
    if where is not None:
        import os as _os

        from engine import parquet_compat as pc

        if _os.path.isdir(path):
            raise SystemExit(
                "the predicate form reads ONE parquet file (engine "
                "reader); point it at a file, or drop the predicate to "
                "read the dataset through Spark"
            )
        parts = where.split(":")
        null_form = len(parts) == 2 and parts[1] in ("isnull", "notnull")
        if len(parts) > 2 and parts[1] in ("isnull", "notnull"):
            # would otherwise silently parse as the string range
            # lo='isnull' and print a convincing 0-row answer
            raise SystemExit(
                f"predicate {where!r}: {parts[1]} takes no value — "
                f"write {parts[0]}:{parts[1]}"
            )
        cmp_form = len(parts) == 3 and parts[1] in (">=", ">", "<=", "<",
                                                    "==")
        if not null_form and len(parts) != 3 and not (
            len(parts) > 3 and parts[1] == "in"
        ):
            raise SystemExit(
                f"predicate wants col:lo:hi, col:in:v1,v2 or "
                f"col:isnull|notnull (got {where!r}); values containing "
                "':' are not expressible in this shorthand — use "
                "read_table_pruned directly"
            )
        col, a = parts[0], parts[1]
        b = None if null_form else (
            ":".join(parts[2:]) if a == "in" else parts[2]
        )

        def _typed(x: str):
            try:
                return int(x)
            except ValueError:
                try:
                    return float(x)
                except ValueError:
                    return x

        def _mk(cast):
            if null_form:
                return (col, a, None)
            if cmp_form:
                return (col, a, cast(b))
            return (
                (col, "in", [cast(v) for v in b.split(",")])
                if a == "in"
                else (col, cast(a), cast(b))
            )

        try:
            tab, pr, pt = pc.read_table_pruned(
                path, _mk(_typed), columns=_leaf_columns(pc, path)
            )
        except TypeError:
            # numeric-LOOKING bounds on a string column: retry untyped
            tab, pr, pt = pc.read_table_pruned(
                path, _mk(str), columns=_leaf_columns(pc, path)
            )
        names = list(tab)
        print(" | ".join(names))
        n_rows = len(tab[names[0]][1]) if names else 0
        for i in range(min(n, n_rows)):
            cells = []
            for nm in names:
                vals, valid = tab[nm]
                v = vals[i] if valid[i] else None
                if isinstance(v, bytes):
                    v = v.decode(errors="replace")
                cells.append(str(v))
            print(" | ".join(cells))
        print(f"({n_rows} matching rows; decoded {pr} of {pt} pages)")
        return
    spark = _spark()
    spark.read.parquet(path).show(n, truncate=80)


def cmd_schema_parquet(path: str) -> None:
    spark = _spark()
    spark.read.parquet(path).printSchema()


def cmd_index_parquet(path: str) -> None:
    """Print each column chunk's PageIndex — per-page row offsets, sizes
    and min/max/null_count bounds plus the boundary_order claim — the
    page-stats structures the reference leaves as TODO
    (``src/column/writer.rs:356,480-481``). No Spark session needed:
    footer-only seeks."""
    from engine import parquet_compat as pc

    _BO = {0: "UNORDERED", 1: "ASCENDING", 2: "DESCENDING"}
    info = pc.read_file_info(path)
    for col in info.columns:
        try:
            locs, ci = pc.read_page_index(path, col)
        except ValueError as e:
            print(f"rg{col.rg} {col.path}: {e}")
            continue
        order = "no ColumnIndex" if ci is None else _BO.get(
            ci["boundary_order"], "?"
        )
        is_dec = col.conv == 5 and col.scale is not None
        kind = (
            f"decimal({col.precision},{col.scale})/{col.phys}"
            if is_dec
            else col.phys
        )
        print(f"rg{col.rg} {col.path} ({kind}): {len(locs)} pages, {order}")
        # decode bounds for the fixed types PLAIN stats encode 1:1 and for
        # DECIMAL columns of any backing width (int32/int64/FLBA/
        # byte_array — typed Decimal bounds, VERDICT r6 #6);
        # other byte_array/bool/INT96 display raw stat bytes
        typed = col.phys in ("int32", "int64", "float32", "float64")
        for i, loc in enumerate(locs):
            line = (
                f"  page {i}: rows@{loc['first_row']} "
                f"off={loc['offset']} comp={loc['comp_size']}B"
            )
            try:
                if ci is not None:
                    if ci["null_pages"][i]:
                        line += "  ALL-NULL"
                    else:
                        mn, mx = bytes(ci["mins"][i]), bytes(ci["maxs"][i])
                        if is_dec:
                            mn = pc.decimal_value(mn, col.phys, col.scale)
                            mx = pc.decimal_value(mx, col.phys, col.scale)
                            line += f"  min={mn} max={mx}"
                        else:
                            if typed:
                                mn = pc._plain_scalar(mn, col.phys)
                                mx = pc._plain_scalar(mx, col.phys)
                            line += f"  min={mn!r} max={mx!r}"
                    if ci["null_counts"] is not None:
                        line += f" nulls={ci['null_counts'][i]}"
            except (IndexError, ValueError, struct.error) as e:
                line += f"  <malformed ColumnIndex entry: {e!r}>"
            print(line)


def cmd_compact_parquet(out_dir: str, paths: list) -> None:
    """Distributed byte-verbatim row-group compaction (engine/compact.py)."""
    from engine import compact

    outs = compact.compact_parquet_files(_spark(), paths, out_dir)
    print(f"{len(paths)} input files -> {len(outs)} compacted:")
    for p in outs:
        print(f"  {p}")


def cmd_compact_store(store_dir: str) -> None:
    """Atomic replacing-snapshot rewrite of a ChunkStore's small files."""
    from engine import compact, lineage

    store = lineage.ChunkStore(_spark(), store_dir, table_format="snapshot")
    res = compact.compact_chunk_store(store)
    print(
        f"chunks: {res['files_before']} files -> {res['files_after']} "
        f"(snapshot v{res['version']})"
    )


def cmd_export_parquet(in_path: str, out_dir: str,
                       bucket_key: str | None = None,
                       salt_col: str | None = None) -> None:
    """Re-encode an arbitrary parquet dataset through the engine writer
    as a RESUMABLE export (engine/jobs/export.py): kill it, re-run it,
    and only the missing units are written. Without a bucket_key the
    units are uniform salted buckets over ONE logical key (sized by
    rows_per_bucket); salt_col defaults to the first hashable scalar
    column."""
    from engine.jobs.export import export_parquet

    spark = _spark()
    df = spark.read.parquet(in_path)
    if not df.columns:
        raise SystemExit(f"{in_path}: no columns")
    if salt_col is None:
        # first HASHABLE scalar column (xxhash64 rejects maps; arrays /
        # structs hash but make poor salts) — prefer strings/ids
        hashable = ("string", "bigint", "int", "double", "float",
                    "boolean", "date", "smallint", "tinyint")
        cands = [f.name for f in df.schema.fields
                 if f.dataType.simpleString() in hashable
                 or f.dataType.simpleString().startswith("timestamp")]
        if not cands:
            raise SystemExit(
                "no scalar column usable as a salt — pass one: "
                "export-parquet <in> <out> [bucket_key [salt_col]]"
            )
        salt_col = cands[0]
    manifest = export_parquet(
        df, out_dir, bucket_key=bucket_key, salt_col=salt_col
    ).collect()
    written = [r for r in manifest if not r.resumed]
    print(
        f"{len(written)} unit files written "
        f"({sum(r.rows for r in written)} rows), "
        f"{len(manifest) - len(written)} resumed -> {out_dir}"
    )


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    cmd, store = sys.argv[1], sys.argv[2]
    if cmd == "read":
        cmd_read(store, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    elif cmd == "schema":
        cmd_schema(store)
    elif cmd == "chunks":
        cmd_chunks(store)
    elif cmd == "lookup":
        if len(sys.argv) < 4:
            print(__doc__)
            raise SystemExit(2)
        cmd_lookup(store, sys.argv[3:])
    elif cmd == "read-parquet":
        # both [n] and the predicate are optional: a non-numeric third
        # argument IS the predicate
        args = sys.argv[3:]
        nrec, where = 10, None
        if args and args[0].isdigit():
            nrec, args = int(args[0]), args[1:]
        if args:
            where = args[0]
        cmd_read_parquet(store, nrec, where)
    elif cmd == "schema-parquet":
        cmd_schema_parquet(store)
    elif cmd == "index-parquet":
        cmd_index_parquet(store)
    elif cmd == "compact-parquet":
        if len(sys.argv) < 4:
            print(__doc__)
            raise SystemExit(2)
        cmd_compact_parquet(store, sys.argv[3:])
    elif cmd == "compact-store":
        cmd_compact_store(store)
    elif cmd == "export-parquet":
        if len(sys.argv) < 4:
            print(__doc__)
            raise SystemExit(2)
        cmd_export_parquet(store, sys.argv[3], *sys.argv[4:6])
    else:
        print(__doc__)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
