"""Debug CLI: the engine's equivalent of the reference's ``parquet-read``
(print N records, ``src/bin/parquet-read.rs:30-94``) and ``parquet-schema``
(print schema + metadata, ``src/bin/parquet-schema.rs``) binaries, pointed at
a chunk store.

Usage::

    python -m engine.cli read   <store_dir> [num_records]
    python -m engine.cli schema <store_dir>
    python -m engine.cli chunks <store_dir>      # per-chunk lineage/metrics
    python -m engine.cli lookup <store_dir> <doc_id> [doc_id ...]  # point lookup
    python -m engine.cli read-parquet   <path> [n]   # plain parquet files
    python -m engine.cli schema-parquet <path>
"""

from __future__ import annotations

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


def cmd_read_parquet(path: str, n: int = 10) -> None:
    """Print records of a plain parquet file/dataset — the literal
    ``parquet-read`` UX (``src/bin/parquet-read.rs:30-94``) for users coming
    from the reference with existing parquet data."""
    spark = _spark()
    spark.read.parquet(path).show(n, truncate=80)


def cmd_schema_parquet(path: str) -> None:
    spark = _spark()
    spark.read.parquet(path).printSchema()


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
        cmd_read_parquet(store, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    elif cmd == "schema-parquet":
        cmd_schema_parquet(store)
    else:
        print(__doc__)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
