"""spark-submit entry point: encode a corpus into a chunk store.

The north-rule deployment shape::

    python -m engine.session --makezip /tmp/engine.zip   # or scripts/make_pyfiles.py
    spark-submit --master <cluster> --py-files /tmp/engine.zip \\
        scripts/submit_encode.py <input_parquet_or_GEN:rows> <store_dir> [rows_per_bucket]

On a cluster the input is the Iceberg/parquet table of tokenized sequences;
``GEN:<rows>`` generates the deterministic synthetic corpus instead (no
external data needed). The job is resumable: rerunning after a kill encodes
only missing chunks.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    src, store_dir = sys.argv[1], sys.argv[2]
    rows_per_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 65_536

    spark = SparkSession.builder.appName("engine-encode").getOrCreate()
    # when launched via spark-submit --py-files, the engine package is already
    # on every executor's path; ship_package() is the programmatic fallback
    try:
        import engine  # noqa: F401
    except ImportError:
        raise SystemExit("engine package missing: pass --py-files engine.zip")
    from engine import datagen, lineage

    if src.startswith("GEN:"):
        df = datagen.generate_spark(spark, int(src[4:]), seed=42)
    else:
        df = spark.read.parquet(src)

    store = lineage.ChunkStore(spark, store_dir)
    n = lineage.encode_with_resume(spark, df, store, rows_per_bucket=rows_per_bucket)
    stats = (
        store.read_lineage()
        .where(F.col("column") == "tokens")
        .agg(
            F.sum("n_values").alias("tokens"),
            F.sum("enc_bytes").alias("enc"),
            F.sum("raw_bytes").alias("raw"),
        )
        .first()
    )
    print(
        f"chunks written this run: {n}; store totals: {stats['tokens']} tokens, "
        f"{stats['enc'] / stats['tokens']:.3f} bytes/token "
        f"({stats['enc'] / stats['raw']:.3f}x raw)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
