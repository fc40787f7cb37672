"""Phase-isolation microbench (guide §1.4): times sub-stages of the hottest
bench queries with the noop sink so optimization targets the real cost.
NOT part of the driver contract — bench.py stays the frozen measurement.

Usage: python bench_extra.py [phase ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, build, results, reps=2):
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        _noop(build())
        ts.append(time.time() - t0)
    results[name] = round(min(ts), 3)
    print(f"{name}: {results[name]} (all: {[round(t,3) for t in ts]})", flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    import __spark_entry__ as entry
    from engine.session import get_spark, ship_package
    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job
    from engine import skew

    spark = get_spark(app="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    which = set(sys.argv[1:]) or {"rt", "encode", "minhash", "textstats", "knn"}

    if "rt" in which:
        # rt_delta_sorted_partkeys phases
        def seq():
            return entry._seq_from_lineitem(spark, sf_dir, "l_partkey")

        timed(spark, "rt.seq_derive", seq, results)
        timed(spark, "rt.plan_buckets",
              lambda: skew.plan_buckets(seq(), rows_per_bucket=8192), results)

        def enc():
            cols = dict(encode_job.DEFAULT_COLUMNS)
            cols["tokens"] = ("int32_list", "delta")
            return encode_job.encode_table(seq(), columns=cols, rows_per_bucket=8192)

        timed(spark, "rt.encode", enc, results)
        timed(spark, "rt.encode+decode",
              lambda: decode_job.decode_chunks(enc()), results)
        timed(spark, "rt.full",
              lambda: entry.queries()["rt_delta_sorted_partkeys"](spark, sf_dir),
              results)

    if "encode" in which:
        from engine import datagen
        corpus = datagen.generate_spark(spark, 60000, seed=42, partitions=cpus)
        corpus = corpus.persist()
        corpus.count()
        rows_per_bucket = max(512, 60000 // 128)
        timed(spark, "bench.encode",
              lambda: encode_job.encode_table(corpus, rows_per_bucket=rows_per_bucket),
              results, reps=3)
        chunks = encode_job.encode_table(corpus, rows_per_bucket=rows_per_bucket).persist()
        chunks.count()
        timed(spark, "bench.decode",
              lambda: decode_job.decode_chunks(chunks), results, reps=3)
        chunks.unpersist()
        corpus.unpersist()

    if "minhash" in which:
        from engine.ops import dedup
        docs = entry._read(spark, sf_dir, "documents").select("doc_id", "text")
        planted = docs.union(
            docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text"))
        timed(spark, "mh.exact_collapse",
              lambda: dedup._exact_collapse(planted, "text", "doc_id")[1], results)
        timed(spark, "mh.signatures",
              lambda: dedup.minhash_signatures(
                  dedup._exact_collapse(planted, "text", "doc_id")[1],
                  num_hashes=32), results)
        timed(spark, "mh.pairs",
              lambda: dedup.minhash_lsh_pairs(planted, num_hashes=32, bands=8),
              results)
        timed(spark, "mh.full",
              lambda: entry.queries()["minhash_pairs"](spark, sf_dir), results)

    if "textstats" in which:
        timed(spark, "textstats.full",
              lambda: entry.queries()["textstats_all"](spark, sf_dir), results)

    if "knn" in which:
        timed(spark, "knn.full",
              lambda: entry.queries()["knn_bruteforce"](spark, sf_dir), results)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
