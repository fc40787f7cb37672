"""Benchmark harness (driver contract).

Runs the engine's headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (seconds), "unit": "sec", "queries": {...}, "sf",
plus throughput extras}.

Workload:
- encode: deterministic bench corpus (datagen, ~20M tokens) -> chunk rows
  (the north-rule metric: encode throughput in tokens/sec);
- decode: chunks -> sequences, exact count check (bit-identical decode is
  asserted by the correctness gate; here we time it);
- queries: the round-trip + pipeline queries from __spark_entry__ at sf_dir.

Scaling evidence (N vs 4N executors) is produced by
``scripts/scaling_bench.py``, which invokes this file at two parallelism
levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "60000"))


def _timed_reps(reps: int, run) -> list[float]:
    """``reps`` timed passes of one item, extended by up to 2 extra passes
    while the spread exceeds 1.5x (VERDICT r5 #4: this VM's neighbor load
    swings throughput 2-4x between moments, and best-of-2 inside one
    window could not bound it — BENCH_r05 recorded a 32s wall that re-ran
    at 14.8s). Every pass is recorded in the artifact ("passes"), so the
    bench JSON itself shows the envelope; the headline takes the best."""
    times: list[float] = []
    reps = max(reps, 1)  # reps=0 would evaluate max() on an empty list
    max_extra = 2
    while len(times) < reps or (
        len(times) < reps + max_extra and max(times) > 1.5 * min(times)
    ):
        t0 = time.time()
        run(len(times))
        times.append(time.time() - t0)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from engine import datagen
    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job
    from engine.session import get_spark, ship_package

    spark = get_spark(app="bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # -- headline: encode/decode throughput on the deterministic corpus -----
    corpus = datagen.generate_spark(spark, BENCH_ROWS, seed=42, partitions=cpus)
    corpus = corpus.persist()
    n_tokens = corpus.agg(F.sum("n_tok")).first()[0]  # materializes the corpus

    # bucket count must exceed task slots by a healthy factor at ANY scale;
    # at 10^12 rows the production default (65536) yields millions of buckets,
    # at bench scale we derive it from the corpus size (~128 buckets)
    rows_per_bucket = max(512, BENCH_ROWS // 128)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    passes: dict[str, list[float]] = {}
    state: dict = {}

    def run_encode(i):
        if "chunks" in state:
            state["chunks"].unpersist()
        state["chunks"] = encode_job.encode_table(
            corpus, rows_per_bucket=rows_per_bucket
        ).persist()
        state["chunks"].count()

    enc_times = _timed_reps(reps, run_encode)
    chunks = state["chunks"]
    passes["encode"] = [round(t, 3) for t in enc_times]
    t_encode = min(enc_times)
    timings["encode"] = round(t_encode, 3)
    extras["encode_tokens_per_sec"] = round(n_tokens / t_encode, 1)

    m = (
        chunks.where(F.col("column") == "tokens")
        .agg(F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc"))
        .first()
    )
    extras["bytes_per_token"] = round(m["enc"] / n_tokens, 4)
    extras["compression_ratio"] = round(m["enc"] / m["raw"], 4)
    extras["n_tokens"] = int(n_tokens)

    def run_decode(i):
        decoded_tokens = (
            decode_job.decode_chunks(chunks).agg(F.sum("n_tok")).first()[0]
        )
        assert decoded_tokens == n_tokens, (
            f"decode lost tokens: {decoded_tokens} != {n_tokens}"
        )

    dec_times = _timed_reps(reps, run_decode)
    passes["decode"] = [round(t, 3) for t in dec_times]
    t_decode = min(dec_times)
    timings["decode"] = round(t_decode, 3)
    extras["decode_tokens_per_sec"] = round(n_tokens / t_decode, 1)
    chunks.unpersist()
    corpus.unpersist()

    # -- per-query timings at sf_dir ----------------------------------------
    if os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "1") == "0":
        bench_queries = []
    else:
        bench_queries = _BENCH_QUERIES
    # queries use the same best-of-N policy as encode/decode (documented
    # above): the first pass additionally pays one-time whole-stage-codegen
    # compilation (the 64-aggregate minhash signature stage alone compiles
    # for seconds), which is amortized away on any real corpus
    for name in bench_queries:
        q_times = _timed_reps(
            reps,
            lambda i, n=name: entry.queries()[n](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        passes[name] = [round(t, 3) for t in q_times]
        timings[name] = round(min(q_times), 3)

    if bench_queries:
        # -- extras-only microbench (NOT in the headline wall, which stays
        # comparable across rounds): predicate pushdown over an
        # engine-written parquet file — how much IO/decode a mid-range
        # point query skips via the PageIndex --
        import tempfile

        import numpy as np

        from engine import parquet_compat as pcompat
        from engine import parquet_out as pout

        npr = 2_000_000
        ids = np.arange(npr, dtype=np.int64)
        payload = (ids * 2654435761 % 1_000_003).astype(np.int64)
        pdir = tempfile.mkdtemp(prefix="sg_bench_pruned_")
        ppath = os.path.join(pdir, "pruned.parquet")
        pout.write_table(
            ppath,
            [
                ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
                ("v", "int64", "PLAIN", payload, None),
            ],
            page_size_rows=16384,
            sorting_columns=[("id", False, False)],
        )
        t0 = time.time()
        full = pcompat.read_table(ppath)
        t_full = time.time() - t0
        lo, hi = npr // 2, npr // 2 + npr // 100  # a 1% mid-range slice
        t0 = time.time()
        tab, p_read, p_total = pcompat.read_table_pruned(
            ppath, ("id", lo, hi), columns=["id", "v"]
        )
        t_pruned = time.time() - t0
        assert len(tab["id"][0]) == hi - lo + 1
        assert len(full["id"][0]) == npr
        extras["pruned_read_pages_frac"] = round(p_read / p_total, 4)
        extras["pruned_read_speedup"] = round(t_full / t_pruned, 2)
        import shutil

        shutil.rmtree(pdir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # window-noise summary: max/min spread per item, medianed — >1.5 means
    # the recorded window was contended even after the adaptive extra reps
    spreads = sorted(
        max(t) / min(t) for t in passes.values() if min(t) > 0
    )
    extras["noise_ratio_median"] = round(
        spreads[len(spreads) // 2] if spreads else 1.0, 3
    )
    print(
        json.dumps(
            {
                "metric": "engine bench wall (encode+decode+queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "passes": passes,
                "sf": sf,
                "cpus": cpus,
                "extras": extras,
            }
        )
    )
    spark.stop()


_BENCH_QUERIES = [
        "rt_delta_sorted_partkeys",
        "rt_dict_lowcard",
        "rt_rle_linenumbers",
        "rt_auto_documents",
        "dedup_exact",
        "minhash_pairs",
        "knn_bruteforce",
        "textstats_all",
        "tpch_q1",
    ]


if __name__ == "__main__":
    main()
