"""Deterministic synthetic corpus generator (FIXTURES.md F1/F2).

Pure function of (seed, n_rows): regenerating at any scale reproduces
identical tables — the driver contract for correctness and benchmarks.
Mirrors the reference's bench generators (uniform cardinality 10/100/1000,
``benches/common.rs:30-46``) and ``RandGen`` property inputs
(``src/util/test_common.rs:28-100``), extended with the codec-targeted
regimes of FIXTURES.md F2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SOURCES = ["web", "code", "books", "wiki", "chat"]
WEIGHTS = [0.55, 0.2, 0.12, 0.08, 0.05]

# per-source regime mix so codec choice varies by partition (FIXTURES.md F2)
_SOURCE_REGIME = {
    "web": "zipf",
    "code": "lowcard1000",
    "books": "monotone",
    "wiki": "smallrange",
    "chat": "runs",
}


def _tokens_for(regime: str, n: int, rng: np.random.Generator) -> np.ndarray:
    i32 = np.iinfo(np.int32)
    if regime == "lowcard10":
        return rng.integers(0, 10, n).astype(np.int32)
    if regime == "lowcard100":
        return rng.integers(0, 100, n).astype(np.int32)
    if regime == "lowcard1000":
        return rng.integers(0, 1000, n).astype(np.int32)
    if regime == "runs":
        vals = []
        total = 0
        while total < n:
            run = int(rng.geometric(0.1))
            vals.append(np.full(min(run, n - total), int(rng.integers(0, 8)), np.int32))
            total += run
        return np.concatenate(vals)[:n]
    if regime == "monotone":
        return (int(rng.integers(0, 1 << 20)) + np.cumsum(rng.integers(0, 7, n))).astype(
            np.int32
        )
    if regime == "smallrange":
        k = int(rng.choice([1, 4, 12]))
        base = int(rng.integers(0, 1 << 16))
        return (base + rng.integers(0, 1 << k, n)).astype(np.int32)
    if regime == "fullrange":
        v = rng.integers(i32.min, i32.max, n, endpoint=True).astype(np.int32)
        if n >= 4:
            v[:4] = [i32.min, i32.max, i32.max, i32.min]
        return v
    if regime == "zipf":
        return np.minimum(rng.zipf(1.3, n), 50_000).astype(np.int32) - 1
    if regime == "alternating":
        return (np.arange(n) % 2).astype(np.int32)
    if regime == "constant":
        return np.full(n, int(rng.integers(0, 1 << 16)), np.int32)
    raise ValueError(regime)


def generate_pandas(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """tokenized_sequences(doc_id, tokens, n_tok, source) as pandas."""
    rng = np.random.default_rng(seed)
    sources = rng.choice(SOURCES, size=n_rows, p=WEIGHTS)
    n_toks = np.clip(rng.lognormal(5.5, 0.8, n_rows), 8, 4096).astype(np.int32)
    tokens = []
    counters: dict[str, int] = {s: 0 for s in SOURCES}
    doc_ids = []
    for i in range(n_rows):
        s = sources[i]
        tokens.append(_tokens_for(_SOURCE_REGIME[s], int(n_toks[i]), rng))
        doc_ids.append(f"doc-{s}-{counters[s]:08d}")
        counters[s] += 1
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "tokens": pd.Series(tokens, dtype=object),
            "n_tok": n_toks,
            "source": sources,
        }
    )


def generate_spark(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """tokenized_sequences as a Spark DataFrame (arrow-backed conversion).

    For bench sizes the generation itself is distributed: one seed per
    partition-sized slice via ``mapInPandas`` over a range, so the driver
    never materializes the corpus.
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("tokens", ArrayType(IntegerType(), False), False),
            StructField("n_tok", IntegerType(), False),
            StructField("source", StringType(), False),
        ]
    )
    slice_size = 20_000
    n_slices = (n_rows + slice_size - 1) // slice_size

    def gen(iterator):
        for pdf in iterator:
            for _, row in pdf.iterrows():
                k = int(row["id"])
                n = min(slice_size, n_rows - k * slice_size)
                out = generate_pandas(n, seed=seed + k)
                # globally-unique doc ids across slices
                out["doc_id"] = out["doc_id"] + f"-s{k:05d}"
                yield out

    rng_df = spark.range(n_slices)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema)
