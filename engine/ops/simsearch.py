"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: exact baseline. The query set is small by
  definition, so it ships as a **broadcast** crossJoin — the big side never
  shuffles, and Catalyst keeps the scan columnar;
- LSH-bucketed (random hyperplane) variant: the 100 TB path. Each vector
  maps to a ``nbits``-bit signature; candidates share a bucket, so the join
  is bucket-local. Recall is tunable with ``ntables`` independent tables;
- IVF-style variant: coarse k-means-ish centroids (sampled deterministic
  seeds), probe the ``nprobe`` nearest cells only.

Dot products use ``F.zip_with`` + ``F.aggregate`` (JVM-side, whole-stage
codegen) — no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries``: (query_id, embedding). Broadcast to every task; ranking is a
    window over (query_id) — sims rounded to 6dp with id tie-break so results
    are deterministic across float orderings.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    sim = (
        vectors.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
                6,
            ),
        )
        .select(query_id_col, id_col, "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def hyperplane_signatures(
    vectors: DataFrame,
    dim: int,
    nbits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(<v, h_i>). Hyperplanes
    are a deterministic broadcast literal (seeded numpy)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    sig = None
    for i in range(nbits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return vectors.withColumn("lsh_bucket", sig)


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 12,
    seed: int = 42,
    ntables: int = 1,
    multiprobe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only vectors sharing an LSH bucket with the query
    (in any of ``ntables`` independent hyperplane tables) are scored.

    At scale this turns the broadcast crossJoin into bucket-equality joins:
    each task scores ~ntables * n/2^nbits candidates instead of n.
    ``multiprobe`` additionally probes every bucket at Hamming distance 1
    from the query's signature (nbits extra buckets per table) — the
    standard recall/probe-count trade for random-hyperplane LSH; probing is
    a broadcast-side explode, the big table is still touched once per table.
    """
    scored = None
    for t in range(ntables):
        v = hyperplane_signatures(vectors, dim, nbits, seed + t, vec_col)
        q = hyperplane_signatures(
            queries.select(query_id_col, F.col(vec_col).alias("_qvec")),
            dim,
            nbits,
            seed + t,
            "_qvec",
        )
        if multiprobe:
            probes = F.explode(
                F.array(
                    F.col("lsh_bucket"),
                    *[
                        F.col("lsh_bucket").bitwiseXOR(F.lit(1 << b))
                        for b in range(nbits)
                    ],
                )
            )
            q = q.select(query_id_col, "_qvec", probes.alias("lsh_bucket"))
        sim = (
            v.join(F.broadcast(q), "lsh_bucket")
            .withColumn(
                "cosine",
                F.round(
                    _dot(F.col(vec_col), F.col("_qvec"))
                    / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
                    6,
                ),
            )
            .select(query_id_col, id_col, "cosine")
        )
        scored = sim if scored is None else scored.union(sim)
    sim_all = scored.distinct()  # a pair found by several tables scores once
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        sim_all.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 4096,
) -> np.ndarray:
    """Deterministic mini k-means on a bounded sample (the coarse quantizer
    training step of IVF). The sample is tiny by construction — only it is
    collected; assignment/refinement of the full table stays distributed."""
    pdf = vectors.orderBy(id_col).limit(sample).select(vec_col).toPandas()
    X = np.stack(pdf[vec_col].to_numpy())
    cents = X[:k].copy()  # deterministic init: first k by id
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: score only vectors in each query's ``nprobe`` nearest
    cells. The big side joins on its precomputed cell id — per-task candidate
    count drops to ~nprobe/k of the table at any scale."""
    import pandas as pd
    from pyspark.sql import functions as F

    assigned = ivf_assign(vectors, centroids, vec_col)
    qpdf = queries.toPandas()  # queries are small by definition
    Q = np.stack(qpdf[vec_col].to_numpy())
    d = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d, axis=1)[:, :nprobe]
    probe_rows = [
        {query_id_col: int(qpdf[query_id_col].iloc[i]), "_qvec": list(map(float, Q[i])), "ivf_cell": int(c)}
        for i in range(len(qpdf))
        for c in probes[i]
    ]
    qdf = vectors.sparkSession.createDataFrame(pd.DataFrame(probe_rows))
    sim = (
        assigned.join(F.broadcast(qdf), "ivf_cell")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col(vec_col), F.col("_qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
                6,
            ),
        )
        .select(query_id_col, id_col, "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell). Centroids are a
    small driver-side array (deterministic sample or k-means output) shipped
    as literals; assignment is a JVM-side argmin over cell distances."""
    best_id, best_d = None, None
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        if best_id is None:
            best_id, best_d = F.lit(ci), d
        else:
            cond = d < best_d
            best_id = F.when(cond, F.lit(ci)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
    return vectors.withColumn("ivf_cell", best_id)
