"""Connected components / dedup decisions (engine/ops/graph.py) against a
union-find reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.ops import graph


def _union_find(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_chain_converges_logarithmically(spark):
    """A 200-node path graph — the worst diameter case — must converge
    within the iteration cap (pointer jumping keeps rounds O(log n))."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = graph.connected_components(df, max_iters=25).toPandas()
    assert (out["comp"] == 0).all() and len(out) == 201


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(5)
    edges = [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, 300, 400), rng.integers(0, 300, 400)
        )
        if a != b
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = dict(
        graph.connected_components(df).toPandas()[["node", "comp"]].itertuples(
            index=False, name=None
        )
    )
    want = _union_find(edges)
    # canonical representative on both sides = min of component
    assert got == want


def test_dedup_decisions_singletons_and_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "id_a long, id_b long"
    )
    out = graph.dedup_decisions(docs, edges).toPandas().set_index("doc_id")
    assert out.loc[7, "cluster"] == 1 and not out.loc[7, "keep"]
    assert out.loc[4, "cluster"] == 1 and not out.loc[4, "keep"]
    assert out.loc[1, "keep"] and out.loc[2, "keep"]
    assert out.loc[9, "cluster"] == 2 and not out.loc[9, "keep"]
    # untouched docs are their own surviving cluster
    for i in (0, 3, 5, 6, 8):
        assert out.loc[i, "cluster"] == i and out.loc[i, "keep"]
    # exactly one survivor per cluster
    g = out.reset_index().groupby("cluster")["keep"].sum()
    assert (g == 1).all()


def test_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches per-iteration state to reliable
    DataFrame.checkpoint(): results identical to the localCheckpoint
    default, and the checkpoint files actually land in the directory
    (stable storage — the thing that survives an executor loss)."""
    import os

    ckdir = str(tmp_path / "cc_ckpt")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 3), (5, 21)],
        "id_a long, id_b long",
    )
    base = {
        (r["node"], r["comp"])
        for r in graph.connected_components(edges).collect()
    }
    reliable = {
        (r["node"], r["comp"])
        for r in graph.connected_components(
            edges, checkpoint_dir=ckdir
        ).collect()
    }
    assert reliable == base
    found = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert found, "no checkpoint files written to checkpoint_dir"


def test_minhash_materialize_releases_cache(spark):
    """materialize=True computes the pair list eagerly, unpersists the
    internal banded exchange, and hands back a persisted DataFrame; after
    the caller's unpersist() the cached-RDD count is back to its pre-call
    level (VERDICT r3 #6: deterministic cache lifetime)."""
    from engine.ops import dedup

    def cached_ids():
        # ids, not counts: other suites sharing the session may hold (or
        # lazily drop) their own cached RDDs while this test runs — only
        # RDDs introduced by THIS call matter
        return {
            i.id()
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.isCached()
        }

    rows = [(i, f"document text number {i % 7} with shared shingles") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    before = cached_ids()
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, materialize=True)
    # internal exchange released; only the returned handle remains cached
    assert len(cached_ids() - before) == 1
    assert pairs.count() > 0
    pairs.unpersist(blocking=True)
    assert not (cached_ids() - before)


def test_reliable_checkpoint_abort_cleans_and_restores(spark, tmp_path):
    """Failure path (r4 review): non-convergence removes the per-call
    checkpoint subdir entirely and restores the application's own global
    checkpoint dir pointer."""
    import os

    prior = str(tmp_path / "app_ckpt")
    spark.sparkContext.setCheckpointDir(prior)
    ckdir = str(tmp_path / "cc_ckpt")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        graph.connected_components(edges, max_iters=1, checkpoint_dir=ckdir)
    leftovers = os.listdir(ckdir) if os.path.isdir(ckdir) else []
    assert not leftovers, leftovers
    # Spark resolves setCheckpointDir to an internal uuid subdir; restoring
    # to the RESOLVED path keeps later checkpoints inside the app's tree
    got = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert got.isDefined() and "app_ckpt" in got.get()
    assert "cc_ckpt" not in got.get()


def test_reliable_checkpoint_concurrent_calls_serialize(spark, tmp_path):
    """Two reliable-mode connected_components calls from two driver threads
    of ONE SparkContext must not cross-contaminate (the global checkpoint
    pointer is guarded by _RELIABLE_PTR_LOCK — VERDICT r4 #3): both return
    correct components, the lock ends released, and the pointer is restored."""
    import threading

    ckdir = str(tmp_path / "cc-concurrent")
    edges_a = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    edges_b = spark.createDataFrame(
        [(100, 101), (101, 102), (200, 201)], "id_a long, id_b long"
    )
    results: dict = {}
    errors: list = []

    def run(name, edges):
        try:
            out = graph.connected_components(
                edges, checkpoint_dir=ckdir
            ).toPandas()
            results[name] = dict(zip(out["node"], out["comp"]))
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((name, e))

    ts = [
        threading.Thread(target=run, args=("a", edges_a)),
        threading.Thread(target=run, args=("b", edges_b)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, errors
    assert results["a"] == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert results["b"] == {100: 100, 101: 100, 102: 100, 200: 200, 201: 200}
    # lock must be free again (acquire must succeed immediately)
    assert graph._RELIABLE_PTR_LOCK.acquire(blocking=False)
    graph._RELIABLE_PTR_LOCK.release()


def test_nested_reliable_call_raises_not_deadlocks(spark, tmp_path):
    """A same-thread nested reliable-mode call must raise a diagnosable
    error immediately — the non-reentrant pointer lock would otherwise
    deadlock forever (r5 review #5)."""
    import pytest

    ckdir = str(tmp_path / "cc-nested")
    ck = graph._ReliableCkpt(spark.sparkContext, ckdir)
    try:
        with pytest.raises(RuntimeError, match="nested reliable-mode"):
            graph._ReliableCkpt(spark.sparkContext, ckdir)
    finally:
        ck.abort()
    # lock is free again afterwards
    assert graph._RELIABLE_PTR_LOCK.acquire(blocking=False)
    graph._RELIABLE_PTR_LOCK.release()
