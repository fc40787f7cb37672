"""One-sided comparison predicate leaves (>= > <= < ==): Spark's
GreaterThan[OrEqual]/LessThan[OrEqual]/EqualTo pushdown forms. Strict
operators prune via their inclusive envelope (sound — at most the
boundary page survives to the residual) and resolve exactly in the
residual; a None envelope side is unbounded through every layer."""

import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import parquet_compat as pc


N = 10_000


@pytest.fixture(scope="module")
def sorted_path(tmp_path_factory):
    k = pa.array(np.arange(N, dtype=np.int64))
    s = pa.array([f"w{i:05d}" for i in range(N)], type=pa.string())
    t = pa.table({"k": k, "s": s})
    path = str(tmp_path_factory.mktemp("cmp") / "sorted.parquet")
    pq.write_table(t, path, write_page_index=True, data_page_size=2048,
                   use_dictionary=False)
    return path


@pytest.mark.parametrize("op,expect", [
    (">=", list(range(9000, N))),
    (">", list(range(9001, N))),
    ("<=", list(range(0, 1001))),
    ("<", list(range(0, 1000))),
    ("==", [5000]),
])
def test_int_comparisons_prune_and_match(sorted_path, op, expect):
    bound = {">=": 9000, ">": 9000, "<=": 1000, "<": 1000, "==": 5000}[op]
    table, nread, ntot = pc.read_table_pruned(
        sorted_path, ("k", op, bound), columns=["k"]
    )
    assert table["k"][0].tolist() == expect
    assert nread < ntot, f"{op} must skip pages on a sorted column"


def test_string_one_sided_range(sorted_path):
    """s >= 'w09990' — inexpressible as a two-sided range (no sound
    upper bound for arbitrary strings) before comparison leaves."""
    table, nread, ntot = pc.read_table_pruned(
        sorted_path, ("s", ">=", "w09990"), columns=["k", "s"]
    )
    assert table["k"][0].tolist() == list(range(9990, N))
    assert nread < ntot


def test_strict_boundary_page_is_exact(sorted_path):
    """k > 2047 where 2047 is the last row of a page: the envelope keeps
    that boundary page, the residual must drop its rows exactly."""
    table, _, _ = pc.read_table_pruned(
        sorted_path, ("k", ">", 2047), columns=["k"]
    )
    got = table["k"][0]
    assert got[0] == 2048 and len(got) == N - 2048


def test_cnf_with_comparisons(sorted_path):
    """(k >= 100 AND k < 110) via two one-sided leaves ANDed."""
    table, _, _ = pc.read_table_pruned(
        sorted_path, [("k", ">=", 100), ("k", "<", 110)], columns=["k"]
    )
    assert table["k"][0].tolist() == list(range(100, 110))


def test_eq_nan_matches_nothing(tmp_path):
    from engine import parquet_out as po

    v = np.array([1.0, float("nan"), 3.0], np.float64)
    path = str(tmp_path / "nan.parquet")
    po.write_table(path, [("v", "float64", "PLAIN", v, None)])
    table, _, _ = pc.read_table_pruned(
        path, ("v", "==", float("nan")), columns=["v"]
    )
    assert table["v"][0].tolist() == []


def test_dict_filter_with_strict_cmp(tmp_path):
    """A pure-dict chunk whose dictionary tops out at 49 prunes under
    v > 49 by reading only the dict page."""
    from engine import parquet_out as po

    v = np.tile(np.arange(50, dtype=np.int64), 20)
    path = str(tmp_path / "dict.parquet")
    po.write_table(path, [("v", "int64", "PLAIN_DICTIONARY", v, None)])
    table, nread, ntot = pc.read_table_pruned(
        path, ("v", ">", 49), columns=["v"]
    )
    assert table["v"][0].tolist() == []
    table, _, _ = pc.read_table_pruned(path, ("v", ">", 48), columns=["v"])
    assert table["v"][0].tolist() == [49] * 20


def test_plan_phase_rg_pruning_with_cmp(spark, tmp_path):
    t = pa.table({"k": pa.array(np.arange(4000, dtype=np.int64))})
    path = str(tmp_path / "rgcmp.parquet")
    pq.write_table(t, path, row_group_size=1000, write_page_index=True)
    report: dict = {}
    df = pc.read_parquet_with_engine(
        spark, path, predicate=("k", ">=", 3500), prune_report=report
    )
    assert sorted(r.k for r in df.collect()) == list(range(3500, 4000))
    assert (report["rg_total"], report["rg_planned"]) == (4, 1)


def test_bad_cmp_forms_fail_clean():
    with pytest.raises(TypeError, match="isnull"):
        pc._norm_predicates(("k", ">=", None))
    with pytest.raises(TypeError, match="one-sided"):
        pc._norm_predicates(("k", None, 5))


def test_cli_cmp_form(sorted_path):
    out = subprocess.run(
        [sys.executable, "-m", "engine.cli", "read-parquet",
         sorted_path, "2", "k:>=:9995"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "(5 matching rows" in out.stdout
