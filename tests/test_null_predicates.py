"""IS NULL / IS NOT NULL predicate leaves — the last of Spark's
pushdown predicate forms (IsNull/IsNotNull): pruned via ColumnIndex
null_pages/null_counts at page level, footer Statistics null_count at
plan (row-group) level, and the validity stream as the residual."""

import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import parquet_compat as pc


@pytest.fixture(scope="module")
def clustered_path(tmp_path_factory):
    """10k rows, nulls confined to rows 3000-3499 of ``s``; ``k`` is the
    sorted row id. Small pages + PageIndex so null pruning has targets."""
    n = 10_000
    k = np.arange(n, dtype=np.int64)
    s = [f"w{i:05d}" for i in range(n)]
    for i in range(3000, 3500):
        s[i] = None
    t = pa.table({"k": pa.array(k), "s": pa.array(s, type=pa.string())})
    path = str(tmp_path_factory.mktemp("nulls") / "clustered.parquet")
    pq.write_table(t, path, write_page_index=True, data_page_size=2048,
                   use_dictionary=False)
    return path


def test_isnull_prunes_pages_and_is_exact(clustered_path):
    table, nread, ntot = pc.read_table_pruned(
        clustered_path, ("s", "isnull", None), columns=["k", "s"]
    )
    ks = table["k"][0]
    assert ks.tolist() == list(range(3000, 3500))
    assert not table["s"][1].any()
    assert nread < ntot, "null_counts must skip the all-non-null pages"


def test_notnull_is_exact(clustered_path):
    table, nread, ntot = pc.read_table_pruned(
        clustered_path, ("s", "notnull", None), columns=["k"]
    )
    expect = [i for i in range(10_000) if not (3000 <= i < 3500)]
    assert table["k"][0].tolist() == expect


def test_cnf_mix_range_and_nulltest(clustered_path):
    """(k in [2900, 3100]) AND (s IS NULL) — ANDing a range with a null
    test narrows to their intersection."""
    table, nread, ntot = pc.read_table_pruned(
        clustered_path,
        [("k", 2900, 3100), ("s", "isnull", None)],
        columns=["k"],
    )
    assert table["k"][0].tolist() == list(range(3000, 3101))
    assert nread < ntot


def test_or_group_nulltest(clustered_path):
    """(k <= 5) OR (s IS NULL) — a null test as one OR branch."""
    table, _, _ = pc.read_table_pruned(
        clustered_path,
        [[("k", 0, 5), ("s", "isnull", None)]],
        columns=["k"],
    )
    assert table["k"][0].tolist() == list(range(6)) + list(range(3000, 3500))


def test_isnull_on_required_column_matches_nothing(clustered_path):
    table, nread, ntot = pc.read_table_pruned(
        clustered_path, ("k", "isnull", None), columns=["k"]
    )
    assert table["k"][0].tolist() == []


def test_notnull_on_required_column_matches_everything(clustered_path):
    table, _, _ = pc.read_table_pruned(
        clustered_path, ("k", "notnull", None), columns=["k"]
    )
    assert len(table["k"][0]) == 10_000


def test_bad_null_forms_fail_clean():
    with pytest.raises(TypeError, match="isnull"):
        pc._norm_predicates(("k", "between", None))
    with pytest.raises(TypeError):
        pc._norm_predicates(("k", None, None))


def test_plan_phase_rg_pruning_on_null_count(spark, tmp_path):
    """Multi-row-group file where only one group holds nulls: IS NULL
    must drop the null-free groups from the ledger AT PLAN TIME."""
    n = 4000
    v = [float(i) for i in range(n)]
    for i in range(1000, 1100):
        v[i] = None  # nulls only in row-group 1 of 4
    t = pa.table({"v": pa.array(v, type=pa.float64()),
                  "k": pa.array(np.arange(n, dtype=np.int64))})
    path = str(tmp_path / "rgnull.parquet")
    pq.write_table(t, path, row_group_size=1000, write_page_index=True)
    report: dict = {}
    df = pc.read_parquet_with_engine(
        spark, path, columns=["k"],
        predicate=("v", "isnull", None), prune_report=report,
    )
    ks = sorted(r.k for r in df.collect())
    assert ks == list(range(1000, 1100))
    assert report["rg_total"] == 4
    assert report["rg_planned"] == 1, "footer null_count must prune 3 groups"


def test_engine_written_file_null_predicates(tmp_path):
    """Engine-written files carry null_count in footer stats and the
    ColumnIndex, so both null tests work on our own output too."""
    from engine import parquet_out as po

    n = 2000
    vals = np.arange(n, dtype=np.int64)
    valid = np.ones(n, bool)
    valid[500:600] = False
    path = str(tmp_path / "eng.parquet")
    po.write_table(
        path,
        [("v", "int64", "PLAIN", vals, valid),
         ("k", "int64", "PLAIN", np.arange(n, dtype=np.int64), None)],
        page_size_rows=250,
    )
    table, nread, ntot = pc.read_table_pruned(
        path, ("v", "isnull", None), columns=["k"]
    )
    assert table["k"][0].tolist() == list(range(500, 600))
    assert nread < ntot
    table, _, _ = pc.read_table_pruned(
        path, ("v", "notnull", None), columns=["k"]
    )
    assert len(table["k"][0]) == n - 100


def test_cli_isnull_with_value_rejected(clustered_path):
    """col:isnull:x must fail clean, not silently run the string range
    lo='isnull' and print a convincing 0-row answer (r7 review pass 5
    #6)."""
    out = subprocess.run(
        [sys.executable, "-m", "engine.cli", "read-parquet",
         clustered_path, "3", "s:isnull:x"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "takes no value" in (out.stderr + out.stdout)


def test_cli_isnull_form(clustered_path):
    out = subprocess.run(
        [sys.executable, "-m", "engine.cli", "read-parquet",
         clustered_path, "3", "s:isnull"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "(500 matching rows" in out.stdout
