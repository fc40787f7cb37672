"""Predicate-pruned reads that PROJECT repeated (list) columns: the
predicate stays on flat columns, but the projection may include a list
column whose records re-assemble from exactly the index-selected pages
(pages under a PageIndex begin at record boundaries — parquet spec).
Covers pyarrow-written (foreign) and engine-written files, with and
without page pruning engaging, plus the distributed read path."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import parquet_compat as pc


N = 10_000


def _lists(i):
    if i % 97 == 0:
        return None
    if i % 11 == 0:
        return []
    return [i, i + 1, None, i * 2][: 1 + i % 4]


@pytest.fixture(scope="module")
def foreign_path(tmp_path_factory):
    """pyarrow-written file: sorted int key + nullable list<int64> with
    nulls at record and element level, small pages, PageIndex on."""
    k = pa.array(np.arange(N, dtype=np.int64))
    vals = pa.array([_lists(i) for i in range(N)],
                    type=pa.list_(pa.int64()))
    t = pa.table({"k": k, "vals": vals})
    path = str(tmp_path_factory.mktemp("plist") / "foreign_lists.parquet")
    pq.write_table(
        t, path, write_page_index=True, data_page_size=4096,
        column_encoding={"k": "PLAIN", "vals.list.element": "PLAIN"},
        use_dictionary=False, compression="snappy",
    )
    return path


def test_foreign_pruned_projection_matches_full(foreign_path):
    lo, hi = 4000, 4099
    table, nread, ntot = pc.read_table_pruned(
        foreign_path, ("k", lo, hi), columns=["k", "vals.list.element"]
    )
    assert nread < ntot, "page pruning must engage on the sorted key"
    ks, kvalid = table["k"]
    assert kvalid.all() and ks.tolist() == list(range(lo, hi + 1))
    recs, rvalid = table["vals.list.element"]
    expect = [_lists(i) for i in range(lo, hi + 1)]
    assert recs == expect
    assert rvalid.tolist() == [e is not None for e in expect]


def test_foreign_pruned_projection_crosses_pages(foreign_path):
    """Surviving rows span several non-adjacent leaf pages of the list
    column (its page grid differs from the key's)."""
    pred = [("k", "in", [10, 2500, 5000, 9999])]
    table, nread, ntot = pc.read_table_pruned(
        foreign_path, pred, columns=["vals.list.element", "k"]
    )
    assert nread < ntot
    assert table["k"][0].tolist() == [10, 2500, 5000, 9999]
    assert table["vals.list.element"][0] == [_lists(i) for i in (10, 2500, 5000, 9999)]


def test_predicate_on_repeated_column_still_rejected(foreign_path):
    with pytest.raises(ValueError, match="flat predicate columns"):
        pc.read_table_pruned(foreign_path, ("vals.list.element", 0, 5))


def test_distributed_read_rejects_repeated_predicate(spark, foreign_path):
    """The driver must raise BEFORE planning: a repeated leaf's footer
    null_count counts entries, not records, so plan-phase stats would
    silently mis-prune (r7 review pass 5 #5)."""
    with pytest.raises(ValueError, match="flat predicate columns"):
        pc.read_parquet_with_engine(
            spark, foreign_path,
            predicate=("vals.list.element", "notnull", None),
        )


def test_no_index_fallback_whole_chunk(tmp_path):
    """A file WITHOUT a PageIndex decodes list projections whole-chunk
    (pages all counted as read) but still returns exact rows."""
    t = pa.table({
        "k": pa.array(np.arange(200, dtype=np.int64)),
        "vals": pa.array([_lists(i) for i in range(200)],
                         type=pa.list_(pa.int64())),
    })
    path = str(tmp_path / "noindex.parquet")
    pq.write_table(t, path, write_page_index=False, use_dictionary=False)
    table, nread, ntot = pc.read_table_pruned(
        path, ("k", 50, 52), columns=["k", "vals.list.element"]
    )
    assert nread == ntot  # nothing skippable without an index
    assert table["k"][0].tolist() == [50, 51, 52]
    assert table["vals.list.element"][0] == [_lists(i) for i in (50, 51, 52)]


def test_engine_written_nested_pruned(tmp_path):
    """Engine-written LIST column round-trips through the pruned read."""
    from engine import parquet_out as po

    recs = [_lists(i) for i in range(2000)]
    k = np.arange(2000, dtype=np.int64)
    validity = np.array([r is not None for r in recs], bool)
    entries = [e for r in recs if r is not None for e in r]
    counts = [0 if r is None else len(r) for r in recs]
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    elem_valid = np.array([e is not None for e in entries], bool)
    dense = np.array([e for e in entries if e is not None], np.int64)
    path = str(tmp_path / "engine_lists.parquet")
    po.write_table(
        path,
        [
            ("k", "int64", "PLAIN", k, None),
            ("vals", "list<int64>", "PLAIN",
             (offsets, dense, elem_valid), validity),
        ],
        codec="snappy",
        page_size_rows=250,
    )
    table, nread, ntot = pc.read_table_pruned(
        path, ("k", 600, 649), columns=["k", "vals.list.element"]
    )
    assert nread < ntot
    assert table["k"][0].tolist() == list(range(600, 650))
    assert table["vals.list.element"][0] == recs[600:650]


def test_distributed_read_with_list_projection(spark, foreign_path):
    """read_parquet_with_engine(predicate=...) now serves files whose
    projection includes a list column."""
    df = pc.read_parquet_with_engine(
        spark, foreign_path, columns=["k", "vals.list.element"],
        predicate=("k", 7000, 7049), prune_stats=True,
    )
    rows = df.orderBy("k").collect()
    assert [r.k for r in rows] == list(range(7000, 7050))
    assert [r["vals.list.element"] for r in rows] == [
        _lists(i) for i in range(7000, 7050)
    ]
    assert rows[0]._pages_read < rows[0]._pages_total
