"""PageIndex (ColumnIndex/OffsetIndex) on engine-written parquet files —
the page-stats feature the reference leaves as TODO (src/column/writer.rs:
356,480-481): multi-page column chunks, per-page min/max/null_count, and
a page-pruned read that decodes only index-selected pages."""

import numpy as np
import pytest

from engine import parquet_compat as pc
from engine import parquet_out as po


def _write(tmp_path, version, codec="snappy", page_rows=1000, n=10000):
    vals = np.arange(n, dtype=np.int64)
    strs = po.flat_strings([f"doc-{i:06d}" for i in range(n)])
    path = str(tmp_path / f"pidx_v{version}.parquet")
    po.write_table(
        path,
        [
            ("x", "int64", "DELTA_BINARY_PACKED", vals, None),
            ("s", "utf8", "PLAIN_DICTIONARY", strs, None),
        ],
        codec=codec,
        page_size_rows=page_rows,
        data_page_version=version,
    )
    return path


@pytest.mark.parametrize("version", [1, 2])
def test_pyarrow_sees_page_index(tmp_path, version):
    """Structural: an independent reader parses both index structures and
    still reads every value (multi-page chunks, shared dict page)."""
    import pyarrow.parquet as pq

    path = _write(tmp_path, version)
    md = pq.ParquetFile(path).metadata.row_group(0)
    for i in range(md.num_columns):
        assert md.column(i).has_column_index
        assert md.column(i).has_offset_index
    t = pq.read_table(path)
    assert t.column("x").to_pylist() == list(range(10000))
    assert t.column("s").to_pylist()[-1] == "doc-009999"


@pytest.mark.parametrize("version", [1, 2])
def test_page_skip_on_range_predicate(tmp_path, version):
    """Behavioral: a narrow range predicate decodes exactly one of ten
    pages — skipped pages' bytes never leave storage — and the surviving
    values are exact. Exercises int (delta) and string (dict) chunks."""
    path = _write(tmp_path, version)
    info = pc.read_file_info(path)
    colx = next(c for c in info.columns if c.path == "x")
    got, defs, nread, ntot = pc.read_column_pruned_pages(path, colx, 5000, 5009)
    assert (nread, ntot) == (1, 10)
    assert got.tolist() == list(range(5000, 6000))  # the containing page
    cols = next(c for c in info.columns if c.path == "s")
    gs, _, nr, nt = pc.read_column_pruned_pages(
        path, cols, b"doc-002000", b"doc-002999"
    )
    assert (nr, nt) == (1, 10)
    lens, data = gs
    assert len(lens) == 1000
    offs = np.concatenate(([0], np.cumsum(lens)))
    first = bytes(np.frombuffer(data, np.uint8)[offs[0] : offs[1]])
    assert first == b"doc-002000"


def test_index_on_default_single_page(tmp_path):
    """page_size_rows unset -> one page per chunk; the index is still
    written (one entry) so readers can always rely on it."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "single.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN", np.arange(100, dtype=np.int64), None)],
    )
    md = pq.ParquetFile(path).metadata.row_group(0).column(0)
    assert md.has_column_index and md.has_offset_index
    info = pc.read_file_info(path)
    locs, ci = pc.read_page_index(path, info.columns[0])
    assert len(locs) == 1 and ci["null_counts"] == [0]


def test_nan_pages_skip_column_index_keep_offset_index(tmp_path):
    """A float chunk with a NaN-containing page has no sound min/max —
    the ColumnIndex is omitted (a wrong bound would corrupt pruning)
    while the OffsetIndex stays, and pruning fails clean."""
    vals = np.arange(2000, dtype=np.float64)
    vals[1500] = np.nan
    path = str(tmp_path / "nan.parquet")
    po.write_table(
        path,
        [("f", "float64", "PLAIN", vals, None)],
        page_size_rows=500,
    )
    info = pc.read_file_info(path)
    col = info.columns[0]
    locs, ci = pc.read_page_index(path, col)
    assert len(locs) == 4 and ci is None
    with pytest.raises(ValueError, match="no ColumnIndex"):
        pc.read_column_pruned_pages(path, col, 0.0, 1.0)


def test_multi_row_group_page_index(tmp_path):
    """Indexes per (row group x column): offsets point into the right
    group's pages and pruning works inside a later group."""
    vals = np.arange(8000, dtype=np.int64)
    path = str(tmp_path / "rg.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN", vals, None)],
        row_group_size=4000,
        page_size_rows=1000,
    )
    info = pc.read_file_info(path)
    assert len(info.columns) == 2  # one entry per group
    got, _, nread, ntot = pc.read_column_pruned_pages(
        path, info.columns[1], 6500, 6501
    )
    assert (nread, ntot) == (1, 4)
    assert 6500 in got.tolist() and 6501 in got.tolist()


def test_nullable_page_null_counts(tmp_path):
    """Per-page null_count lands in the ColumnIndex; an all-null page is
    marked null_pages[i]=True and never selected."""
    n = 3000
    vals = np.arange(n, dtype=np.int64)
    valid = np.ones(n, bool)
    valid[1000:2000] = False  # middle page all-null
    path = str(tmp_path / "nulls.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN", vals, valid)],
        page_size_rows=1000,
    )
    info = pc.read_file_info(path)
    locs, ci = pc.read_page_index(path, info.columns[0])
    assert ci["null_pages"] == [False, True, False]
    assert ci["null_counts"] == [0, 1000, 0]
    got, defs, nread, ntot = pc.read_column_pruned_pages(
        path, info.columns[0], 500, 2500
    )
    assert (nread, ntot) == (2, 3)  # the all-null page is skipped
    assert 500 in got.tolist() and 2500 in got.tolist()


def test_list_column_page_index(tmp_path):
    """Repeated columns get per-page element stats too; pruning on the
    leaf range selects only intersecting pages."""
    counts = np.full(1000, 4, np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    dense = np.repeat(np.arange(1000, dtype=np.int64), 4)
    path = str(tmp_path / "lists.parquet")
    po.write_table(
        path,
        [("v", "list<int64>", "PLAIN", (offsets, dense, None), None)],
        page_size_rows=250,
    )
    info = pc.read_file_info(path)
    col = info.columns[0]
    got, defs, nread, ntot = pc.read_column_pruned_pages(path, col, 300, 310)
    assert (nread, ntot) == (1, 4)
    assert set(range(300, 311)).issubset(set(got.tolist()))


def test_unboundable_max_skips_column_index(tmp_path):
    """A byte-array page whose max prefix is all-0xFF has no finite
    truncated upper bound; the chunk must omit its ColumnIndex instead of
    recording max=b'' (r6 review #2 — that bound silently pruned pages
    containing real matches)."""
    vals = [b"\xff" * 100, b"aaa"]
    lens = np.array([len(v) for v in vals], np.int64)
    data = b"".join(vals)
    path = str(tmp_path / "ff.parquet")
    po.write_table(
        path,
        [("b", "byte_array", "PLAIN", (lens, data), None)],
        page_size_rows=1,
    )
    info = pc.read_file_info(path)
    locs, ci = pc.read_page_index(path, info.columns[0])
    assert len(locs) == 2 and ci is None


def test_boundary_order_ascending_descending_unordered(tmp_path):
    """boundary_order reflects the written per-page bounds so readers can
    binary-search the index: sorted chunks claim ASCENDING, reversed
    DESCENDING, shuffled UNORDERED — and string pages compare as unsigned
    bytes."""
    n = 4000
    asc = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(7)
    shuf = rng.permutation(asc)
    strs = po.flat_strings([f"k-{i:05d}" for i in range(n)])
    path = str(tmp_path / "bo.parquet")
    po.write_table(
        path,
        [
            ("a", "int64", "PLAIN", asc, None),
            ("d", "int64", "PLAIN", asc[::-1].copy(), None),
            ("u", "int64", "PLAIN", shuf, None),
            ("s", "utf8", "PLAIN_DICTIONARY", strs, None),
        ],
        page_size_rows=1000,
    )
    info = pc.read_file_info(path)
    orders = {}
    for c in info.columns:
        _, ci = pc.read_page_index(path, c)
        orders[c.path] = ci["boundary_order"]
    assert orders == {"a": 1, "d": 2, "u": 0, "s": 1}


def test_boundary_order_ignores_all_null_pages(tmp_path):
    """Spec: ordering is judged over non-null pages only — an all-null
    middle page must not break an otherwise-ascending claim."""
    n = 3000
    vals = np.arange(n, dtype=np.int64)
    valid = np.ones(n, bool)
    valid[1000:2000] = False
    path = str(tmp_path / "bonull.parquet")
    po.write_table(
        path, [("x", "int64", "PLAIN", vals, valid)], page_size_rows=1000
    )
    info = pc.read_file_info(path)
    _, ci = pc.read_page_index(path, info.columns[0])
    assert ci["null_pages"] == [False, True, False]
    assert ci["boundary_order"] == 1


def test_ordered_index_binary_search_pruning(tmp_path, monkeypatch):
    """An ASCENDING ColumnIndex is binary-searched, not scanned: on a
    50-page chunk the pruned read decodes O(log P) stat values instead of
    2 per page, and selects exactly the pages a full scan would."""
    n = 50_000
    path = str(tmp_path / "bsearch.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN", np.arange(n, dtype=np.int64), None)],
        page_size_rows=1000,
    )
    info = pc.read_file_info(path)
    col = info.columns[0]
    calls = {"n": 0}
    real = pc._plain_scalar

    def counting(buf, phys):
        calls["n"] += 1
        return real(buf, phys)

    monkeypatch.setattr(pc, "_plain_scalar", counting)
    got, _, nread, ntot = pc.read_column_pruned_pages(path, col, 17_200, 19_100)
    assert (nread, ntot) == (3, 50)
    assert got.min() == 17_000 and got.max() == 19_999
    assert calls["n"] < 30  # linear scan would decode 100


def test_descending_index_binary_search_pruning(tmp_path):
    """DESCENDING chunks prune through the same binary search on the
    reversed non-null sequence."""
    n = 20_000
    path = str(tmp_path / "bsearch_desc.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN",
          np.arange(n, dtype=np.int64)[::-1].copy(), None)],
        page_size_rows=1000,
    )
    info = pc.read_file_info(path)
    _, ci = pc.read_page_index(path, info.columns[0])
    assert ci["boundary_order"] == 2
    got, _, nread, ntot = pc.read_column_pruned_pages(
        path, info.columns[0], 5_500, 5_600
    )
    assert (nread, ntot) == (1, 20)
    assert set(range(5_500, 5_601)).issubset(set(got.tolist()))


def test_utf8_stats_truncate_at_codepoint_boundary(tmp_path):
    """UTF8 column stats over 64 bytes must stay valid UTF-8 (r6 review
    #1 — a byte-sliced euro sign made DuckDB reject the file's stats) and
    still bound the true values."""
    import duckdb
    import pyarrow.parquet as pq

    vals = ["z" * 63 + "€" * 50, "a" * 63 + "é" * 40]
    path = str(tmp_path / "utf8.parquet")
    po.write_table(
        path, [("t", "utf8", "PLAIN", po.flat_strings(vals), None)]
    )
    st = pq.ParquetFile(path).metadata.row_group(0).column(0).statistics
    lo, hi = st.min, st.max  # pyarrow decodes -> raises if invalid UTF-8
    assert lo <= min(vals) <= max(vals) <= hi
    # DuckDB reads stats during filtered scans; invalid UTF-8 errors here
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{path}') WHERE t >= 'a'"
    ).fetchone()[0]
    assert n == 2


# --- read_table_pruned: row-aligned multi-column page pruning (round 7) ---


def _write_table3(tmp_path, n=10000, page_rows=500, name="rt3.parquet",
                  base=0):
    ids = np.arange(base, base + n, dtype=np.int64)
    vals = (ids * 7 % 1000).astype(np.int64)
    strs = po.flat_strings([f"s{i:06d}" for i in range(base, base + n)])
    path = str(tmp_path / name)
    po.write_table(
        path,
        [
            ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
            ("v", "int64", "PLAIN", vals, None),
            ("s", "utf8", "AUTO", strs, None),
        ],
        page_size_rows=page_rows,
    )
    return path


def test_read_table_pruned_aligned_columns(tmp_path):
    """The predicate column's surviving pages drive the row selection;
    every other column decodes only intersecting pages and slices to the
    exact residual rows (values AND row alignment exact)."""
    path = _write_table3(tmp_path)
    tab, pr, pt = pc.read_table_pruned(
        path, ("id", 2000, 2999), columns=["id", "v", "s"]
    )
    assert pr < pt  # pages actually skipped
    ids, valid = tab["id"]
    assert np.array_equal(ids, np.arange(2000, 3000)) and valid.all()
    assert np.array_equal(tab["v"][0], np.arange(2000, 3000) * 7 % 1000)
    assert tab["s"][0][0] == b"s002000" and tab["s"][0][-1] == b"s002999"


def test_read_table_pruned_string_predicate(tmp_path):
    """str bounds on a UTF8 column normalize to bytes at the API boundary
    (r6 ADVICE #4) instead of raising inside bisect."""
    path = _write_table3(tmp_path)
    tab, pr, pt = pc.read_table_pruned(
        path, ("s", "s000100", "s000199"), columns=["s", "id"]
    )
    assert len(tab["id"][0]) == 100 and pr < pt
    assert np.array_equal(tab["id"][0], np.arange(100, 200))


def test_read_table_pruned_wrong_predicate_type(tmp_path):
    path = _write_table3(tmp_path)
    with pytest.raises(TypeError, match="must be str or bytes"):
        pc.read_table_pruned(path, ("s", 5, 9), columns=["s"])
    with pytest.raises(TypeError, match="must be numeric"):
        pc.read_table_pruned(path, ("id", "5", "9"), columns=["id"])


def test_read_table_pruned_nulls_fail_predicate(tmp_path):
    """SQL range semantics: NULL predicate values never match, and the
    non-predicate columns stay row-aligned through the null gaps."""
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    valid = np.ones(n, bool)
    valid[1100:1200] = False
    path = str(tmp_path / "nulls3.parquet")
    po.write_table(
        path,
        [
            ("id", "int64", "PLAIN", ids, valid),
            ("v", "int64", "PLAIN", ids * 3, None),
        ],
        page_size_rows=500,
    )
    tab, pr, pt = pc.read_table_pruned(
        path, ("id", 1000, 1999), columns=["id", "v"]
    )
    got = tab["id"][0]
    want = np.concatenate([np.arange(1000, 1100), np.arange(1200, 2000)])
    assert np.array_equal(got, want)
    assert np.array_equal(tab["v"][0], want * 3)


def test_read_table_pruned_multi_row_group(tmp_path):
    """A fully-pruned row group contributes zero rows and zero decoded
    pages; a partially-pruned one contributes its exact slice."""
    ids = np.arange(8000, dtype=np.int64)
    path = str(tmp_path / "rg3.parquet")
    po.write_table(
        path,
        [
            ("id", "int64", "PLAIN", ids, None),
            ("v", "int64", "PLAIN", ids + 7, None),
        ],
        row_group_size=4000,
        page_size_rows=1000,
    )
    tab, pr, pt = pc.read_table_pruned(
        path, ("id", 6500, 6600), columns=["id", "v"]
    )
    assert np.array_equal(tab["id"][0], np.arange(6500, 6601))
    assert np.array_equal(tab["v"][0], np.arange(6507, 6608))
    # group 0: predicate column's 4 pages consulted, 0 decoded; group 1:
    # 1 of 4 decoded per column
    assert pr == 2 and pt == 16


def test_read_table_pruned_no_index_fallback(tmp_path):
    """A NaN page suppresses the float column's ColumnIndex: the pruned
    read falls back to whole-chunk decode + residual filter (correct
    rows, no page skipped) instead of failing."""
    vals = np.arange(2000, dtype=np.float64)
    vals[1500] = np.nan
    path = str(tmp_path / "nanp.parquet")
    po.write_table(
        path,
        [
            ("f", "float64", "PLAIN", vals, None),
            ("id", "int64", "PLAIN", np.arange(2000, dtype=np.int64), None),
        ],
        page_size_rows=500,
    )
    tab, pr, pt = pc.read_table_pruned(
        path, ("f", 100.0, 109.0), columns=["f", "id"]
    )
    assert np.array_equal(tab["id"][0], np.arange(100, 110))
    assert np.array_equal(tab["f"][0], np.arange(100.0, 110.0))


def test_distributed_pruned_read(tmp_path, spark):
    """read_parquet_with_engine(predicate=...): row groups excluded by
    footer stats never become tasks (prune_report), surviving units skip
    pages (the _pages_read/_pages_total columns), and the returned rows
    are exactly the WHERE rows."""
    paths = [
        _write_table3(tmp_path, n=5000, base=f * 5000,
                      name=f"part{f}.parquet")
        for f in range(4)
    ]
    rep: dict = {}
    df = pc.read_parquet_with_engine(
        spark, paths, columns=["id", "v"],
        predicate=("id", 6000, 6499), prune_stats=True, prune_report=rep,
    )
    pdf = df.toPandas().sort_values("id")
    assert rep == {"rg_total": 4, "rg_planned": 1}
    assert pdf["id"].tolist() == list(range(6000, 6500))
    assert (pdf["v"] == pdf["id"] * 7 % 1000).all()
    assert (pdf["_pages_read"] < pdf["_pages_total"]).all()


# --- null_counts optional-field parity + DECIMAL typed bounds (round 7) ---


def test_null_counts_optional_field_parity(tmp_path):
    """null_counts is OPTIONAL in parquet.thrift (VERDICT r6 #6): the
    engine writes it with real per-page values (pyarrow acknowledges the
    index, this reader returns the exact counts), and the engine's parser
    returns None — not zeros — when a foreign writer omitted the field,
    so absent never masquerades as all-zero."""
    import pyarrow.parquet as pq

    n = 3000
    vals = np.arange(n, dtype=np.int64)
    valid = np.ones(n, bool)
    valid[100:200] = False
    path = str(tmp_path / "nc.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN", vals, valid)],
        page_size_rows=1000,
    )
    md = pq.ParquetFile(path).metadata.row_group(0).column(0)
    assert md.has_column_index  # pyarrow 16 exposes presence, not values
    info = pc.read_file_info(path)
    locs, ci = pc.read_page_index(path, info.columns[0])
    assert ci["null_counts"] == [100, 0, 0]
    # pyarrow-written index round-trips identically through this parser
    import pyarrow as pa

    pa_path = str(tmp_path / "pa.parquet")
    arr = pa.array(
        [None if 100 <= i < 200 else i for i in range(n)], pa.int64()
    )
    pq.write_table(
        pa.table({"x": arr}),
        pa_path,
        write_page_index=True,
        data_page_size=4096,
    )
    info2 = pc.read_file_info(pa_path)
    _, ci2 = pc.read_page_index(pa_path, info2.columns[0])
    assert ci2["null_counts"] is not None
    assert sum(ci2["null_counts"]) == 100
    # omission: a ColumnIndex without field 5 parses to None
    blob = po._tstruct(
        [
            (1, 9, (1, [False])),
            (2, 9, (8, [b"\x01"])),
            (3, 9, (8, [b"\x09"])),
            (4, 5, 1),
        ]
    )
    parsed = pc._parse_column_index(blob)
    assert parsed["null_counts"] is None
    assert parsed["null_pages"] == [False]


def test_decimal_typed_bounds(tmp_path):
    """DECIMAL logical-type read surface: scale/precision parsed from
    both the legacy converted-type fields and the modern LogicalType
    union; FLBA ColumnIndex bounds decode to exact Decimals; the
    index-parquet CLI prints them typed instead of raw bytes."""
    import decimal
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [
        decimal.Decimal("12.34"),
        decimal.Decimal("-0.07"),
        decimal.Decimal("99999.99"),
        None,
    ]
    t = pa.table({"d": pa.array(vals, pa.decimal128(9, 2))})
    path = str(tmp_path / "dec.parquet")
    pq.write_table(t, path, write_page_index=True)
    c = pc.read_file_info(path).columns[0]
    assert (c.conv, c.scale, c.precision, c.phys) == (5, 2, 9, "flba")
    locs, ci = pc.read_page_index(path, c)
    assert pc.decimal_value(
        bytes(ci["mins"][0]), c.phys, c.scale
    ) == decimal.Decimal("-0.07")
    assert pc.decimal_value(
        bytes(ci["maxs"][0]), c.phys, c.scale
    ) == decimal.Decimal("99999.99")
    out = subprocess.run(
        [sys.executable, "-m", "engine.cli", "index-parquet", path],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "decimal(9,2)/flba" in out.stdout
    assert "min=-0.07 max=99999.99" in out.stdout
    # int-backed decimals scale through the same helper
    assert pc.decimal_value(123456, "int64", 2) == decimal.Decimal(
        "1234.56"
    )
    assert pc.decimal_value(-7, "int32", 3) == decimal.Decimal("-0.007")


def test_prune_stats_requires_predicate(tmp_path, spark):
    """prune_stats without a predicate is a driver-side ValueError, not
    an opaque executor crash (r7 review #5)."""
    path = _write_table3(tmp_path, n=100, name="ps.parquet")
    with pytest.raises(ValueError, match="requires a predicate"):
        pc.read_parquet_with_engine(
            spark, [path], columns=["id"], prune_stats=True
        )


def test_pruned_fallback_counts_pages_as_read(tmp_path):
    """A predicate column without a usable ColumnIndex decodes all of its
    own pages (counted as READ, not 0/0 — r7 review #6), but the OTHER
    requested columns still page-prune: the residual filter runs before
    their decode, so they fetch only the pages covering surviving rows."""
    vals = np.arange(2000, dtype=np.float64)
    vals[1500] = np.nan  # suppresses the float column's ColumnIndex
    path = str(tmp_path / "nanc.parquet")
    po.write_table(
        path,
        [
            ("f", "float64", "PLAIN", vals, None),
            ("id", "int64", "PLAIN", np.arange(2000, dtype=np.int64), None),
        ],
        page_size_rows=500,
    )
    tab, pr, pt = pc.read_table_pruned(
        path, ("f", 100.0, 109.0), columns=["f", "id"]
    )
    assert np.array_equal(tab["id"][0], np.arange(100, 110))
    assert np.array_equal(tab["f"][0], np.arange(100.0, 110.0))
    # f: 4/4 read (no index); id: 1/4 (rows 100..109 live in one page)
    assert (pr, pt) == (5, 8)


def test_short_invalid_utf8_max_dropped(tmp_path):
    """A SHORT undecodable max on a declared-UTF8 column is dropped from
    the stats like the long case (r7 review #3), while the valid min is
    kept independently (r6 ADVICE #1) — readers must never see invalid
    UTF-8 in string statistics, whatever garbage the data itself carries
    (the VALUES here are the upstream producer's bug; the stats are
    ours). The footer stays parseable by pyarrow."""
    import pyarrow.parquet as pq

    lens = np.array([2, 3], np.int64)
    data = b"\xff\xfe" + b"abc"  # max sorts as the invalid bytes
    path = str(tmp_path / "shortbad.parquet")
    po.write_table(path, [("t", "utf8", "PLAIN", (lens, data), None)])
    info = pc.read_file_info(path)
    col = info.columns[0]
    assert col.stats_max is None  # invalid max omitted
    assert col.stats_min == b"abc"  # valid min kept (independent bounds)
    st = pq.ParquetFile(path).metadata.row_group(0).column(0).statistics
    # pyarrow quirk: it reports has_min_max for one-sided stats, mapping
    # the absent max to ''. Harmless here — this writer emits one-sided
    # stats only when the column DATA is already invalid UTF-8 (a file
    # string readers reject wholesale); the engine's own _rg_may_match
    # prunes on whichever bound exists and never fabricates the other.
    assert st.min == "abc"
    assert st.null_count == 0


def test_read_table_pruned_conjunction(tmp_path):
    """Multiple predicates AND together (r7): each predicate column's
    surviving pages intersect BEFORE any decode, residuals AND, and the
    result matches the exact WHERE — with fewer pages decoded than
    either predicate alone when the ranges cross-narrow."""
    n = 10000
    ids = np.arange(n, dtype=np.int64)
    vals = (ids % 100).astype(np.int64)
    path = str(tmp_path / "conj.parquet")
    po.write_table(
        path,
        [
            ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
            ("v", "int64", "PLAIN", vals, None),
            ("w", "int64", "PLAIN", ids * 3, None),
        ],
        page_size_rows=500,
    )
    tab, pr, pt = pc.read_table_pruned(
        path,
        [("id", 2000, 2999), ("v", 10, 19)],
        columns=["id", "v", "w"],
    )
    want = [i for i in range(2000, 3000) if 10 <= i % 100 <= 19]
    assert tab["id"][0].tolist() == want
    assert tab["v"][0].tolist() == [i % 100 for i in want]
    assert tab["w"][0].tolist() == [i * 3 for i in want]
    assert pr < pt
    # duplicate-column conjunction (two ranges on one column) intersects
    tab2, _, _ = pc.read_table_pruned(
        path, [("id", 2000, 5000), ("id", 4800, 9000)], columns=["id"]
    )
    assert tab2["id"][0].tolist() == list(range(4800, 5001))
    # contradictory ranges -> empty, no crash
    tab3, pr3, pt3 = pc.read_table_pruned(
        path, [("id", 100, 200), ("id", 5000, 6000)], columns=["id", "w"]
    )
    assert len(tab3["id"][0]) == 0 and pr3 == 0 and pt3 > 0


def test_distributed_pruned_read_conjunction(tmp_path, spark):
    """The distributed read accepts the list predicate form: plan-phase
    row-group pruning applies when ANY conjunct's footer stats exclude a
    group, and tasks return the exact conjunctive WHERE rows."""
    paths = [
        _write_table3(tmp_path, n=5000, base=f * 5000,
                      name=f"cpart{f}.parquet")
        for f in range(4)
    ]
    rep: dict = {}
    df = pc.read_parquet_with_engine(
        spark, paths, columns=["id", "v"],
        predicate=[("id", 6000, 7999), ("v", 100, 199)],
        prune_stats=True, prune_report=rep,
    )
    pdf = df.toPandas().sort_values("id")
    assert rep == {"rg_total": 4, "rg_planned": 1}
    want = [i for i in range(6000, 8000) if 100 <= i * 7 % 1000 <= 199]
    assert pdf["id"].tolist() == want
    assert (pdf["_pages_read"] < pdf["_pages_total"]).all()


def test_dictionary_filtering_prunes_value_gaps(tmp_path):
    """Dictionary filtering (PARQUET-384): a pure-dict chunk whose
    dictionary holds no value in the predicate range skips entirely —
    even when min/max stats ADMIT the range (the gap case stats cannot
    see) — for the price of one dictionary-page read."""
    n = 4000
    # values cluster at 0-99 and 900-999: stats say [0, 999] but the
    # range [400, 499] has NO dictionary value
    vals = np.where(np.arange(n) % 2 == 0,
                    np.arange(n) % 100,
                    900 + np.arange(n) % 100).astype(np.int64)
    path = str(tmp_path / "gap.parquet")
    po.write_table(
        path,
        [
            ("v", "int64", "PLAIN_DICTIONARY", vals, None),
            ("id", "int64", "PLAIN", np.arange(n, dtype=np.int64), None),
        ],
        page_size_rows=1000,
    )
    tab, pr, pt = pc.read_table_pruned(
        path, ("v", 400, 499), columns=["v", "id"]
    )
    assert len(tab["v"][0]) == 0
    assert pr == 0  # not one data page decoded
    # a range the dictionary CAN satisfy still reads normally
    tab2, pr2, _ = pc.read_table_pruned(
        path, ("v", 50, 60), columns=["v", "id"]
    )
    # even row indices carry i % 100 (so only even values land in range)
    assert sorted(set(tab2["v"][0].tolist())) == [50, 52, 54, 56, 58, 60]
    assert pr2 > 0
    # string dictionaries take the same path
    strs = po.flat_strings(
        ["aa", "ab", "zz", "zy"] * 1000
    )
    path2 = str(tmp_path / "gaps.parquet")
    po.write_table(
        path2,
        [("s", "utf8", "PLAIN_DICTIONARY", strs, None)],
        page_size_rows=1000,
    )
    tab3, pr3, _ = pc.read_table_pruned(
        path2, ("s", "mm", "nn"), columns=["s"]
    )
    assert len(tab3["s"][0]) == 0 and pr3 == 0


def test_in_list_predicate(tmp_path):
    """IN-list predicates ('col', 'in', values): point lookups prune via
    the member set at every layer — row-group stats, per-page refinement
    (a page whose [min,max] brackets a member GAP skips), dictionary
    filtering, and exact residual membership — and compose with ranges."""
    n = 10000
    ids = np.arange(n, dtype=np.int64)
    strs = po.flat_strings([f"s{i:06d}" for i in range(n)])
    path = str(tmp_path / "in.parquet")
    po.write_table(
        path,
        [
            ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
            ("s", "utf8", "AUTO", strs, None),
        ],
        page_size_rows=500,
    )
    want = [17, 3051, 3055, 9977]
    tab, pr, pt = pc.read_table_pruned(
        path, ("id", "in", want), columns=["id", "s"]
    )
    assert tab["id"][0].tolist() == want
    assert [x.decode() for x in tab["s"][0]] == [f"s{i:06d}" for i in want]
    # 3 pages hold the 4 ids (3051/3055 share one); pages between the
    # envelope ends must NOT decode (the per-page member refinement)
    assert pr == 2 * 3  # 3 pages per column
    # string IN-list through the same path
    tab2, pr2, _ = pc.read_table_pruned(
        path, ("s", "in", ["s000017", "s009977"]), columns=["id"]
    )
    assert tab2["id"][0].tolist() == [17, 9977]
    # IN composed with a range conjunct
    tab3, _, _ = pc.read_table_pruned(
        path,
        [("id", "in", want), ("id", 3000, 9000)],
        columns=["id"],
    )
    assert tab3["id"][0].tolist() == [3051, 3055]
    # members entirely in a value gap prune everything
    path2 = str(tmp_path / "ingap.parquet")
    gap = np.where(np.arange(n) % 2 == 0, np.arange(n) % 100,
                   900 + np.arange(n) % 100).astype(np.int64)
    po.write_table(
        path2,
        [("v", "int64", "PLAIN_DICTIONARY", gap, None)],
        page_size_rows=1000,
    )
    tab4, pr4, _ = pc.read_table_pruned(
        path2, ("v", "in", [400, 500]), columns=["v"]
    )
    assert len(tab4["v"][0]) == 0 and pr4 == 0  # dictionary filtering
    with pytest.raises(ValueError, match="empty IN-list"):
        pc.read_table_pruned(path, ("id", "in", []), columns=["id"])


def test_dictionary_filtering_v2_via_encoding_stats(tmp_path):
    """v2 files list PLAIN in chunk encodings for the DICT page itself;
    PageEncodingStats (field 13) disambiguates, so dictionary filtering
    engages on v2 pure-dict chunks too (r7 review pass 3 #3) — and a
    genuinely mixed chunk (mid-chunk fallback) correctly bypasses it."""
    n = 4000
    gap = np.where(np.arange(n) % 2 == 0, np.arange(n) % 100,
                   900 + np.arange(n) % 100).astype(np.int64)
    path = str(tmp_path / "gap2.parquet")
    po.write_table(
        path,
        [("v", "int64", "PLAIN_DICTIONARY", gap, None)],
        page_size_rows=1000,
        data_page_version=2,
    )
    tab, pr, _ = pc.read_table_pruned(path, ("v", 400, 499), columns=["v"])
    assert len(tab["v"][0]) == 0 and pr == 0
    # mixed dict+PLAIN chunk: dict filtering must NOT engage (PLAIN pages
    # can hold values outside the dictionary)
    strs = [f"k{i % 30}" if i < 3000 else f"u-{i:08d}-{'x' * 40}"
            for i in range(6000)]
    path2 = str(tmp_path / "mixed2.parquet")
    po.write_table(
        path2,
        [("s", "utf8", "PLAIN_DICTIONARY", po.flat_strings(strs), None)],
        page_size_rows=1000,
        dict_page_size_limit=2048,
    )
    tab2, _, _ = pc.read_table_pruned(
        path2, ("s", "u-00004000", "u-00004999"), columns=["s"]
    )
    # PLAIN-page values survive ("u-00004999-x..." sorts past the upper
    # bound, so 4000..4998 match)
    assert len(tab2["s"][0]) == 999


def test_in_list_edge_cases(tmp_path):
    """Range with lo == 'in' stays expressible (str is not a member
    collection); NaN members drop (SQL: NaN = NaN is false); all-NaN
    IN-lists match nothing without crashing; None members fail clean."""
    strs = po.flat_strings(["im", "in", "inn", "io", "ip"])
    path = str(tmp_path / "inrange.parquet")
    po.write_table(path, [("w", "utf8", "PLAIN", strs, None)])
    tab, _, _ = pc.read_table_pruned(path, ("w", "in", "io"), columns=["w"])
    assert [x.decode() for x in tab["w"][0]] == ["in", "inn", "io"]
    fpath = str(tmp_path / "floats.parquet")
    po.write_table(
        fpath,
        [("f", "float64", "PLAIN",
          np.array([1.0, 2.0, 3.0], np.float64), None)],
    )
    tab2, _, _ = pc.read_table_pruned(
        fpath, ("f", "in", [float("nan"), 2.0]), columns=["f"]
    )
    assert tab2["f"][0].tolist() == [2.0]
    tab3, pr3, _ = pc.read_table_pruned(
        fpath, ("f", "in", [float("nan")]), columns=["f"]
    )
    assert len(tab3["f"][0]) == 0 and pr3 == 0
    with pytest.raises(ValueError, match="contains None"):
        pc.read_table_pruned(fpath, ("f", "in", [None, 2.0]), columns=["f"])


def test_in_list_row_group_pruning(tmp_path, spark):
    """IN members entirely inside a row group's stats GAP prune the
    group at PLAN time (the member-set check in _rg_may_match)."""
    paths = []
    for f in range(3):
        p = str(tmp_path / f"g{f}.parquet")
        ids = np.arange(f * 1000, f * 1000 + 1000, dtype=np.int64)
        po.write_table(
            p, [("id", "int64", "PLAIN", ids, None)], page_size_rows=250
        )
        paths.append(p)
    rep: dict = {}
    df = pc.read_parquet_with_engine(
        spark, paths, columns=["id"],
        predicate=("id", "in", [1500, 1777]),
        prune_stats=True, prune_report=rep,
    )
    pdf = df.toPandas()
    assert rep == {"rg_total": 3, "rg_planned": 1}
    assert sorted(pdf["id"].tolist()) == [1500, 1777]


def test_or_group_predicates(tmp_path, spark):
    """CNF pushdown: inner lists OR their branches (possibly across
    DIFFERENT columns), outer list ANDs the groups — page spans union
    within a group, residuals OR, and plan-phase row-group pruning only
    drops a group when EVERY branch excludes it."""
    n = 10000
    ids = np.arange(n, dtype=np.int64)
    vals = (ids % 100).astype(np.int64)
    path = str(tmp_path / "cnf.parquet")
    po.write_table(
        path,
        [
            ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
            ("v", "int64", "PLAIN", vals, None),
        ],
        page_size_rows=500,
    )
    # (id in [100,199] OR id in [9000,9099]) AND v in [10,19]
    tab, pr, pt = pc.read_table_pruned(
        path,
        [[("id", 100, 199), ("id", 9000, 9099)], ("v", 10, 19)],
        columns=["id", "v"],
    )
    want = [i for i in list(range(100, 200)) + list(range(9000, 9100))
            if 10 <= i % 100 <= 19]
    assert tab["id"][0].tolist() == want
    assert pr < pt  # both disjoint id spans decode, the middle skips
    # cross-column OR: id < 50 OR v == 7
    tab2, _, _ = pc.read_table_pruned(
        path,
        [[("id", 0, 49), ("v", 7, 7)]],
        columns=["id"],
    )
    want2 = sorted(set(range(50)) | {i for i in range(n) if i % 100 == 7})
    assert tab2["id"][0].tolist() == want2
    # distributed: a file survives planning if ANY branch admits it
    paths = [
        _write_table3(tmp_path, n=2000, base=f * 2000,
                      name=f"or{f}.parquet")
        for f in range(4)
    ]
    rep: dict = {}
    df = pc.read_parquet_with_engine(
        spark, paths, columns=["id"],
        predicate=[[("id", 500, 599), ("id", 6500, 6599)]],
        prune_stats=True, prune_report=rep,
    )
    pdf = df.toPandas()
    assert rep == {"rg_total": 4, "rg_planned": 2}
    assert sorted(pdf["id"].tolist()) == (
        list(range(500, 600)) + list(range(6500, 6600))
    )
