"""STRUCT (group) columns in the parquet interchange writer: the engine
writes real parquet groups — ``optional group name { scalar leaves }``
with two-level definition levels — readable as ``struct<...>`` by
pyarrow, DuckDB, Spark's JVM reader, and leaf-wise by the engine's own
foreign-parquet reader. The reference writes the same shape through its
SchemaDescriptor + per-leaf column writers (src/schema/types.rs,
src/column/writer.rs:304-345)."""

import numpy as np
import pytest

from engine import parquet_compat as pc
from engine import parquet_out as po


def _struct_fixture(n=1200, seed=7):
    rng = np.random.default_rng(seed)
    sv = rng.random(n) > 0.15  # struct validity
    width = rng.integers(0, 3000, n).astype(np.int32)
    wv = rng.random(n) > 0.2  # width validity (ignored where struct null)
    langs = np.array(["en", "fr", "de", "zh"])[rng.integers(0, 4, n)]
    lv = rng.random(n) > 0.1
    score = rng.standard_normal(n)
    lens, data = po.flat_strings(langs[sv & lv])
    cols = [
        ("doc_id", "int64", "AUTO", np.arange(n, dtype=np.int64), None),
        (
            "meta",
            "struct",
            "AUTO",
            [
                ("width", "int32", "AUTO", width, wv),
                ("lang", "utf8", "AUTO", (lens, data), lv),
                ("score", "float64", "PLAIN", score, None),
            ],
            sv,
        ),
    ]
    return cols, dict(n=n, sv=sv, width=width, wv=wv, langs=langs, lv=lv,
                      score=score)


def _check_rows(meta_rows, f):
    for i in range(f["n"]):
        if not f["sv"][i]:
            assert meta_rows[i] is None
            continue
        row = meta_rows[i]
        assert row["width"] == (int(f["width"][i]) if f["wv"][i] else None)
        assert row["lang"] == (str(f["langs"][i]) if f["lv"][i] else None)
        assert abs(row["score"] - f["score"][i]) < 1e-12


@pytest.mark.parametrize(
    "version,rgs,pr,codec",
    [(1, None, None, None), (2, 256, 64, "snappy"), (1, 300, 100, "gzip"),
     (2, None, None, "zstd")],
)
def test_pyarrow_reads_struct_column(tmp_path, version, rgs, pr, codec):
    import pyarrow.parquet as pq

    cols, f = _struct_fixture()
    path = str(tmp_path / "s.parquet")
    po.write_table(path, cols, codec=codec, data_page_version=version,
                   row_group_size=rgs, page_size_rows=pr)
    t = pq.read_table(path)
    assert t.column("doc_id").to_pylist() == list(range(f["n"]))
    _check_rows(t.column("meta").to_pylist(), f)


def test_duckdb_reads_struct_column(tmp_path):
    import duckdb

    cols, f = _struct_fixture()
    path = str(tmp_path / "s.parquet")
    po.write_table(path, cols, codec="snappy", row_group_size=500)
    got = duckdb.sql(
        "select count(*), count(meta), sum(meta.width), max(meta.lang) "
        f"from read_parquet('{path}')"
    ).fetchone()
    assert got[0] == f["n"]
    assert got[1] == int(f["sv"].sum())
    assert got[2] == int(f["width"][f["sv"] & f["wv"]].sum())


def test_spark_jvm_reads_struct_column(spark, tmp_path):
    cols, f = _struct_fixture(400)
    path = str(tmp_path / "s.parquet")
    po.write_table(path, cols, codec="snappy")
    df = spark.read.parquet(path).orderBy("doc_id")
    assert [t[0] for t in df.dtypes] == ["doc_id", "meta"]
    assert dict(df.dtypes)["meta"] == "struct<width:int,lang:string,score:double>"
    rows = df.collect()
    meta_rows = [
        None if r["meta"] is None else r["meta"].asDict() for r in rows
    ]
    _check_rows(meta_rows, f)


def test_required_struct_and_required_fields(tmp_path):
    import pyarrow.parquet as pq

    n = 50
    a = np.arange(n, dtype=np.int64)
    av = np.ones(n, bool)
    av[::7] = False
    lens, data = po.flat_strings([f"s{i}" for i in range(n)])
    cols = [
        (
            "st",
            "struct",
            "AUTO",
            [("a", "int64", "AUTO", a, av), ("b", "utf8", "PLAIN",
                                             (lens, data), None)],
            None,
        )
    ]
    path = str(tmp_path / "r.parquet")
    po.write_table(path, cols)
    m = pq.read_table(path).column("st").to_pylist()
    for i in range(n):
        assert m[i]["a"] == (int(a[i]) if av[i] else None)
        assert m[i]["b"] == f"s{i}"


def test_all_null_struct_row_group(tmp_path):
    import pyarrow.parquet as pq

    sv = np.zeros(20, bool)
    sv[10:] = True
    w = np.arange(20, dtype=np.int32)
    cols = [("m", "struct", "AUTO", [("w", "int32", "AUTO", w, None)], sv)]
    path = str(tmp_path / "n.parquet")
    po.write_table(path, cols, row_group_size=10, codec="gzip")
    m = pq.read_table(path).column("m").to_pylist()
    assert m[:10] == [None] * 10
    assert [r["w"] for r in m[10:]] == list(range(10, 20))


def test_engine_compat_reader_sees_struct_leaf_levels(tmp_path):
    n = 40
    sv = np.ones(n, bool)
    sv[::5] = False
    w = np.arange(n, dtype=np.int32)
    wv = np.ones(n, bool)
    wv[::3] = False
    cols = [("m", "struct", "AUTO", [("w", "int32", "AUTO", w, wv)], sv)]
    path = str(tmp_path / "c.parquet")
    po.write_table(path, cols, codec="snappy")
    info = pc.read_file_info(path)
    (col,) = info.columns
    assert col.path == "m.w"
    assert col.max_def == 2 and col.max_rep == 0
    vals, defs, reps = pc.read_column_with_levels(path, col)
    present = sv & wv
    assert (defs == sv.astype(int) + present.astype(int)).all()
    assert (np.asarray(vals) == w[present]).all()


def test_struct_input_validation(tmp_path):
    n = 10
    w = np.arange(n, dtype=np.int32)
    path = str(tmp_path / "v.parquet")
    with pytest.raises(ValueError, match="non-empty field list"):
        po.write_table(path, [("m", "struct", "AUTO", [], None)])
    with pytest.raises(ValueError, match="nested"):
        po.write_table(
            path,
            [("m", "struct", "AUTO",
              [("x", "list<int32>", "AUTO", None, None)], None)],
        )
    with pytest.raises(ValueError, match="rows"):
        po.write_table(
            path,
            [("m", "struct", "AUTO",
              [("x", "int32", "AUTO", w[:5], None)], np.ones(n, bool))],
        )
    with pytest.raises(ValueError, match="dense over"):
        lens, data = po.flat_strings(["a", "b", "c"])
        po.write_table(
            path,
            [("m", "struct", "AUTO",
              [("x", "utf8", "AUTO", (lens, data), None)],
              np.array([True, False]))],
        )


def test_struct_leaf_statistics_and_page_index(tmp_path):
    import pyarrow.parquet as pq

    n = 400
    sv = np.ones(n, bool)
    sv[:50] = False
    w = np.arange(n, dtype=np.int32)
    cols = [("m", "struct", "AUTO", [("w", "int32", "AUTO", w, None)], sv)]
    path = str(tmp_path / "st.parquet")
    po.write_table(path, cols, page_size_rows=100)
    md = pq.ParquetFile(path).metadata
    st = md.row_group(0).column(0).statistics
    assert st.null_count == 50  # struct-null rows count as leaf nulls
    assert st.min == 50 and st.max == n - 1
    # PageIndex written for the struct leaf (page-grained pruning inputs)
    (col,) = pc.read_file_info(path).columns
    assert col.ci_off is not None and col.oi_off is not None
    assert pq.read_table(path).num_rows == n
