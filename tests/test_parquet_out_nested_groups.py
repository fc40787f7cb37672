"""Repeated-GROUP columns in the parquet interchange writer — LIST of
STRUCT (``array<struct<...>>``) and MAP (``map<k,v>``) — with nulls at
every level (null row / empty list / null element struct / null field),
read back by pyarrow, DuckDB and Spark's JVM reader. Definition levels
follow the Dremel optional-ancestor accounting the reference applies in
src/column/writer.rs:304-345."""

import numpy as np
import pytest

from engine import parquet_out as po


def _list_struct_fixture(n=500, seed=3):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 5, n)
    rv = rng.random(n) > 0.1
    counts[~rv] = 0
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    ne = int(offsets[-1])
    sv = rng.random(ne) > 0.2
    x = rng.integers(0, 1000, ne).astype(np.int32)
    xv = rng.random(ne) > 0.3
    tags = np.array(["a", "bb", "ccc"])[rng.integers(0, 3, ne)]
    lens, data = po.flat_strings(tags[sv])
    cols = [
        ("rid", "int64", "AUTO", np.arange(n, dtype=np.int64), None),
        (
            "events",
            "list<struct>",
            "AUTO",
            (
                offsets,
                [
                    ("x", "int32", "AUTO", x[sv & xv], xv),
                    ("tag", "utf8", "AUTO", (lens, data), None),
                ],
                sv,
            ),
            rv,
        ),
    ]
    return cols, dict(n=n, rv=rv, offsets=offsets, ne=ne, sv=sv, x=x,
                      xv=xv, tags=tags)


def _check_list_struct_rows(ev, f):
    for i in range(f["n"]):
        if not f["rv"][i]:
            assert ev[i] is None
            continue
        lo, hi = f["offsets"][i], f["offsets"][i + 1]
        assert len(ev[i]) == hi - lo
        for j, e in zip(range(lo, hi), ev[i]):
            if not f["sv"][j]:
                assert e is None
                continue
            assert e["x"] == (int(f["x"][j]) if f["xv"][j] else None)
            assert e["tag"] == str(f["tags"][j])


@pytest.mark.parametrize(
    "version,rgs,pr,codec",
    [(1, None, None, None), (2, 128, 40, "snappy"), (1, 200, 64, "zstd")],
)
def test_pyarrow_reads_list_of_struct(tmp_path, version, rgs, pr, codec):
    import pyarrow.parquet as pq

    cols, f = _list_struct_fixture()
    path = str(tmp_path / "ls.parquet")
    po.write_table(path, cols, codec=codec, data_page_version=version,
                   row_group_size=rgs, page_size_rows=pr)
    _check_list_struct_rows(pq.read_table(path).column("events").to_pylist(), f)


def test_duckdb_reads_list_of_struct(tmp_path):
    import duckdb

    cols, f = _list_struct_fixture()
    path = str(tmp_path / "ls.parquet")
    po.write_table(path, cols, codec="snappy", row_group_size=150)
    r = duckdb.sql(
        "select count(*), sum(len(events)) from "
        f"read_parquet('{path}') where events is not null"
    ).fetchone()
    assert r[0] == int(f["rv"].sum()) and r[1] == f["ne"]
    s = duckdb.sql(
        "select sum(e.x) from (select unnest(events) e from "
        f"read_parquet('{path}'))"
    ).fetchone()
    assert s[0] == int(f["x"][f["sv"] & f["xv"]].sum())


def test_spark_jvm_reads_list_of_struct_and_map(spark, tmp_path):
    cols, f = _list_struct_fixture(300)
    mf = _map_fixture(300)
    path = str(tmp_path / "lm.parquet")
    po.write_table(path, cols + [mf[0]], codec="snappy")
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["events"] == "array<struct<x:int,tag:string>>"
    assert dict(df.dtypes)["attrs"] == "map<string,bigint>"
    from pyspark.sql import functions as F

    got = df.where(F.col("events").isNotNull()).select(
        F.sum(F.size("events")).alias("ev"),
        F.sum(
            F.aggregate(
                F.filter(
                    F.col("events"),
                    lambda e: e.isNotNull() & e["x"].isNotNull(),
                ),
                F.lit(0).cast("long"),
                lambda a, e: a + e["x"].cast("long"),
            )
        ).alias("xs"),
    ).first()
    assert got["ev"] == f["ne"]
    assert got["xs"] == int(f["x"][f["sv"] & f["xv"]].sum())
    mk = (
        df.where(F.col("attrs").isNotNull())
        .select(F.sum(F.size(F.map_keys("attrs"))).alias("mk"))
        .first()["mk"]
    )
    assert mk == mf[1]["ne"]


def _map_fixture(n=300, seed=5):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 4, n)
    rv = rng.random(n) > 0.15
    counts[~rv] = 0
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    ne = int(offsets[-1])
    keys = [f"k{j % 9}" for j in range(ne)]
    vals = rng.integers(0, 10**6, ne).astype(np.int64)
    vv = rng.random(ne) > 0.25
    col = (
        "attrs",
        "map<utf8,int64>",
        "AUTO",
        (offsets, po.flat_strings(keys), vals[vv], vv),
        rv,
    )
    return col, dict(n=n, rv=rv, offsets=offsets, ne=ne, keys=keys,
                     vals=vals, vv=vv)


@pytest.mark.parametrize("version,rgs", [(1, None), (2, 100)])
def test_pyarrow_and_duckdb_read_map(tmp_path, version, rgs):
    import duckdb
    import pyarrow.parquet as pq

    col, f = _map_fixture()
    cols = [("rid", "int64", "AUTO", np.arange(f["n"], dtype=np.int64), None),
            col]
    path = str(tmp_path / "m.parquet")
    po.write_table(path, cols, codec="snappy", data_page_version=version,
                   row_group_size=rgs)
    t = pq.read_table(path)
    assert str(t.schema.field("attrs").type).startswith("map<string, int64")
    mp = t.column("attrs").to_pylist()
    for i in range(f["n"]):
        if not f["rv"][i]:
            assert mp[i] is None
            continue
        lo, hi = f["offsets"][i], f["offsets"][i + 1]
        exp = [
            (f["keys"][j], int(f["vals"][j]) if f["vv"][j] else None)
            for j in range(lo, hi)
        ]
        assert mp[i] == exp
    r = duckdb.sql(
        "select count(*), sum(cardinality(attrs)) from "
        f"read_parquet('{path}') where attrs is not null"
    ).fetchone()
    assert r[0] == int(f["rv"].sum()) and r[1] == f["ne"]
    s = duckdb.sql(
        f"select sum(attrs['k1'][1]) from read_parquet('{path}')"
    ).fetchone()
    exp_s = int(
        sum(f["vals"][j] for j in range(f["ne"])
            if f["keys"][j] == "k1" and f["vv"][j])
    )
    assert s[0] == exp_s


def test_required_element_struct_in_list(tmp_path):
    import pyarrow.parquet as pq

    n = 40
    counts = np.tile([0, 2, 1, 3], 10)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    ne = int(offsets[-1])
    a = np.arange(ne, dtype=np.int64)
    cols = [(
        "g", "list<struct>", "AUTO",
        (offsets, [("a", "int64", "AUTO", a, None)], None), None,
    )]
    path = str(tmp_path / "req.parquet")
    po.write_table(path, cols)
    got = pq.read_table(path).column("g").to_pylist()
    k = 0
    for i in range(n):
        assert len(got[i]) == counts[i]
        for e in got[i]:
            assert e["a"] == k
            k += 1


def test_repeated_group_input_validation(tmp_path):
    path = str(tmp_path / "v.parquet")
    off = np.array([0, 1], np.int64)
    with pytest.raises(ValueError, match="nested"):
        po.write_table(path, [(
            "g", "list<struct>", "AUTO",
            (off, [("x", "struct", "AUTO", None, None)], None), None,
        )])
    with pytest.raises(ValueError, match="non-decreasing"):
        po.write_table(path, [(
            "g", "list<struct>", "AUTO",
            (np.array([0, 2, 1], np.int64),
             [("x", "int32", "AUTO", np.arange(2, dtype=np.int32), None)],
             None), None,
        )])
    with pytest.raises(ValueError, match="null rows must be empty"):
        po.write_table(path, [(
            "g", "map<utf8,int64>", "AUTO",
            (np.array([0, 1], np.int64), po.flat_strings(["k"]),
             np.array([1], np.int64), None),
            np.array([False]),
        )])
    with pytest.raises(ValueError, match="dense values"):
        po.write_table(path, [(
            "g", "list<struct>", "AUTO",
            (np.array([0, 2], np.int64),
             [("x", "int32", "AUTO", np.arange(5, dtype=np.int32), None)],
             None), None,
        )])


def test_engine_reader_round_trips_list_of_struct_and_map(tmp_path):
    """Closed loop for repeated GROUPS: engine-written array<struct> and
    map columns assembled back per-leaf by the engine's own foreign
    reader — write-side Dremel shredding and read-side record assembly
    agree on every null distinction (null row / empty / null element
    struct / null field)."""
    from engine import parquet_compat as pc

    ls_cols, f = _list_struct_fixture(n=300, seed=11)
    mcol, g = _map_fixture(n=300)
    for version in (1, 2):
        path = str(tmp_path / f"own_groups_v{version}.parquet")
        po.write_table(
            path, ls_cols + [mcol], codec="snappy",
            data_page_version=version,
        )
        t = pc.read_table(path)
        xs = t["events.list.element.x"][0]
        tags = t["events.list.element.tag"][0]
        keys = t["attrs.key_value.key"][0]
        vals = t["attrs.key_value.value"][0]
        for i in range(f["n"]):
            if not f["rv"][i]:
                assert xs[i] is None and tags[i] is None
                continue
            lo, hi = f["offsets"][i], f["offsets"][i + 1]
            assert xs[i] == [
                int(f["x"][j]) if (f["sv"][j] and f["xv"][j]) else None
                for j in range(lo, hi)
            ]
            assert tags[i] == [
                str(f["tags"][j]) if f["sv"][j] else None
                for j in range(lo, hi)
            ]
        for i in range(g["n"]):
            if not g["rv"][i]:
                assert keys[i] is None and vals[i] is None
                continue
            lo, hi = g["offsets"][i], g["offsets"][i + 1]
            assert keys[i] == [g["keys"][j] for j in range(lo, hi)]
            assert vals[i] == [
                int(g["vals"][j]) if g["vv"][j] else None
                for j in range(lo, hi)
            ]
