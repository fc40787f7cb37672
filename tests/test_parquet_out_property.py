"""Property-based interop: hypothesis-generated tables through the
engine parquet writer must read back exactly in pyarrow (the independent
reader) and the engine's own foreign reader, across encodings, page
versions, codecs, row-group splits and null patterns."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from engine import parquet_compat as pc
from engine import parquet_out as po


@st.composite
def _table(draw):
    n = draw(st.integers(min_value=1, max_value=400))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    cols = []
    expect = {}
    # int column with arbitrary encoding + optional nulls
    enc = draw(st.sampled_from(["PLAIN", "DELTA_BINARY_PACKED", "PLAIN_DICTIONARY", "AUTO"]))
    vals = rng.integers(-(2**50), 2**50, n)
    nullable = draw(st.booleans())
    valid = rng.integers(0, 3, n) > 0 if nullable else None
    cols.append(("i", "int64", enc, vals, valid))
    expect["i"] = [
        int(v) if (valid is None or ok) else None
        for v, ok in zip(vals, valid if valid is not None else np.ones(n, bool))
    ]
    # string column (dense values only where valid)
    senc = draw(st.sampled_from(
        ["PLAIN", "DELTA_LENGTH_BYTE_ARRAY", "DELTA_BYTE_ARRAY", "PLAIN_DICTIONARY", "AUTO"]
    ))
    card = draw(st.integers(1, 50))
    svals_full = [f"s-{int(v) % card:06d}" for v in rng.integers(0, card, n)]
    s_nullable = draw(st.booleans())
    s_valid = rng.integers(0, 3, n) > 0 if s_nullable else None
    dense = (
        [s for s, ok in zip(svals_full, s_valid) if ok]
        if s_valid is not None
        else svals_full
    )
    cols.append(("s", "utf8", senc, po.flat_strings(dense), s_valid))
    expect["s"] = [
        s if (s_valid is None or ok) else None
        for s, ok in zip(svals_full, s_valid if s_valid is not None else np.ones(n, bool))
    ]
    # float column
    f = rng.standard_normal(n)
    cols.append(("f", "float64", "PLAIN", f, None))
    expect["f"] = f
    codec = draw(st.sampled_from([None, "snappy", "zstd"]))
    rgs = draw(st.sampled_from([None, max(1, n // 3), 7]))
    v2 = draw(st.booleans())
    return n, cols, expect, codec, rgs, 2 if v2 else 1


@settings(max_examples=40, deadline=None)
@given(_table())
def test_random_tables_roundtrip_via_pyarrow_and_engine(tmp_path_factory, t):
    import pyarrow.parquet as pq

    n, cols, expect, codec, rgs, dpv = t
    path = str(tmp_path_factory.mktemp("prop") / "t.parquet")
    po.write_table(
        path, cols, codec=codec, row_group_size=rgs, data_page_version=dpv
    )
    tab = pq.read_table(path)
    assert tab.num_rows == n
    assert tab.column("i").to_pylist() == expect["i"]
    assert tab.column("s").to_pylist() == expect["s"]
    assert (np.asarray(tab.column("f")) == expect["f"]).all()
    ours = pc.read_table(path)
    iv, ival = ours["i"]
    got_i = [int(iv[j]) if ival[j] else None for j in range(n)]
    assert got_i == expect["i"]
    sv, sval = ours["s"]
    got_s = [sv[j].decode() if sval[j] else None for j in range(n)]
    assert got_s == expect["s"]
    fv, _ = ours["f"]
    assert (fv == expect["f"]).all()


@st.composite
def _group_table(draw):
    """Random array<struct<x,tag>> + map<utf8,int64> columns with nulls at
    every level (null row / empty / null element / null field)."""
    n = draw(st.integers(min_value=1, max_value=200))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    counts = rng.integers(0, 5, n)
    rv = rng.random(n) > 0.15
    counts[~rv] = 0
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    ne = int(offsets[-1])
    sv = rng.random(ne) > 0.2
    x = rng.integers(-(2**40), 2**40, ne)
    xv = rng.random(ne) > 0.3
    tags = np.array(["a", "bb", "ccc", ""])[rng.integers(0, 4, ne)]
    ls_col = (
        "events", "list<struct>", "AUTO",
        (offsets,
         [("x", "int64", "AUTO", x[sv & xv], xv),
          ("tag", "utf8", "AUTO", po.flat_strings(tags[sv]), None)],
         sv),
        rv,
    )
    mcounts = rng.integers(0, 4, n)
    mrv = rng.random(n) > 0.1
    mcounts[~mrv] = 0
    moffs = np.concatenate(([0], np.cumsum(mcounts))).astype(np.int64)
    me = int(moffs[-1])
    keys = [f"k{j % 7}" for j in range(me)]
    mvals = rng.integers(0, 10**9, me)
    vv = rng.random(me) > 0.25
    m_col = ("attrs", "map<utf8,int64>", "AUTO",
             (moffs, po.flat_strings(keys), mvals[vv], vv), mrv)
    codec = draw(st.sampled_from([None, "snappy", "zstd"]))
    rgs = draw(st.sampled_from([None, max(1, n // 3)]))
    v = draw(st.sampled_from([1, 2]))
    f = dict(n=n, rv=rv, offsets=offsets, sv=sv, x=x, xv=xv, tags=tags,
             mrv=mrv, moffs=moffs, keys=keys, mvals=mvals, vv=vv)
    return [ls_col, m_col], f, codec, rgs, v


@settings(max_examples=25, deadline=None)
@given(_group_table())
def test_random_group_tables_roundtrip(tmp_path_factory, t):
    """Fuzzed repeated-group tables: pyarrow (independent) and the
    engine's own reader both recover every nesting/null distinction."""
    import pyarrow.parquet as pq

    cols, f, codec, rgs, v = t
    path = str(tmp_path_factory.mktemp("grp") / "g.parquet")
    po.write_table(path, cols, codec=codec, row_group_size=rgs,
                   data_page_version=v)
    ev = pq.read_table(path).column("events").to_pylist()
    mp = pq.read_table(path).column("attrs").to_pylist()
    t2 = pc.read_table(path)
    xs = t2["events.list.element.x"][0]
    tg = t2["events.list.element.tag"][0]
    ks = t2["attrs.key_value.key"][0]
    vs = t2["attrs.key_value.value"][0]
    for i in range(f["n"]):
        lo, hi = f["offsets"][i], f["offsets"][i + 1]
        if not f["rv"][i]:
            assert ev[i] is None and xs[i] is None and tg[i] is None
        else:
            exp = [
                None if not f["sv"][j] else
                {"x": int(f["x"][j]) if f["xv"][j] else None,
                 "tag": str(f["tags"][j])}
                for j in range(lo, hi)
            ]
            assert ev[i] == exp
            assert xs[i] == [
                int(f["x"][j]) if (f["sv"][j] and f["xv"][j]) else None
                for j in range(lo, hi)
            ]
            assert tg[i] == [
                str(f["tags"][j]) if f["sv"][j] else None
                for j in range(lo, hi)
            ]
        mlo, mhi = f["moffs"][i], f["moffs"][i + 1]
        if not f["mrv"][i]:
            assert mp[i] is None and ks[i] is None and vs[i] is None
        else:
            assert mp[i] == [
                (f["keys"][j], int(f["mvals"][j]) if f["vv"][j] else None)
                for j in range(mlo, mhi)
            ]
            assert ks[i] == [f["keys"][j] for j in range(mlo, mhi)]
            assert vs[i] == [
                int(f["mvals"][j]) if f["vv"][j] else None
                for j in range(mlo, mhi)
            ]
