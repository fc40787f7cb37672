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
