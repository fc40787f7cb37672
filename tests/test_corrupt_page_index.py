"""PageIndex corruption safety. The index is TRUSTED metadata (parquet
gives it no checksum; every reader prunes by whatever the stats say),
so the achievable guarantees are:

- structural corruption (unparseable thrift, impossible offsets) ->
  clean ValueError or whole-chunk fallback with EXACT results;
- value-level corruption (bytes that still parse, but the bounds LIE):
  pruning may LOSE rows — exactly as parquet-mr/arrow would on the same
  file — but the exact residual filter means the reader can never
  FABRICATE a row that fails the predicate, and every returned row
  carries its true values.
"""

import numpy as np
import pytest

from engine import parquet_compat as pc
from engine import parquet_out as po


N = 5000


@pytest.fixture()
def indexed(tmp_path):
    path = str(tmp_path / "idx.parquet")
    po.write_table(
        path,
        [("k", "int64", "DELTA_BINARY_PACKED",
          np.arange(N, dtype=np.int64), None),
         ("v", "int64", "PLAIN",
          np.arange(N, dtype=np.int64) * 7, None)],
        page_size_rows=500,
    )
    info = pc.read_file_info(path)
    blob = bytearray(open(path, "rb").read())
    return path, info, blob


def _expect():
    lo, hi = 1200, 1299
    return list(range(lo, hi + 1)), [i * 7 for i in range(lo, hi + 1)]


@pytest.mark.parametrize("region", ["ci", "oi"])
@pytest.mark.parametrize("seed", range(8))
def test_flipped_index_bytes_never_lie(indexed, region, seed, tmp_path):
    path, info, blob = indexed
    col = next(c for c in info.columns if c.path == "k")
    off, ln = (col.ci_off, col.ci_len) if region == "ci" else \
              (col.oi_off, col.oi_len)
    rng = np.random.default_rng(seed)
    corrupted = bytearray(blob)
    for pos in rng.integers(off, off + ln, 3):
        corrupted[pos] ^= 0xFF
    bad = str(tmp_path / f"bad_{region}_{seed}.parquet")
    with open(bad, "wb") as f:
        f.write(corrupted)
    want_k, want_v = _expect()
    try:
        table, nread, ntot = pc.read_table_pruned(
            bad, ("k", 1200, 1299), columns=["k", "v"]
        )
    except ValueError:
        return  # clean refusal is acceptable
    got = list(zip(table["k"][0].tolist(), table["v"][0].tolist()))
    if region == "oi":
        # offset lies trip the row-coverage guard (ValueError above) or
        # leave the read exact
        assert got == list(zip(want_k, want_v))
    else:
        # stat lies may LOSE rows (trusted metadata — any reader would),
        # but never fabricate or mispair: returned pairs are a subset of
        # the oracle's
        oracle = set(zip(want_k, want_v))
        assert set(got) <= oracle, sorted(set(got) - oracle)[:5]


def test_truncated_index_region(indexed, tmp_path):
    """Index offsets pointing past EOF (footer intact, index bytes cut)
    fail clean or fall back — the page data itself is still present."""
    path, info, blob = indexed
    col = min(
        (c for c in info.columns if c.ci_off is not None),
        key=lambda c: c.ci_off,
    )
    bad = str(tmp_path / "trunc.parquet")
    # splice out the index bytes, keep footer length positions intact by
    # overwriting the region with zeros instead of shrinking the file
    z = bytearray(blob)
    z[col.ci_off: col.ci_off + col.ci_len] = b"\x00" * col.ci_len
    with open(bad, "wb") as f:
        f.write(z)
    want_k, want_v = _expect()
    try:
        table, _, _ = pc.read_table_pruned(
            bad, ("k", 1200, 1299), columns=["k", "v"]
        )
    except ValueError:
        return
    assert table["k"][0].tolist() == want_k
    assert table["v"][0].tolist() == want_v
