"""CLI surface: DataFrame cores (oracle-gated via cli_read in the driver)
plus argv dispatch and the printed form."""

import pytest

from engine import cli
from engine.lineage import ChunkStore, encode_with_resume


@pytest.fixture(scope="module")
def store_dir(spark, tmp_path_factory):
    from engine import datagen

    d = str(tmp_path_factory.mktemp("cli_store"))
    df = spark.createDataFrame(datagen.generate_pandas(200, seed=9))
    encode_with_resume(spark, df, ChunkStore(spark, d), rows_per_bucket=64)
    return d


def test_read_df_roundtrip(spark, store_dir):
    out = cli.read_df(ChunkStore(spark, store_dir))
    assert out.count() == 200
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(out.columns)


def test_chunks_df_metrics(spark, store_dir):
    pdf = cli.chunks_df(ChunkStore(spark, store_dir)).toPandas()
    assert (pdf["enc"] > 0).all() and (pdf["raw"] > 0).all()
    assert set(pdf["column"]) >= {"tokens", "doc_id"}
    assert (pdf["ratio"] > 0).all()


def test_main_dispatch(monkeypatch, capsys, store_dir, spark):
    # route the CLI onto the shared test session instead of building one
    monkeypatch.setattr(cli, "_spark", lambda: spark)
    monkeypatch.setattr("sys.argv", ["engine.cli", "chunks", store_dir])
    cli.main()
    out = capsys.readouterr().out
    assert "tokens" in out and "codec" in out

    monkeypatch.setattr("sys.argv", ["engine.cli", "read", store_dir, "5"])
    cli.main()
    out = capsys.readouterr().out
    assert "doc_id" in out

    monkeypatch.setattr("sys.argv", ["engine.cli", "nope", "x"])
    with pytest.raises(SystemExit):
        cli.main()


def test_index_parquet_command(tmp_path, capsys):
    """index-parquet prints per-page bounds with decoded numeric stats
    and the boundary_order claim, no Spark session required."""
    import numpy as np

    from engine import cli
    from engine import parquet_out as po

    path = str(tmp_path / "ix.parquet")
    po.write_table(
        path,
        [("x", "int64", "PLAIN", np.arange(3000, dtype=np.int64), None)],
        page_size_rows=1000,
    )
    cli.cmd_index_parquet(path)
    out = capsys.readouterr().out
    assert "3 pages, ASCENDING" in out
    assert "min=1000 max=1999" in out and "nulls=0" in out


def test_cli_compact_parquet(tmp_path, spark, capsys):
    """compact-parquet merges small files through the CLI surface."""
    import numpy as np

    from engine import cli
    from engine import parquet_out as po

    paths = []
    for f in range(3):
        p = str(tmp_path / f"in{f}.parquet")
        po.write_table(
            p,
            [("x", "int64", "PLAIN",
              np.arange(f * 10, f * 10 + 10, dtype=np.int64), None)],
        )
        paths.append(p)
    out_dir = str(tmp_path / "out")
    cli.cmd_compact_parquet(out_dir, paths)
    captured = capsys.readouterr().out
    assert "3 input files -> 1 compacted" in captured
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*), SUM(x) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()
    assert n == (30, sum(range(30)))


def test_cli_read_parquet_where(tmp_path, capsys):
    """read-parquet with a predicate runs the PageIndex-pruned engine
    read (no Spark session) and reports the pages skipped."""
    import numpy as np

    from engine import cli
    from engine import parquet_out as po

    path = str(tmp_path / "t.parquet")
    ids = np.arange(10000, dtype=np.int64)
    po.write_table(
        path,
        [
            ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
            ("s", "utf8", "AUTO",
             po.flat_strings([f"s{i:06d}" for i in ids]), None),
        ],
        page_size_rows=500,
    )
    cli.cmd_read_parquet(path, 3, "id:2000:2999")
    out = capsys.readouterr().out
    assert "1000 matching rows; decoded 4 of 40 pages" in out
    assert "2000 | s002000" in out
    cli.cmd_read_parquet(path, 5, "id:in:17,9977")
    out2 = capsys.readouterr().out
    assert "2 matching rows" in out2 and "9977 | s009977" in out2
    cli.cmd_read_parquet(path, 5, "s:s000100:s000105")
    out3 = capsys.readouterr().out
    assert "6 matching rows" in out3


def test_cli_where_robustness(tmp_path, capsys):
    """r7 review pass 4: numeric-looking bounds on a STRING column retry
    untyped; list columns in the file don't break flat predicates;
    predicate-without-n dispatch; colon-containing ranges fail with a
    clear message instead of silently corrupting."""
    import numpy as np

    from engine import cli
    from engine import parquet_out as po

    path = str(tmp_path / "mix.parquet")
    counts = np.full(100, 2, np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    po.write_table(
        path,
        [
            ("name", "utf8", "PLAIN",
             po.flat_strings([f"{i}" for i in range(100, 200)]), None),
            ("id", "int64", "PLAIN", np.arange(100, dtype=np.int64), None),
            ("toks", "list<int64>", "PLAIN",
             (offsets, np.arange(200, dtype=np.int64), None), None),
        ],
        page_size_rows=25,
    )
    # numeric-looking bounds on a string column: auto-retry as str
    cli.cmd_read_parquet(path, 3, "name:120:130")
    out = capsys.readouterr().out
    assert "matching rows" in out and "120" in out
    # flat predicate works although the file carries a list column
    cli.cmd_read_parquet(path, 2, "id:10:12")
    out2 = capsys.readouterr().out
    assert "3 matching rows" in out2
    # colons inside range values: clear error, not silent corruption
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="not expressible"):
        cli.cmd_read_parquet(path, 2, "ts:2020-01-01T00:00:2020-02-01")
    # directory: clear error
    with _pytest.raises(SystemExit, match="ONE parquet file"):
        cli.cmd_read_parquet(str(tmp_path), 2, "id:0:5")
