"""Small-file / row-group compaction (VERDICT r6 #7): byte-verbatim
parquet row-group merges, distributed bin-packed compaction, and atomic
replacing snapshot commits on the ChunkStore."""

import glob
import os

import numpy as np
import pytest

from engine import compact as cp
from engine import parquet_compat as pc
from engine import parquet_out as po


def _write_small(tmp_path, n_files=10, rows=1000, codec="snappy"):
    paths = []
    ids_all = []
    for f in range(n_files):
        p = str(tmp_path / f"in-{f:03d}.parquet")
        base = f * rows
        ids = np.arange(base, base + rows, dtype=np.int64)
        strs = po.flat_strings([f"s{i:06d}" for i in ids])
        po.write_table(
            p,
            [
                ("id", "int64", "DELTA_BINARY_PACKED", ids, None),
                ("s", "utf8",
                 "PLAIN_DICTIONARY" if f % 2 else "AUTO", strs, None),
            ],
            page_size_rows=rows // 4,
            codec=codec if f % 3 else None,  # mixed codecs merge fine
        )
        paths.append(p)
        ids_all += ids.tolist()
    return paths, ids_all


def test_merge_row_groups_verbatim(tmp_path):
    """Merged file: every reader agrees, encodings preserved per source
    group, PageIndex relocated (pruned reads still skip pages)."""
    import duckdb
    import pyarrow.parquet as pq

    paths, ids_all = _write_small(tmp_path)
    out = str(tmp_path / "merged.parquet")
    res = cp.merge_row_groups([(p, 0) for p in paths], out)
    assert res["rows"] == len(ids_all) and res["groups"] == len(paths)
    md = pq.ParquetFile(out).metadata
    assert md.num_rows == len(ids_all)
    for g in range(md.num_row_groups):
        assert md.row_group(g).column(0).has_column_index
        assert md.row_group(g).column(0).has_offset_index
    t = pq.read_table(out)
    assert t.column("id").to_pylist() == ids_all
    got = duckdb.sql(
        f"SELECT id FROM read_parquet('{out}') ORDER BY id"
    ).fetchall()
    assert [r[0] for r in got] == ids_all
    # encodings preserved: odd source files were dict-encoded
    encs = {
        (c.rg, c.path): c.encodings for c in pc.read_file_info(out).columns
    }
    assert any(
        e in encs[(1, "s")] for e in ("PLAIN_DICTIONARY", "RLE_DICTIONARY")
    )
    # PageIndex offsets were patched, not dropped: pruning still engages
    tab, pr, pt = cp.pc.read_table_pruned(
        out, ("id", 3100, 3399), columns=["id", "s"]
    )
    assert tab["id"][0].tolist() == list(range(3100, 3400))
    assert pr < pt


def test_merge_rejects_schema_mismatch(tmp_path):
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    po.write_table(
        p1, [("x", "int64", "PLAIN", np.arange(10, dtype=np.int64), None)]
    )
    po.write_table(
        p2, [("y", "int64", "PLAIN", np.arange(10, dtype=np.int64), None)]
    )
    with pytest.raises(ValueError, match="schema differs"):
        cp.merge_row_groups(
            [(p1, 0), (p2, 0)], str(tmp_path / "out.parquet")
        )


def test_compact_parquet_files_distributed(tmp_path, spark):
    """40 small files bin-pack into a handful of merged files; aggregate
    over the compacted set matches the original exactly."""
    import duckdb

    paths, ids_all = _write_small(tmp_path, n_files=40, rows=500)
    outdir = str(tmp_path / "compacted")
    outs = cp.compact_parquet_files(
        spark, paths, outdir, target_file_bytes=20_000
    )
    assert 1 < len(outs) < 40
    got = duckdb.sql(
        f"SELECT COUNT(*), SUM(id) FROM read_parquet('{outdir}/*.parquet')"
    ).fetchone()
    assert got == (len(ids_all), sum(ids_all))


def test_compact_chunk_store_hash_identical(tmp_path, spark):
    """The VERDICT r6 #7 'done' criterion: a many-commit store compacts
    to fewer files with hash-identical decode, resume still writes 0,
    and the publish is one atomic replacing snapshot."""
    from engine import datagen, lineage
    from engine.jobs import decode as decode_job
    from engine.jobs import encode as encode_job

    store = lineage.ChunkStore(
        spark, str(tmp_path / "store"), table_format="snapshot"
    )
    df = datagen.generate_spark(spark, 400).persist()
    full = encode_job.encode_table(df).persist()
    rows = full.collect()
    for i in range(10):  # 10 commits -> many small files
        store.commit(
            spark.createDataFrame(rows[i::10], full.schema), run_id=f"r{i}"
        )
    files_before = sum(
        len(glob.glob(os.path.join(p, "*.parquet")))
        for p in store._snapshot_paths("chunks")
    )
    before = (
        decode_job.decode_chunks(store.read_chunks())
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    res = cp.compact_chunk_store(store, target_file_bytes=8 << 20)
    after = (
        decode_job.decode_chunks(store.read_chunks())
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert before.equals(after)
    assert res["files_after"] < files_before
    assert lineage.encode_with_resume(spark, df, store) == 0
    df.unpersist()
    full.unpersist()


def test_compact_replace_aborts_on_concurrent_commit(tmp_path, spark):
    """A replacing snapshot pinned to version V must NOT drop a commit
    that landed at V+1 while the compaction ran: it aborts with
    CommitConflict instead (Iceberg's REPLACE validation)."""
    from engine import datagen, lineage
    from engine.jobs import encode as encode_job

    store = lineage.ChunkStore(
        spark, str(tmp_path / "store"), table_format="snapshot"
    )
    df = datagen.generate_spark(spark, 50)
    chunks = encode_job.encode_table(df)
    store.commit(chunks, run_id="base")
    base = store.current_version()
    # simulate the racing append between plan and publish
    store.commit(chunks.limit(1), run_id="racer")
    with pytest.raises(lineage.CommitConflict, match="advanced past"):
        store._publish_snapshot(
            "zzz", "zzz", "compactor", replace=True, expected_base=base
        )


def test_merge_pyarrow_written_files(tmp_path):
    """Foreign (pyarrow) files carry ColumnMetaData.encoding_stats (field
    13) and key-value metadata; the merge must relocate only real offset
    fields (r7 review #1 — field 13 was mistaken for index_page_offset
    and crashed on every pyarrow file) and the result must read back
    exactly in pyarrow AND DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = []
    allx = []
    for f in range(4):
        p = str(tmp_path / f"pa-{f}.parquet")
        xs = list(range(f * 100, f * 100 + 100))
        pq.write_table(
            pa.table({"x": pa.array(xs, pa.int64()),
                      "s": [f"v{v:04d}" for v in xs]}),
            p,
            write_page_index=True,
        )
        paths.append(p)
        allx += xs
    out = str(tmp_path / "merged.parquet")
    res = cp.merge_row_groups([(p, 0) for p in paths], out)
    assert res["rows"] == 400
    t = pq.read_table(out)
    assert t.column("x").to_pylist() == allx
    got = duckdb.sql(
        f"SELECT x, s FROM read_parquet('{out}') ORDER BY x"
    ).fetchall()
    assert [r[0] for r in got] == allx
    assert got[7][1] == "v0007"


def test_merge_drops_bloom_filter_fields(tmp_path):
    """Bloom filter bytes live outside the copied chunk range, so the
    merged footer must DROP fields 14/15 rather than carry offsets into
    unrelated bytes (r7 review #2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "bloom.parquet")
    try:
        pq.write_table(
            pa.table({"x": pa.array(range(100), pa.int64())}),
            p,
            write_bloom_filters=True,
        )
    except TypeError:
        pytest.skip("this pyarrow cannot write bloom filters")
    out = str(tmp_path / "merged.parquet")
    cp.merge_row_groups([(p, 0)], out)
    meta = cp._read_footer_typed(out)
    rg = cp._fget(meta, 4)[1][0]
    cm = cp._fget(cp._fget(rg, 1)[1][0], 3)
    assert cp._fget(cm, 14) is None and cp._fget(cm, 15) is None
    assert pq.read_table(out).column("x").to_pylist() == list(range(100))
