"""Per-chunk Bloom filters: vectorized build, scalar probe parity, and
point-lookup pruning through the store (parquet column-chunk bloom analog;
the reference carries only min/max stats)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import bloom
from engine.codecs import bytearrays


def _flat(vals):
    return bytearrays.flat_from_values(vals)


def test_no_false_negatives_and_bounded_fpr():
    vals = [f"doc-{i:08d}" for i in range(10000)]
    lengths, data = _flat(vals)
    bm = bloom.build(lengths, data)
    for v in vals[::97]:
        assert bloom.might_contain(bm, *bloom.key_hashes(v))
    absent = [f"missing-{i}" for i in range(10000)]
    fp = sum(bloom.might_contain(bm, *bloom.key_hashes(v)) for v in absent)
    assert fp / len(absent) < 0.05, fp


def test_scalar_hash_matches_vectorized():
    vals = ["", "a", "ab", "doc-123", "x" * 300, "é中"]
    lengths, data = _flat(vals)
    h1v = bloom._poly_hashes_flat(lengths, data, bloom._M1)
    for i, v in enumerate(vals):
        assert int(h1v[i]) == bloom._poly_hash_one(v.encode(), int(bloom._M1)), v


def test_sizing_grows_with_values():
    assert bloom._sized_bits(10) == bloom.MIN_BITS
    assert bloom._sized_bits(100_000) > bloom.MIN_BITS
    assert bloom._sized_bits(10**9) == bloom.MAX_BITS


def test_encode_attaches_bloom_and_lookup_prunes(spark, tmp_path):
    from engine import datagen, lineage
    from engine.jobs import encode as encode_job

    df = datagen.generate_spark(spark, 400)
    store = lineage.ChunkStore(spark, str(tmp_path / "s"))
    skip = store.committed_chunk_ids()
    chunks = encode_job.encode_table(
        df, rows_per_bucket=64, skip_chunk_ids=skip, bloom_columns=["doc_id"]
    ).persist()
    store.commit(chunks)
    doc_rows = chunks.where(F.col("column") == "doc_id")
    assert doc_rows.where(F.col("bloom").isNotNull()).count() == doc_rows.count()
    assert chunks.where(
        (F.col("column") == "tokens") & F.col("bloom").isNotNull()
    ).count() == 0
    # every encoded doc_id is admitted by its own chunk's bloom
    one = doc_rows.first()
    from engine import chunk as chunk_mod

    lens, data = chunk_mod.decode_chunk(one["payload"])
    off = np.concatenate(([0], np.cumsum(lens.astype(np.int64))))
    ids = [data[off[i] : off[i + 1]].decode() for i in range(len(lens))]
    for v in ids:
        assert bloom.might_contain(bytes(one["bloom"]), *bloom.key_hashes(v))

    # present keys come back exactly; absent keys return nothing
    got = lineage.lookup_docs(store, [ids[0], ids[-1]]).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in got] == sorted({ids[0], ids[-1]})
    assert lineage.lookup_docs(store, ["no-such-doc-xyz"]).count() == 0

    # the bloom anti-join OBSERVABLY prunes: pick an absent key that no
    # chunk's filter admits (deterministic — iterate candidates until one
    # clears every bloom; FPR makes the very first almost always clear),
    # then assert _bloom_prune drops every candidate chunk before decode
    blooms = [bytes(r["bloom"]) for r in doc_rows.select("bloom").collect()]
    absent = next(
        k
        for k in (f"absent-key-{i}" for i in range(1000))
        if not any(bloom.might_contain(b, *bloom.key_hashes(k)) for b in blooms)
    )
    pruned = lineage._bloom_prune(store.read_chunks(), [absent])
    assert pruned.count() == 0  # zero payload rows survive for an absent key
    kept = lineage._bloom_prune(store.read_chunks(), [ids[0]])
    assert kept.count() > 0  # present keys keep their chunk
    chunks.unpersist()


def test_bloom_rejects_non_byte_columns(spark):
    from engine import datagen
    from engine.jobs import encode as encode_job

    df = datagen.generate_spark(spark, 50)
    with pytest.raises(ValueError, match="bloom_columns"):
        encode_job.encode_table(df, bloom_columns=["n_tok"]).count()


def test_poly_hashes_segmented_matches_unsegmented(monkeypatch):
    """Hashes are identical whatever the segment size: force tiny segments
    (including cuts around empty values and one value larger than a whole
    segment) and compare with the single-segment result."""
    import numpy as np

    from engine import bloom

    rng = np.random.default_rng(19)
    lens = [0, 3, 0, 17, 1, 200, 0, 8, 64, 0]
    data = rng.integers(0, 256, sum(lens)).astype(np.uint8).tobytes()
    lengths = np.array(lens, np.int64)
    want1 = bloom._poly_hashes_flat(lengths, data, bloom._M1)
    want2 = bloom._poly_hashes_flat(lengths, data, bloom._M2)
    for seg in (1, 7, 16, 64):
        monkeypatch.setattr(bloom, "_SEG_BYTES", seg)
        np.testing.assert_array_equal(
            bloom._poly_hashes_flat(lengths, data, bloom._M1), want1
        )
        np.testing.assert_array_equal(
            bloom._poly_hashes_flat(lengths, data, bloom._M2), want2
        )
    monkeypatch.undo()
    # scalar twin still agrees value-by-value
    off = 0
    for i, ln in enumerate(lens):
        v = data[off : off + ln]
        off += ln
        assert bloom._poly_hash_one(v, int(bloom._M1)) == int(want1[i])
