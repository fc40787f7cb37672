"""Composed training-data pipeline: dedup -> quality -> tokenize -> encode,
with checkpointed resume semantics preserved through the composition."""

import pandas as pd
from pyspark.sql import functions as F

from engine import lineage, pipeline
from engine.jobs import decode as decode_job


def _docs(spark):
    rows = []
    for i in range(120):
        body = " ".join(f"w{i}x{j}word" for j in range(3 + i % 9))
        rows.append((i, body + " tail some more filler text here", f"src{i % 3}"))
    # exact dups of the first 10 docs
    for i in range(10):
        rows.append((1000 + i, rows[i][1], rows[i][2]))
    # low-quality rows: too short / too punctuated
    rows.append((2000, "tiny", "src0"))
    rows.append((2001, "!!!! .... ;;;; ,,,, ???? !!!! .... ;;;; ,,,, ????", "src1"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )


def test_prepare_corpus_filters_and_tokenizes(spark):
    docs = _docs(spark)
    seq = pipeline.prepare_corpus(docs)
    got = {int(r["doc_id"]) for r in seq.select("doc_id").collect()}
    assert got == set(range(120))  # dups (1000+) and junk (2000+) are gone
    row = seq.where(F.col("doc_id") == "5").first()
    assert row["n_tok"] == len(row["tokens"]) > 0
    assert all(0 <= t < pipeline.VOCAB_SIZE for t in row["tokens"])


def test_run_pipeline_resumes(spark, tmp_path):
    docs = _docs(spark)
    store = lineage.ChunkStore(spark, str(tmp_path / "store"))
    n1 = pipeline.run_pipeline(spark, docs, store, rows_per_bucket=32)
    assert n1 > 0
    n2 = pipeline.run_pipeline(spark, docs, store, rows_per_bucket=32)
    assert n2 == 0  # fully resumed, nothing re-encoded
    dec = decode_job.decode_chunks(store.read_chunks())
    assert dec.count() == 120
    # decoded tokens equal a fresh derivation (bit-identical round trip)
    fresh = pipeline.prepare_corpus(docs)
    bad = (
        fresh.alias("a")
        .join(dec.alias("b"), "doc_id")
        .where(~(F.col("a.tokens") == F.col("b.tokens")))
        .count()
    )
    assert bad == 0
