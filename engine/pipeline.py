"""End-to-end training-data preparation pipeline.

Composes the engine's ops into the canonical corpus flow a 100 TB training
run needs, entirely in declarative DataFrame operators:

    raw documents
      -> exact dedup           (hash-aggregate, map-side combinable)
      -> quality filter        (built-in expressions, whole-stage codegen)
      -> tokenize              (deterministic word hashing, no UDF)
      -> tokenized_sequences   (doc_id, tokens array<int32>, n_tok, source)
      -> encode_with_resume    (salted buckets, lineage, checkpointed)

Every stage is SQL-expressible, so the full pipeline is oracle-checked by
the driver (``pipeline_end_to_end``) — not just each op in isolation.

Scale notes: dedup is one hash-aggregate + one key join (no bodies in the
aggregate shuffle); the quality filter and tokenizer are projections fused
into the scan; encode adds its single bucket shuffle. Net: two data
shuffles for the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

VOCAB_SIZE = 50_000


def tokenize_expr(text_col):
    """Deterministic toy tokenizer as a pure expression: word ->
    (length*31 + first-codepoint) % VOCAB_SIZE. A real BPE replaces this
    expression; everything downstream (shapes, encode, stats) is identical.
    Kept SQL-expressible so DuckDB can replay it for the correctness gate."""
    words = F.split(text_col, " ")
    return F.transform(
        words,
        lambda w: ((F.length(w) * 31 + F.ascii(w)) % VOCAB_SIZE).cast("int"),
    )


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    source_col: str = "source",
    min_chars: int = 40,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """documents -> deduped, quality-filtered tokenized_sequences."""
    from .ops import dedup, textstats

    survivors = dedup.exact_dedup(docs, text_col, key_col).select(
        F.col("survivor_id").alias(key_col)
    )
    kept = docs.join(survivors, key_col, "left_semi")
    scored = textstats.quality_score(kept, text_col=text_col, key_col=key_col)
    good = scored.where(
        (F.col("n_chars") >= min_chars) & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(key_col)
    base = kept.join(good, key_col, "left_semi")
    toks = tokenize_expr(F.col(text_col))
    return base.select(
        F.col(key_col).cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col(source_col).alias("source"),
    )


def run_pipeline(spark, docs: DataFrame, store, **encode_kwargs) -> int:
    """prepare_corpus -> checkpointed encode into ``store``. Returns chunk
    rows written (0 on a fully-resumed rerun)."""
    from . import lineage as lineage_mod

    seq = prepare_corpus(docs)
    return lineage_mod.encode_with_resume(spark, seq, store, **encode_kwargs)
