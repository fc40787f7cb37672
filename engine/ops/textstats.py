"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting. All pure built-in expressions (whole-stage codegen;
no Python in any hot path), designed so an ANSI-SQL oracle can reproduce
them exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
}


# GPT-2-style pre-tokenizer shape, restricted to portable ASCII classes so
# Java regex (Spark) and RE2 (DuckDB/ANSI oracles) agree byte-for-byte:
# letter runs | digit runs | runs of other non-space symbols
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + TWO subword estimates: the classic
    chars-ratio heuristic (integer-exact as ceil(chars/4) + word count so
    the SQL oracle matches bit-for-bit) and a real BPE-ish REGEX
    pre-tokenization count (letter/digit/symbol runs — the split shape
    GPT-2's pre-tokenizer uses before merges)."""
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(text_col)
    return docs.select(
        F.col(key_col),
        F.size(words).cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        (F.size(words) + F.ceil(n_chars / 4)).cast("long").alias("n_tokens_est"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_tokens_regex"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / digit / uppercase ratios + mean word length —
    the standard cheap quality filters for web-scale corpora. Ratios are
    rounded to 6dp so float comparison against the oracle is stable."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1)).cast("double")
    words = F.split(t, " ")

    def ratio_of(pattern: str):
        return F.round(F.length(F.regexp_replace(t, pattern, "")) / n, 6)

    return docs.select(
        F.col(key_col),
        F.length(t).cast("long").alias("n_chars"),
        ratio_of(r"[^.,;:!?]").alias("punct_ratio"),
        ratio_of(r"[^0-9]").alias("digit_ratio"),
        ratio_of(r"[^A-Z]").alias("upper_ratio"),
        F.round(
            (F.length(t) - F.size(words) + 1) / F.greatest(F.size(words), F.lit(1)),
            6,
        ).alias("mean_word_len"),
    )


def language_id(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language id: score(lang) = fraction of words that are
    in the language's stopword list; argmax with deterministic tie-break on
    language code. Pure array expressions."""
    words = F.transform(F.split(F.lower(F.col(text_col)), " "), lambda w: w)
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
        score = F.round(hits / F.greatest(F.size(words), F.lit(1)), 6)
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(key_col),
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Order-sensitive 64-bit document fingerprint.

    xxhash64 of (text) plus a position-weighted word-hash sum — a rolling-
    hash-equivalent that is expressible both in Spark and ANSI SQL (the
    per-position weight makes it order-sensitive, unlike a bag-of-words sum).
    """
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1)))
    # word hash reduced mod 2^31-1 so position-weighted products stay far
    # from int64 overflow (ANSI mode) even for 4096-word documents
    weighted = F.aggregate(
        F.zip_with(
            words,
            idx,
            lambda w, i: F.pmod(F.xxhash64(w), F.lit((1 << 31) - 1)) * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return docs.select(
        F.col(key_col),
        F.xxhash64(text_col).alias("text_hash"),
        weighted.alias("rolling_fp"),
    )


def all_stats(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Every per-document text statistic in ONE projection: token counts,
    quality ratios, language id, and an order-sensitive positional
    fingerprint. At fleet scale this is the shape a per-doc stats pass
    must take — one scan, zero shuffles, whole-stage codegen end to end —
    instead of joining four separate per-metric outputs back together on
    doc_id (three needless exchanges of the same key)."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_chars = F.length(t)
    nd = F.greatest(n_chars, F.lit(1)).cast("double")

    def ratio_of(pattern: str):
        return F.round(F.length(F.regexp_replace(t, pattern, "")) / nd, 6)

    lwords = F.split(F.lower(t), " ")
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(lwords, lambda w: F.array_contains(sw, w)))
        score = F.round(hits / F.greatest(F.size(lwords), F.lit(1)), 6)
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pos_fp = F.aggregate(
        F.zip_with(
            words,
            F.sequence(F.lit(1), F.size(words)),
            lambda w, i: (F.length(w) + 1).cast("long") * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    return docs.select(
        F.col(key_col),
        F.size(words).cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        (F.size(words) + F.ceil(n_chars / 4)).cast("long").alias("n_tokens_est"),
        F.size(
            F.regexp_extract_all(t, F.lit(BPE_SPLIT_PATTERN), F.lit(0))
        ).cast("long").alias("n_tokens_regex"),
        ratio_of(r"[^.,;:!?]").alias("punct_ratio"),
        ratio_of(r"[^0-9]").alias("digit_ratio"),
        ratio_of(r"[^A-Z]").alias("upper_ratio"),
        F.round(
            (n_chars - F.size(words) + 1) / F.greatest(F.size(words), F.lit(1)),
            6,
        ).alias("mean_word_len"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
        pos_fp.alias("pos_fingerprint"),
    )
