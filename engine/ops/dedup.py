"""Deduplication operators over a documents table.

Scale notes (the whole point):
- exact dedup is one hash-aggregate — Spark's map-side partial aggregation
  keeps the shuffle proportional to the number of *distinct* hashes;
- MinHash-LSH shuffles (band_id, band_hash) pairs, never document bodies,
  and the per-bucket candidate join is bounded by bucket size;
- SimHash reduces each document to one 64-bit signature; near-dup candidates
  join on rotated prefix buckets (Hamming neighborhoods), no O(n^2) pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

# 31-bit Mersenne prime: keeps (h % P) * a + b under 2^62 so the affine
# permutations never overflow int64 under ANSI mode
HASH_PRIME = (1 << 31) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Group identical texts by md5; keep the smallest key as survivor.

    Returns (survivor_id, dup_count) per distinct text — one hash-groupBy,
    map-side combinable.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(key_col))
        .groupBy("text_md5")
        .agg(
            F.min(key_col).alias("survivor_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def _shingles(text_col: str, k: int = 3):
    """Word k-gram shingles as an array<string> column (built-in functions
    only: split + transform over index range, no UDF)."""
    words = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(words) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(0), n - 1)
    return F.when(n > 0, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: shingle -> xxhash64 -> affine-permuted
    min per hash function. Pure built-ins: the per-hash min is an aggregate
    over the exploded shingle hashes (map-side combinable)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, HASH_PRIME, num_hashes, dtype=np.int64)
    b = rng.integers(0, HASH_PRIME, num_hashes, dtype=np.int64)
    sh = docs.select(
        F.col(key_col),
        F.explode(F.array_distinct(_shingles(text_col, k))).alias("shingle"),
    ).select(key_col, F.pmod(F.xxhash64("shingle"), F.lit(HASH_PRIME)).alias("h"))
    mins = [
        F.min((F.col("h") * int(a[i]) + int(b[i])) % HASH_PRIME).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(key_col).agg(*mins).select(
        key_col, F.array(*[f"mh{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding: documents sharing any
    band bucket. Shuffle carries (band_id, band_hash, key) triplets only."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, key_col, num_hashes, k, seed)
    banded = sig.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice("signature", i * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key_col, "bb.band", "bb.bhash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
        )
        .select(
            F.col(f"l.{key_col}").alias("id_a"), F.col(f"r.{key_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (verification stage after
    LSH): broadcast-free sort-merge join of shingle sets by key."""
    sh = docs.select(
        F.col(key_col), F.array_distinct(_shingles(text_col, k)).alias("sh")
    )
    j = (
        candidates.join(sh.withColumnRenamed(key_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(key_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    nbits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document from word-level features (weighted bit
    voting over xxhash64(word)); vectorized pandas UDF for the bit-vote since
    per-bit aggregation in SQL would build 64 aggregate columns."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _simhash(words: pd.Series) -> pd.Series:
        out = np.zeros(len(words), dtype=np.int64)
        for i, ws in enumerate(words):
            if ws is None or len(ws) == 0:
                continue
            arr = pd.util.hash_array(np.asarray(ws, dtype=object)).astype(np.uint64)
            bits = ((arr[:, None] >> np.arange(nbits, dtype=np.uint64)) & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.flatnonzero(votes > 0):
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return docs.select(
        F.col(key_col), _simhash(F.split(F.col(text_col), " ")).alias("simhash")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming: pigeonhole over
    ``blocks`` 16-bit blocks (any pair within distance 3 shares >=1 exact
    block), candidate join per block bucket, exact popcount filter."""
    sig = simhash(docs, text_col, key_col)
    blocked = sig.select(
        key_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bval"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select(key_col, "simhash", "bb.blk", "bb.bval")
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
        )
        .select(
            F.col(f"l.{key_col}").alias("id_a"),
            F.col(f"r.{key_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
