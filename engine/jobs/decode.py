"""Distributed decode job: encoded chunk rows -> original tokenized_sequences.

Spark replay of the reference's read path (``SerializedFileReader ->
get_row_iter``, ``src/file/reader.rs:132-292`` + record assembly
``src/record/reader.rs:378-520``): each ``chunk_id`` group holds one encoded
blob per column; decode is a pure ``applyInPandas`` stage that reverses the
column-chunk framing, verifies checksums, and reassembles rows. Token arrays
must come back bit-identical (the round-trip invariant of the reference's
encoding tests, ``src/encodings/encoding.rs:1179-1265``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import chunk

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)


def _strings_from_flat(lengths: np.ndarray, data: bytes) -> pd.Series:
    import pyarrow as pa

    offsets = np.concatenate(([0], np.cumsum(np.asarray(lengths, dtype=np.int64))))
    arr = pa.StringArray.from_buffers(
        len(lengths),
        pa.py_buffer(offsets.astype(np.int32).tobytes()),
        pa.py_buffer(data),
    )
    return arr.to_pandas()


def _decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    blobs = {r["column"]: r["payload"] for _, r in pdf.iterrows()}
    n_docs = int(pdf["n_docs"].iloc[0])

    lens_arr = chunk.decode_chunk(blobs["n_tok"]).astype(np.int64)
    flat = chunk.decode_chunk(blobs["tokens"])
    did_lens, did_data = chunk.decode_chunk(blobs["doc_id"])
    src_lens, src_data = chunk.decode_chunk(blobs["source"])

    offsets = np.concatenate(([0], np.cumsum(lens_arr)))
    tokens = [flat[offsets[i] : offsets[i + 1]] for i in range(n_docs)]
    return pd.DataFrame(
        {
            "doc_id": _strings_from_flat(did_lens, did_data),
            "tokens": pd.Series(tokens, dtype=object),
            "n_tok": lens_arr.astype(np.int32),
            "source": _strings_from_flat(src_lens, src_data),
        }
    )


def decode_chunks(chunks_df: DataFrame) -> DataFrame:
    """Decode chunk rows back into (doc_id, tokens, n_tok, source)."""
    return chunks_df.groupBy("chunk_id").applyInPandas(
        lambda pdf: _decode_group(pdf), DECODED_SCHEMA
    )


def decode_chunks_pruned(
    chunks_df: DataFrame, column: str, lo: int, hi: int
) -> DataFrame:
    """Decode only chunks whose [vmin, vmax] statistics for ``column``
    intersect [lo, hi] — the engine-level analog of parquet row-group
    predicate pushdown. The reference carries these statistics in metadata
    for *future* filtering (``src/file/statistics.rs:246-340``, pushdown is
    an unchecked roadmap item, README.md:79); here they actually prune:
    non-qualifying chunks are dropped BEFORE any payload is deserialized.

    The caller still applies the row-level predicate afterwards; pruning is
    transparent (it only skips chunks that can contain no qualifying value).
    """
    from pyspark.sql import functions as F

    keep = (
        chunks_df.where(
            (F.col("column") == column)
            & (F.col("vmax") >= lo)
            & (F.col("vmin") <= hi)
        )
        .select("chunk_id")
        .distinct()
    )
    return decode_chunks(chunks_df.join(F.broadcast(keep), "chunk_id", "left_semi"))
