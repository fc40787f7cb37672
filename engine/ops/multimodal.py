"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED behind
``FAKE_DECODE`` because no image/audio libraries exist in this container —
swap ``_decode_image_bytes`` for PIL/libvips on a real cluster.

Scale notes: media bytes never enter a shuffle — feature extraction is a
``mapInPandas`` projection; only the (small) extracted features flow
downstream. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory for wide binary rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FAKE_DECODE = True  # container has no PIL/libvips/ffmpeg; see module docstring

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def _decode_image_bytes(buf: bytes, dim: int) -> np.ndarray:
    """STUB decode -> deterministic fake feature vector.

    Real implementation: PIL.Image.open -> resize -> channel means etc.
    The fake is a pure function of the bytes so tests are reproducible.
    """
    if not FAKE_DECODE:
        raise NotImplementedError("media decode requires PIL/libvips (not in container)")
    h = hashlib.sha256(buf).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: batches arrive as Arrow; each batch is
    processed vectorized; media bytes are dropped before any shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_bytes(b, dim) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": pd.Series(list(feats), dtype=object),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx) rows via sequence +
    explode — the distributed work-list a real frame extractor would consume."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


def fake_media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic fake media rows (shared by the Spark table builder and
    the parquet writer, so an external oracle can regenerate the exact same
    table). Payloads are hex-text noise bytes: opaque binary to the engine,
    but valid ASCII so a SQL oracle can sha256 them (DuckDB cannot hash raw
    blobs). Lengths vary per row to exercise Arrow batching."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        raw = rng.integers(0, 256, 256 + (i % 5) * 64).astype(np.uint8).tobytes()
        payload = raw.hex().encode("ascii")
        rows.append(
            (
                f"m-{i:06d}",
                kind,
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                16000 if kind == "audio" else None,
                100 if kind == "video" else None,
            )
        )
    return rows


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table.

    Typed tuples, NOT a pandas frame: pandas upcasts int+None columns to
    float64, which IntegerType rejects (64.0 is not an int)."""
    return spark.createDataFrame(fake_media_rows(n, seed), MEDIA_SCHEMA)


def write_fake_media_parquet(path: str, n: int = 64, seed: int = 42) -> str:
    """Write the deterministic fake media table to parquet WITHOUT Spark
    (pure pyarrow), so an external SQL oracle and the Spark query can read
    the identical file. Atomic via temp + rename."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = fake_media_rows(n, seed)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.string()),
            "kind": pa.array(cols[1], pa.string()),
            "content": pa.array(cols[2], pa.binary()),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "sample_rate": pa.array(cols[5], pa.int32()),
            "n_frames": pa.array(cols[6], pa.int32()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
