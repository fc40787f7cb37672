"""Structured Streaming ingest: continuously encode arriving sequences.

The reference is strictly batch (no streaming code anywhere in
``/root/reference/src`` — SURVEY.md §2.6), but a training-data pipeline at
10^12-sequence scale ingests continuously. This wraps the batch encode job in
``foreachBatch``: each micro-batch routes through the SAME deterministic
bucket plan + lineage commit as batch runs, so streaming and batch writes are
interchangeable and a stream restart resumes exactly like a killed batch job
(committed chunk ids are skipped).

Committed chunks are immutable, so buckets must CLOSE: chunk ids are scoped
to the micro-batch (``chunk_suffix=f"b{batch_id}"``). A checkpoint-replayed
batch reproduces the same batch_id, hence the same chunk ids, and the resume
anti-join skips them — exactly-once chunk commits on top of at-least-once
foreachBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import lineage as lineage_mod


def encode_stream(
    stream_df: DataFrame,
    store: lineage_mod.ChunkStore,
    checkpoint_dir: str,
    trigger: dict | None = None,
    **encode_kwargs,
):
    """Start a streaming query that encodes each micro-batch into ``store``.

    ``stream_df``: a streaming DataFrame with the tokenized_sequences schema.
    Returns the StreamingQuery handle.
    """
    spark = stream_df.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch-scoped chunk ids: buckets close with their micro-batch, so
        # committed chunks stay immutable and a checkpoint-replayed batch
        # (same batch_id -> same chunk ids) is skipped by the resume anti-join
        lineage_mod.encode_with_resume(
            spark,
            batch_df,
            store,
            run_id=f"stream-batch-{batch_id}",
            chunk_suffix=f"b{batch_id:06d}",
            **encode_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def export_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    **export_kwargs,
):
    """Streaming PARQUET sink with exactly-once file commits: each
    micro-batch exports through the resumable parquet job
    (:func:`engine.jobs.export.export_parquet`) with unit ids scoped to
    the batch (``chunk_suffix=f"b{batch_id}"``). A checkpoint-replayed
    batch reproduces the same batch_id, hence the same digest-named unit
    files, and the committed-file anti-join (plus the atomic rename)
    makes the replay a no-op — exactly-once parquet files on top of
    at-least-once foreachBatch, the sink-side twin of
    :func:`encode_stream`. Returns the StreamingQuery handle."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from .jobs.export import export_parquet

        export_parquet(
            batch_df,
            out_dir,
            chunk_suffix=f"b{batch_id:06d}",
            resume=True,
            **export_kwargs,
        ).collect()  # bounded manifest action: one row per unit

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_token_stats(
    stream_df: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    key_col: str = "source",
) -> DataFrame:
    """Event-time windowed ingest statistics with late-data handling:
    ``withWatermark`` bounds state (windows older than the watermark close
    and emit exactly once in append mode; later-than-watermark rows drop),
    then a tumbling-window groupBy — all built-in Structured Streaming
    operators, shuffle keyed on (window, source)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            key_col,
            "n_docs",
            "n_tokens",
        )
    )


_DEDUP_OUT = "text_md5 string, survivor_id string"
_DEDUP_STATE = "seen long"


def stateful_exact_dedup(
    stream_df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Cross-micro-batch streaming dedup via ``applyInPandasWithState``: one
    GroupState row per distinct text hash; the first-ever occurrence emits,
    every later duplicate (same batch or any later batch) is suppressed.

    State is one long per distinct hash — at 10^12 docs the state store
    shards by the groupBy key like any keyed state; use watermark-based
    state TTL upstream if the key space is unbounded in time.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream_df.select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(key_col).cast("string").alias("survivor_id"),
    )

    def dedup_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        seen = state.get[0] if state.exists else 0
        total = 0
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            total += len(pdf)
            if seen == 0 and len(pdf):
                cand = pdf.sort_values("survivor_id").iloc[:1]
                first = cand if first is None else (
                    pd.concat([first, cand]).sort_values("survivor_id").iloc[:1]
                )
        state.update((seen + total,))
        if seen == 0 and first is not None:
            yield first[["text_md5", "survivor_id"]]

    return keyed.groupBy("text_md5").applyInPandasWithState(
        dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
