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

from pyspark.sql import DataFrame

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
