"""Streaming sink into versioned tables — the lakehouse streaming-ingest
path (T10): a Structured Streaming query lands each micro-batch as one
append commit in the snapshot log, so streamed data immediately gets the
whole versioned-table surface (time travel, file-level DML, OPTIMIZE,
Delta-log mirror) and batch readers see atomically-published batches.

Exactly-once: foreachBatch is at-least-once under checkpoint recovery
(a batch can replay after a crash between sink write and checkpoint
commit), so each commit records its micro-batch id in the log and a
replayed batch id ≤ the table's high-water mark is skipped — the same
transactional-sink idea Delta's txn action implements (public protocol).

Scale: each micro-batch is one ordinary distributed parquet append (no
shuffle beyond the query's own plan); log cost is one driver-side JSON
per batch. Compact small batch files periodically with OPTIMIZE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import snapshots


def commit_stream_batch(batch_df: DataFrame, batch_id: int,
                        table_dir: str, app_id: str | None = None) -> bool:
    """Land one micro-batch as an append commit, or skip it if its id is
    at or below THIS APP's committed high-water mark (checkpoint-recovery
    replay). The watermark is keyed by ``app_id`` — Delta's txn-action
    idea — because a *different* stream into the same table starts its
    batch ids back at 0 and must not be shadowed by an earlier stream's
    watermark. Returns whether a commit happened."""
    if batch_id <= snapshots.last_stream_batch_id(table_dir, app_id):
        return False
    snapshots.write_table(batch_df, table_dir, mode="append",
                          stream_batch_id=batch_id, stream_app_id=app_id)
    return True


def write_stream_versioned(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start (and for ``available_now=True`` drain) a stream into the
    versioned table at ``table_dir``. Returns the StreamingQuery. The
    checkpoint directory doubles as the idempotence app identity: stable
    across restarts of the same stream, distinct for a new stream."""
    import os

    app_id = os.path.abspath(checkpoint_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        commit_stream_batch(batch_df, batch_id, table_dir, app_id)

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
