"""Streaming window operators (SURVEY §2.1 T1/T2/T3).

Each operator works on BOTH a batch and a streaming DataFrame — the same
declarative plan, Catalyst picks the stateful physical operators when the
input is a stream. The batch-mode outputs are the Q45/Q46 oracle shapes,
which is how the equivalence tests pin the semantics.

Scale: streaming state is partitioned by the grouping key across executors
(state store per shuffle partition); the watermark bounds state size — no
watermark means unbounded state at 100 TB. ``tumbling_counts`` state per
key is O(1); ``session_aggs`` holds one open session per (user, gap window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    size: str = "1 hour",
    ts: str = "ts",
    extra_key: str | None = "event_type",
    value_col: str | None = "value",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums (T1; batch twin = Q45).

    Epoch-aligned tumbling windows: ``window.start`` equals
    ``date_trunc('hour', ts)`` for the 1-hour default, which is exactly the
    Q45 batch formulation.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    keys = [F.window(F.col(ts), size).alias("win")]
    if extra_key:
        keys.append(F.col(extra_key))
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("decimal(38,4)").alias("sv")
        )
    out = df.groupBy(*keys).agg(*aggs)
    cols = [F.col("win.start").alias("w")] + ([F.col(extra_key)] if extra_key else []) + [
        F.col("n")
    ] + ([F.col("sv")] if value_col else [])
    return out.select(*cols)


def sliding_counts(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "15 minutes",
    ts: str = "ts",
    extra_key: str | None = "event_type",
    value_col: str | None = "value",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) window counts/sums: each event lands in
    size/slide overlapping windows. Same batch/stream duality as
    tumbling_counts; the batch twin is the explode-offsets SQL formulation
    (an event at t belongs to every window starting in
    (t - size, t] on a slide grid). State per key is O(size/slide) windows."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    keys = [F.window(F.col(ts), size, slide).alias("win")]
    if extra_key:
        keys.append(F.col(extra_key))
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("decimal(38,4)").alias("sv")
        )
    out = df.groupBy(*keys).agg(*aggs)
    cols = [F.col("win.start").alias("w")] + ([F.col(extra_key)] if extra_key else []) + [
        F.col("n")
    ] + ([F.col("sv")] if value_col else [])
    return out.select(*cols)


def session_aggs(
    events: DataFrame,
    gap: str = "30 minutes",
    ts: str = "ts",
    key: str = "user_id",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Gap-based session aggregates via ``session_window`` (T2).

    Batch twin = operators.sessionize.session_stats / oracle Q46, compared
    on the session *content* (key, n, t0, t1) — session ids differ (ordinal
    vs window bounds) but the partition of events into sessions is the same
    whenever no two consecutive events are exactly ``gap`` apart (the open
    interval vs closed interval edge; see tests).
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts), gap).alias("sw"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts).alias("t0"),
            F.max(ts).alias("t1"),
        )
        .select(F.col(key), F.col("n"), F.col("t0"), F.col("t1"))
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    within: str = "INTERVAL 1 DAY",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (T7): match right events to left events
    on ``key`` where ``left_ts - within <= right_ts <= left_ts``. The same
    plan runs in batch mode (the equivalence-test oracle shape).

    Streaming semantics: BOTH sides carry a watermark and the join
    condition time-bounds the match, so Spark can evict buffered rows once
    the watermark passes ``left_ts - within`` — without the interval bound
    the state would be unbounded (the classic stream-join cliff). Outer
    joins additionally emit unmatched rows only after the watermark closes
    their window, so ``how='left_outer'`` output lags by the watermark.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.expr(f"{left_ts} - {within}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, how).drop(rw[key])


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str | None = None):
    """Drain a stream into an in-memory table with availableNow semantics
    (process everything currently in the source, then stop). Returns the
    query after awaiting termination; results at ``SELECT * FROM <name>``.

    ``output_mode=None`` picks a mode the memory sink accepts: ``complete``
    for aggregated plans, ``append`` otherwise (the memory sink rejects
    complete for non-aggregated streams, e.g. stream_dedup output)."""
    if output_mode is None:
        analyzed = stream_df._jdf.queryExecution().analyzed().toString()
        output_mode = "complete" if "Aggregate" in analyzed else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
