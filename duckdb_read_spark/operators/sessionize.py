"""Sessionization (SURVEY §2.1 T2): gap-based session assembly.

The reference notes' ordered-apply motif (pub/sub of a WAL stream, apply in
LSN order — /root/reference/neon:14-16, neon:53-57) is the batch analog of
assigning events to sessions in timestamp order per key. Batch semantics
match DuckDB's lag/sum-over-window formulation (oracle Q46); the streaming
twin is ``session_window`` in streaming/windows.py.

Scale note: one hash shuffle on the key column, then per-partition sort —
the same cost profile as any window function. Skewed keys (one user with
millions of events) are the hazard; AQE skew handling does not apply to
window functions, so extremely hot keys should be pre-split upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
    session_col: str = "sess",
) -> DataFrame:
    """Assign a 0-based session index per key: a new session starts when the
    gap since the previous event exceeds ``gap_seconds``."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts)).over(w).cast("double")
    brk = F.when(gap > gap_seconds, 1).otherwise(0)
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__brk", brk).withColumn(
        session_col, F.sum("__brk").over(run)
    ).drop("__brk")


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Per-session aggregate (the Q46 oracle shape): count + time bounds."""
    s = sessionize(df, key, ts, gap_seconds, order_tiebreak)
    return (
        s.groupBy(key, "sess")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts).alias("t0"),
            F.max(ts).alias("t1"),
        )
        .orderBy(key, "sess")
    )
