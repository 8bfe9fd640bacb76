"""Sessionization (SURVEY §2.1 T2): gap-based session assembly.

The reference notes' ordered-apply motif (pub/sub of a WAL stream, apply in
LSN order — /root/reference/neon:14-16, neon:53-57) is the batch analog of
assigning events to sessions in timestamp order per key. Batch semantics
match DuckDB's lag/sum-over-window formulation (oracle Q46); the streaming
twin is ``session_window`` in streaming/windows.py.

Scale note: one hash shuffle on the key column, then per-partition sort —
the same cost profile as any window function. Skewed keys (one user with
millions of events) are the hazard; AQE skew handling does not apply to
window functions. ``presplit`` bounds the hazard: windows partition on
(key, time-bucket) so no single window partition exceeds one bucket of one
key, and a second (tiny, one-row-per-key-per-bucket) window stitches the
session index across bucket boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DURATION_UNITS = {
    "second": 1, "seconds": 1, "sec": 1, "secs": 1, "s": 1,
    "minute": 60, "minutes": 60, "min": 60, "mins": 60, "m": 60,
    "hour": 3600, "hours": 3600, "h": 3600,
    "day": 86400, "days": 86400, "d": 86400,
    "week": 604800, "weeks": 604800, "w": 604800,
}


def _duration_seconds(presplit: int | float | str) -> float:
    """'1 day' / '6 hours' / plain seconds → seconds."""
    if isinstance(presplit, (int, float)):
        return float(presplit)
    parts = presplit.strip().lower().split()
    if len(parts) == 1 and parts[0] in _DURATION_UNITS:
        return float(_DURATION_UNITS[parts[0]])
    if len(parts) == 2 and parts[1] in _DURATION_UNITS:
        return float(parts[0]) * _DURATION_UNITS[parts[1]]
    raise ValueError(f"cannot parse presplit duration: {presplit!r}")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
    session_col: str = "sess",
    presplit: int | float | str | None = None,
) -> DataFrame:
    """Assign a 0-based session index per key: a new session starts when the
    gap since the previous event exceeds ``gap_seconds``.

    ``presplit`` (e.g. ``'1 day'`` or seconds) is the hot-key mitigation
    from SCALE.md §3.1: identical results, but the big window runs per
    (key, bucket) so a key with millions of events never serializes through
    one window partition. Requires ``presplit > gap_seconds`` (a session
    gap can then span at most one bucket boundary, which the stitch window
    accounts for exactly).
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    if presplit is None:
        w = Window.partitionBy(key).orderBy(*order)
        gap = F.col(ts).cast("double") - F.lag(F.col(ts)).over(w).cast("double")
        brk = F.when(gap > gap_seconds, 1).otherwise(0)
        run = Window.partitionBy(key).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn("__brk", brk).withColumn(
            session_col, F.sum("__brk").over(run)
        ).drop("__brk")

    bucket_s = _duration_seconds(presplit)
    if bucket_s <= gap_seconds:
        raise ValueError(
            f"presplit ({bucket_s}s) must exceed gap_seconds ({gap_seconds}s)"
        )
    # Phase 1: local breaks + running session index within (key, bucket).
    # The first event of each bucket gets brk=0 (lag is NULL); whether it
    # actually continues the previous bucket's session is decided in phase 2.
    e = df.withColumn("__bkt", F.floor(F.col(ts).cast("double") / F.lit(bucket_s)))
    wl = Window.partitionBy(key, "__bkt").orderBy(*order)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts)).over(wl).cast("double")
    brk = F.when(gap > gap_seconds, 1).otherwise(0)
    runl = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = e.withColumn("__brk", brk).withColumn("__loc", F.sum("__brk").over(runl))
    # Phase 2: one summary row per (key, bucket) — breaks in the bucket and
    # the bucket's first/last timestamps. The stitch window runs over THIS
    # table (|keys| × |buckets| rows, orders of magnitude smaller than the
    # events), so the per-key partition is bounded by the bucket count.
    summ = local.groupBy(key, "__bkt").agg(
        F.sum("__brk").alias("__nbrk"),
        F.min(F.col(ts).cast("double")).alias("__fts"),
        F.max(F.col(ts).cast("double")).alias("__lts"),
    )
    wb = Window.partitionBy(key).orderBy("__bkt")
    boundary_brk = F.when(
        F.col("__fts") - F.lag("__lts").over(wb) > gap_seconds, 1
    ).otherwise(0)
    prev_brks = F.coalesce(
        F.sum("__nbrk").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    offsets = summ.withColumn("__bb", boundary_brk).withColumn(
        "__off",
        prev_brks
        + F.sum("__bb").over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).select(key, "__bkt", "__off")
    return (
        local.join(offsets, on=[key, "__bkt"], how="inner")
        .withColumn(session_col, (F.col("__loc") + F.col("__off")).cast("long"))
        .drop("__brk", "__loc", "__bkt", "__off")
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
    presplit: int | float | str | None = None,
) -> DataFrame:
    """Per-session aggregate (the Q46 oracle shape): count + time bounds."""
    s = sessionize(df, key, ts, gap_seconds, order_tiebreak, presplit=presplit)
    return (
        s.groupBy(key, "sess")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts).alias("t0"),
            F.max(ts).alias("t1"),
        )
        .orderBy(key, "sess")
    )
