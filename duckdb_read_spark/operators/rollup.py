"""Hypertable-style multi-resolution rollups (continuous aggregates).

The timescale-style pattern a metrics/event lake needs: maintain aggregate
tables at a ladder of time resolutions (15m → 1h → 1d), where each coarser
level re-aggregates the FINER level's partials instead of rescanning raw
events — sum/count/min/max are associative, avg is carried as (sum, count).
At 100 TB of raw events the 15m partial table is orders of magnitude
smaller, so the daily rollup costs minutes of partial-table scan, not hours
of raw scan. Streaming twin: feed tumbling_counts (windows.py) into the
same re-aggregation.

Bucket alignment is epoch-based (``floor(epoch / width) * width``) — the
portable formulation that DuckDB's epoch()/to_timestamp reproduces exactly
(oracle q70/q71).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Epoch-aligned tumbling bucket start for ``ts``."""
    c = F.col(ts) if isinstance(ts, str) else ts
    secs = F.floor(F.unix_timestamp(c) / width_seconds) * width_seconds
    return F.timestamp_seconds(secs.cast("bigint"))


def bucket_agg(
    df: DataFrame,
    ts: str = "ts",
    width_seconds: int = 900,
    keys: list[str] | None = None,
    value: str = "value",
) -> DataFrame:
    """One rollup level over raw rows: (bucket, keys) → partial aggregates.

    Partials are re-aggregable: n, decimal sum, min, max. The decimal sum
    follows SURVEY §2.0 (no raw double accumulation across engines/levels).
    """
    keys = keys or []
    return (
        df.groupBy(time_bucket(ts, width_seconds).alias("bucket"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value).cast("decimal(18,4)")).cast("decimal(38,4)").alias("sv"),
            F.min(F.col(value)).alias("mn"),
            F.max(F.col(value)).alias("mx"),
        )
    )


def reaggregate(
    fine: DataFrame, width_seconds: int, keys: list[str] | None = None
) -> DataFrame:
    """Coarser level from a finer level's partials — no raw-data rescan."""
    keys = keys or []
    return (
        fine.groupBy(time_bucket("bucket", width_seconds).alias("bucket"), *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").cast("decimal(38,4)").alias("sv"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


def rollup_ladder(
    df: DataFrame,
    ts: str = "ts",
    widths_seconds: tuple[int, ...] = (900, 3600, 86400),
    keys: list[str] | None = None,
    value: str = "value",
) -> dict[int, DataFrame]:
    """The full ladder: finest level from raw rows, each subsequent level
    from the previous level's partials. Widths must be ascending multiples.
    """
    for a, b in zip(widths_seconds, widths_seconds[1:]):
        if b % a != 0:
            raise ValueError(f"rollup widths must nest: {b} % {a} != 0")
    out: dict[int, DataFrame] = {}
    fine = bucket_agg(df, ts, widths_seconds[0], keys, value)
    out[widths_seconds[0]] = fine
    for w in widths_seconds[1:]:
        fine = reaggregate(fine, w, keys)
        out[w] = fine
    return out
