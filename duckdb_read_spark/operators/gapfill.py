"""Time-series gap filling (densification) over bucketed aggregates.

The hypertable companion to rollup.py: a metrics/events lake aggregated
into time buckets (``bucket_agg``) has NO row for a bucket with no events,
but downstream consumers (charting, anomaly detection, joins against other
series) need a dense series — one row per bucket per key, with an explicit
fill policy per value column:

- ``"zero"``  — missing buckets count as 0 (counts, sums)
- ``"null"``  — keep the hole visible (rates, averages)
- ``"locf"``  — last observation carried forward (gauges, balances)
- any other literal — constant fill

Scale shape (SCALE.md): the spine is built from a single-row global
min/max aggregate exploded through ``sequence()`` — buckets-per-range rows,
never raw-data-sized — and cross-joined (broadcast) against the distinct
keys. The join back to the actuals is one shuffle on (key, bucket); the
LOCF pass is one window per key ordered by bucket, which AQE cannot split,
so at 100 TB the spine width (range/width) bounds the per-key partition —
the same presplit argument as sessionize applies if a single key's dense
series outgrows an executor (SCALE.md §3.1).

Reference theme: continuous-aggregate / gap-fill surface of timeseries
stores; oracle twin q92 reproduces it in DuckDB with generate_series +
last_value(... IGNORE NULLS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(
    df: DataFrame,
    bucket: str = "bucket",
    width_seconds: int = 900,
    keys: list[str] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Densify a bucketed series: one row per bucket (per key) from the
    global min to max bucket, filling value columns per ``fill`` policy.

    ``df`` is one row per (bucket[, keys]) — e.g. ``bucket_agg`` output.
    ``fill`` maps value-column → ``"zero" | "null" | "locf"`` | literal.
    Unlisted value columns default to ``"null"``.
    """
    keys = keys or []
    fill = dict(fill or {})
    step = F.expr(f"INTERVAL {int(width_seconds)} SECOND")

    # One-row global bounds → exploded dense spine (range/width rows).
    bounds = df.agg(F.min(bucket).alias("mn"), F.max(bucket).alias("mx"))
    spine = bounds.where(F.col("mn").isNotNull()).select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"), step)).alias(bucket)
    )
    if keys:
        spine = df.select(*keys).distinct().crossJoin(F.broadcast(spine))

    out = spine.join(df, on=[bucket, *keys], how="left")
    for col, policy in fill.items():
        dtype = df.schema[col].dataType
        if policy == "null":
            continue
        if policy == "locf":
            w = (
                Window.partitionBy(*keys)
                .orderBy(bucket)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            out = out.withColumn(col, F.last(col, ignorenulls=True).over(w))
        elif policy == "zero":
            out = out.withColumn(col, F.coalesce(F.col(col), F.lit(0).cast(dtype)))
        else:
            out = out.withColumn(col, F.coalesce(F.col(col), F.lit(policy).cast(dtype)))
    return out
