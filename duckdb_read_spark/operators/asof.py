"""AS-OF join (SURVEY §2.1 J10, §4.3.2).

The reference dialect has a native ``ASOF JOIN`` (per left row, pick the
latest right row with matching keys and ``right.ts <= left.ts``); the notes'
WAL/event-ordering motif is the same alignment problem
(/root/reference/neon:51-59). Spark has no native ASOF, so two strategies:

* ``join`` — range join + ``max_by`` re-aggregation. Simple, exact, but the
  intermediate is O(matches): every (left, earlier-right) pair materializes
  before the aggregate collapses it. Fine when right side per key is small.

* ``union`` — the scalable path: tag both sides, union, repartition by key,
  sort by (ts, side), and carry the last-seen right row forward with a
  ``last(..., ignorenulls)`` window. One shuffle each side, no pair blowup —
  at 100 TB this is the only shape that survives (the range join degrades
  quadratically per key; this stays O(n log n) per partition).

``auto`` picks ``union``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strategy: str = "auto",
) -> DataFrame:
    """For each left row, attach the latest right row with equal ``by`` keys
    and ``right[on] <= left[on]`` (backward as-of, DuckDB semantics).

    ``right_cols``: right columns to carry (default: all non-key, non-time).
    Carried columns are renamed with ``suffix`` if they collide with left.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    if strategy == "join":
        return _asof_via_range_join(left, right, on, by, right_cols, suffix)
    return _asof_via_union(left, right, on, by, right_cols, suffix)


def _carried_name(left: DataFrame, c: str, suffix: str) -> str:
    return c + suffix if c in left.columns else c


def _asof_via_range_join(left, right, on, by, right_cols, suffix) -> DataFrame:
    r = right.select(
        *[F.col(b).alias(f"__r_{b}") for b in by],
        F.col(on).alias("__r_on"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    cond = [left[b] == r[f"__r_{b}"] for b in by] + [left[on] >= r["__r_on"]]
    joined = left.join(r, cond, "left")
    # max_by over the struct keeps all carried columns from the same row.
    carried = F.max_by(
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]), F.col("__r_on")
    ).alias("__best")
    out = joined.groupBy(*[left[c] for c in left.columns]).agg(carried)
    for c in right_cols:
        out = out.withColumn(_carried_name(left, c, suffix), F.col(f"__best.{c}"))
    return out.drop("__best")


def _asof_via_union(left, right, on, by, right_cols, suffix) -> DataFrame:
    # Side tag orders right rows before left rows at equal timestamps, so a
    # right row with ts == left ts IS visible to that left row (<= semantics).
    # The whole right row travels as ONE struct: per-column carry-forward
    # would mix values from different right rows when a right column holds
    # legitimate NULLs.
    rrow = F.struct(*[F.col(c) for c in right_cols])
    rhs = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        rrow.alias("__rrow"),
    )
    lhs = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    ).withColumn("__rrow", F.lit(None).cast(rhs.schema["__rrow"].dataType))
    rhs = rhs.withColumn(
        "__lrow", F.lit(None).cast(lhs.schema["__lrow"].dataType)
    )
    merged = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__rrow", F.last(F.col("__rrow"), ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    proj = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rrow.{c}").alias(_carried_name(left, c, suffix)) for c in right_cols
    ]
    return out.select(*proj)
