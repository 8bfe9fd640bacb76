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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row with equal ``by``
    keys: ``direction='backward'`` (default, DuckDB ASOF semantics) takes
    the latest right with ``right[on] <= left[on]``; ``'forward'`` takes
    the earliest right with ``right[on] >= left[on]``.

    ``tolerance_seconds`` bounds the match distance (pandas merge_asof
    semantics): matches farther than the tolerance yield NULLs.

    ``right_cols``: right columns to carry (default: all non-key, non-time).
    Carried columns are renamed with ``suffix`` if they collide with left.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    if strategy == "join":
        return _asof_via_range_join(
            left, right, on, by, right_cols, suffix, direction, tolerance_seconds
        )
    return _asof_via_union(
        left, right, on, by, right_cols, suffix, direction, tolerance_seconds
    )


def _carried_name(left: DataFrame, c: str, suffix: str) -> str:
    return c + suffix if c in left.columns else c


def _asof_via_range_join(
    left, right, on, by, right_cols, suffix, direction="backward", tolerance=None
) -> DataFrame:
    # Group by a synthetic unique row id, not the left columns: grouping on
    # left columns would merge duplicate left rows (as-of must preserve left
    # cardinality) and fails outright for non-groupable types (map columns).
    lid = left.withColumn("__lid", F.monotonically_increasing_id())
    r = right.select(
        *[F.col(b).alias(f"__r_{b}") for b in by],
        F.col(on).alias("__r_on"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    cond = [lid[b] == r[f"__r_{b}"] for b in by]
    gap = (
        lid[on].cast("double") - r["__r_on"].cast("double")
        if direction == "backward"
        else r["__r_on"].cast("double") - lid[on].cast("double")
    )
    cond.append(gap >= 0)
    if tolerance is not None:
        cond.append(gap <= float(tolerance))
    joined = lid.join(r, cond, "left")
    # min/max_by over the struct keeps all carried columns from the same row.
    pick = F.max_by if direction == "backward" else F.min_by
    carried = pick(
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]), F.col("__r_on")
    ).alias("__best")
    lrow = F.first(
        F.struct(*[lid[c].alias(c) for c in left.columns]), ignorenulls=False
    ).alias("__lrow")
    out = joined.groupBy(F.col("__lid")).agg(lrow, carried)
    proj = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__best.{c}").alias(_carried_name(left, c, suffix)) for c in right_cols
    ]
    return out.select(*proj)


def _asof_via_union(
    left, right, on, by, right_cols, suffix, direction="backward", tolerance=None
) -> DataFrame:
    # Side tag orders right rows before left rows at equal timestamps, so a
    # right row with ts == left ts IS visible to that left row (<=/>=
    # semantics). The whole right row travels as ONE struct (with its own
    # timestamp, for the tolerance check): per-column carry-forward would
    # mix values from different right rows when a right column holds
    # legitimate NULLs.
    rrow = F.struct(
        F.col(on).alias("__rts"), *[F.col(c) for c in right_cols]
    )
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
    # backward: ascending scan carries the latest earlier right row forward;
    # forward: descending scan carries the earliest later right row back.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__rrow", F.last(F.col("__rrow"), ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    if tolerance is not None:
        lts = F.col("__ts").cast("double")
        rts = F.col("__rrow.__rts").cast("double")
        gap = (lts - rts) if direction == "backward" else (rts - lts)
        out = out.withColumn(
            "__rrow",
            F.when(gap <= float(tolerance), F.col("__rrow")),
        )
    proj = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rrow.{c}").alias(_carried_name(left, c, suffix)) for c in right_cols
    ]
    return out.select(*proj)
