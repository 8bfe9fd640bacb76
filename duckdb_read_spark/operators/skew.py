"""Skew & distribution helpers (SURVEY §7 P6; §4.2 skew handling).

AQE handles skewed *sort-merge joins* automatically; it does NOT split a
hot key inside a hash aggregation whose per-group state is large
(collect_list/collect_set/percentiles), nor a window function's partition.
These helpers cover those gaps:

* salted_collect — two-stage set/list aggregation: partial aggregate on
  (key, salt) so the hot key's state is built on ``salt_buckets`` reducers,
  then merge the partials per key. Turns one O(hot-key) reducer into
  ``salt_buckets`` parallel ones at the cost of a second (tiny) shuffle.
* broadcast_small — explicit broadcast hint gated by an estimated size
  check, for when statistics are missing and AQE can't see the small side.
* repartition_for_join — co-partition two frames on the join key so a
  subsequent join shuffles neither side again (manual bucketing analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 32,
    distinct: bool = False,
    sort_result: bool = True,
) -> DataFrame:
    """collect_list/collect_set per key with hot-key-safe two-stage shuffle.

    Output: key columns + ``values`` array (sorted when ``sort_result`` so
    the result is deterministic — SURVEY §2.0 rule 1 applied to arrays).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    partial_fn = F.collect_set if distinct else F.collect_list
    partial = salted.groupBy(*key_cols, "__salt").agg(
        partial_fn(F.col(value_col)).alias("__part")
    )
    merged = partial.groupBy(*key_cols).agg(
        F.flatten(F.collect_list("__part")).alias("values")
    )
    if distinct:
        merged = merged.withColumn("values", F.array_distinct("values"))
    if sort_result:
        merged = merged.withColumn("values", F.sort_array("values"))
    return merged


def broadcast_small(df: DataFrame, max_rows: int = 1_000_000) -> DataFrame:
    """Broadcast hint with a row-count guard: refuses to hint a frame whose
    quick count exceeds ``max_rows`` (broadcasting a big side OOMs every
    executor at once — the one mistake AQE cannot undo).

    Note: the guard is an EAGER job — it materializes the small side once
    (bounded by ``limit(max_rows+1)``) at call time, inside what otherwise
    looks like plan construction. That is the price of the check; cache the
    frame first if it is expensive to recompute."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"refusing to broadcast: >{max_rows} rows (got at least {n})"
        )
    return F.broadcast(df)


def repartition_for_join(
    left: DataFrame, right: DataFrame, on: list[str], partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Hash-co-partition both sides on the join key. The subsequent equi-join
    reuses both distributions (no further shuffle) — the in-session analog of
    writing bucketed tables."""
    if partitions:
        return (
            left.repartition(partitions, *on),
            right.repartition(partitions, *on),
        )
    return left.repartition(*on), right.repartition(*on)
