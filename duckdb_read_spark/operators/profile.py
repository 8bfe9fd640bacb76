"""Column profiling: per-column stats in ONE scan (corpus QA step).

``profile_columns`` computes count / nulls / distinct / min / max (+ mean
and exact median for numerics) for every requested column in a single
aggregation: each column contributes a struct of its stats, the one result
row is exploded back into a row per column. No per-column scans, no
driver-side loop over columns.

Distinct counts default to ``approx_count_distinct`` (HLL — one pass, no
expand) because k exact COUNT(DISTINCT)s in one aggregate make Catalyst
expand the input k-fold, which at 100 TB is k extra shuffles' worth of
rows. ``exact_distinct=True`` opts into the expand (bounded column lists,
oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float")


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    structs = []
    for c in cols:
        numeric = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        distinct = (
            F.countDistinct(F.col(c)) if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        med = (
            F.expr(f"CAST(CAST(median({c}) AS DECIMAL(28,4)) AS DOUBLE)")
            if numeric else F.lit(None).cast("double")
        )
        mean = (
            F.expr(f"CAST(CAST(avg({c}) AS DECIMAL(28,4)) AS DOUBLE)")
            if numeric else F.lit(None).cast("double")
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
                distinct.cast("long").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_str"),
                F.max(F.col(c)).cast("string").alias("max_str"),
                mean.alias("mean"),
                med.alias("med"),
            )
        )
    return (
        df.agg(F.array(*structs).alias("__p"))
        .select(F.explode("__p").alias("__s"))
        .select("__s.*")
        .orderBy("column")
    )
