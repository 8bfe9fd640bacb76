"""Grouped-map transforms (SURVEY §2.1 X2): applyInPandas per group.

The canonical X2 shape: a whole group arrives as one pandas DataFrame, the
kernel computes group-relative features. Used where the computation is
genuinely per-group-imperative; anything expressible as a window function
should BE a window function (JVM-side) — zscore_normalize exists in both
forms precisely so the tests can pin their equivalence and the docstring
can point at the faster one.

Scale: one hash shuffle on the group key; each group must fit in one
executor's memory as a pandas frame — the operator guards nothing, callers
group by keys with bounded cardinality per key (lang, day, ...), never by
a key with 10⁸-row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_normalize_pandas(
    df: DataFrame, group_col: str, value_col: str, out: str = "z"
) -> DataFrame:
    """X2 grouped-map: per-group z-score via applyInPandas."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=1)
        pdf[out] = (v - v.mean()) / sd if sd and sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(kernel, schema)


def zscore_normalize_window(
    df: DataFrame, group_col: str, value_col: str, out: str = "z"
) -> DataFrame:
    """Same semantics, JVM-side window functions — the preferred hot path."""
    w = Window.partitionBy(group_col)
    mean = F.avg(F.col(value_col)).over(w)
    sd = F.stddev_samp(F.col(value_col)).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mean) / sd).otherwise(F.lit(0.0))
    return df.withColumn(out, z)
