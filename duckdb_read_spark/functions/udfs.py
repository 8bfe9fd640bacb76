"""Vectorized UDF surface (SURVEY §2.1 X1-X4).

X1 scalar pandas UDFs (Series→Series, Arrow-batched), X3 grouped-agg pandas
UDF, X4 Python UDTF. X2 (grouped-map) lives where it is used:
operators/similarity.py and operators/multimodal.py use mapInPandas /
applyInPandas directly.

Each UDF has a native-expression twin used by the tests (SURVEY §2.3: UDFs
are engine-internal, verified against the equivalent built-in expression,
not against DuckDB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def vec_l2norm(v: pd.Series) -> pd.Series:
    """X1: L2 norm of an array<float|double> column, one BLAS call per batch."""
    return v.map(lambda a: float(np.linalg.norm(np.asarray(a, dtype=np.float64))))


@F.pandas_udf(DoubleType())
def vec_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """X1: cosine similarity of two array columns (batch-vectorized)."""

    def one(x, y):
        xa = np.asarray(x, dtype=np.float64)
        ya = np.asarray(y, dtype=np.float64)
        d = float(np.linalg.norm(xa) * np.linalg.norm(ya))
        return float(xa @ ya) / d if d else float("nan")

    return pd.Series([one(x, y) for x, y in zip(a, b)])


@F.pandas_udf(DoubleType())
def trimmed_mean(v: pd.Series) -> float:  # type: ignore[misc]
    """X3 GROUPED_AGG: mean after dropping the top/bottom 5% (robust mean)."""
    arr = np.sort(v.to_numpy(dtype=np.float64))
    k = int(len(arr) * 0.05)
    core = arr[k : len(arr) - k] if len(arr) > 2 * k else arr
    return float(core.mean()) if len(core) else float("nan")


class SplitWords:
    """X4 UDTF: one output row per whitespace token (UNNEST-as-function).

    Registered via ``spark.udtf.register``; usable as
    ``SELECT * FROM split_words('a b c')``.
    """

    def eval(self, text: str):  # noqa: D102
        if text:
            for i, tok in enumerate(text.split(" ")):
                yield i, tok


def register_builtin_udfs(engine) -> None:
    """Entry-symbol analog (/root/reference/duckdb:53-55): put the built-in
    function set into the session catalog under stable SQL names."""
    from pyspark.sql.functions import udtf

    engine.spark.udf.register("vec_l2norm", vec_l2norm)
    engine.spark.udf.register("vec_cosine", vec_cosine)
    engine.spark.udf.register("trimmed_mean", trimmed_mean)
    engine.spark.udtf.register("split_words", udtf(SplitWords, returnType="pos INT, tok STRING"))
    engine._functions.update(
        {"vec_l2norm": vec_l2norm, "vec_cosine": vec_cosine, "trimmed_mean": trimmed_mean}
    )
