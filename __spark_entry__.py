"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q05 pricing summary, TPC-H Q1 shape) at
sf0.001.  ``queries()`` — one callable per implemented operator from
SURVEY.md §2.  ``oracle_sql()`` — the DuckDB-dialect equivalent for each,
run by the driver against the same parquet tables.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from duckdb_read_spark import op_queries  # noqa: E402
from duckdb_read_spark.catalog import register_tables  # noqa: E402
from duckdb_read_spark.queries import QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    register_tables(spark, _SMOKE_SF_DIR, force=True)
    return spark.sql(QUERIES["q05_pricing_summary"].spark)


def _runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        text = QUERIES[name].spark
        if "RECURSIVE" in text.upper():
            # materialize non-recursive CTE inputs once instead of
            # re-evaluating them every iteration (plans/recursive.py)
            from duckdb_read_spark.plans.recursive import (
                materialize_recursive_inputs,
            )

            text = materialize_recursive_inputs(spark, text)
        return spark.sql(text)

    run.__name__ = f"run_{name}"
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2: the 50 declared
    SQL queries plus the operator-library-backed q51+ entries."""
    out = {name: _runner(name) for name in QUERIES}
    out.update(op_queries.runners())
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect equivalents; driver cross-checks at sf0.01. Entries
    absent here (hash/approximate operators) get the rows-only check."""
    out = {name: spec.duckdb_sql for name, spec in QUERIES.items()}
    out.update(op_queries.oracle_map())
    return out
