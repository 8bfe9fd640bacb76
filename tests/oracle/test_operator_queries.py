"""Differential oracle harness for the operator-backed queries (q51+).

Same contract as test_declared_queries.py, but the Spark side drives the
DataFrame operator library instead of SQL text. Rows-only entries (no
DuckDB twin) are checked for determinism: two runs must produce identical
normalized rows.
"""

from __future__ import annotations

import pytest

from duckdb_read_spark.op_queries import OP_QUERIES
from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows
from tests.conftest import SF_SMOKE

_WITH_ORACLE = sorted(n for n, s in OP_QUERIES.items() if s.duckdb_sql)
_ROWS_ONLY = sorted(n for n, s in OP_QUERIES.items() if not s.duckdb_sql)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_operator_oracle_match(name, spark, duck):
    spec = OP_QUERIES[name]
    got = spark_rows(spec.runner(spark, SF_SMOKE))
    want = duckdb_rows(duck, spec.duckdb_sql)
    assert len(got) == len(want), diff_summary(got, want)
    assert got == want, diff_summary(got, want)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_operator_deterministic(name, spark):
    spec = OP_QUERIES[name]
    a = spark_rows(spec.runner(spark, SF_SMOKE))
    b = spark_rows(spec.runner(spark, SF_SMOKE))
    assert a == b
    assert len(a) >= 0  # runs and yields a stable schema
