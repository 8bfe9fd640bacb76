"""Differential oracle harness (SURVEY §5.1, driver t2 mirror).

Every declared query from SURVEY §2.2 runs in Spark (our engine) and in
DuckDB (the oracle) over the same parquet fixtures; normalized results must
match exactly.
"""

from __future__ import annotations

import pytest

from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows
from duckdb_read_spark.queries import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match(name, engine, duck):
    spec = QUERIES[name]
    got = spark_rows(engine.sql(spec.spark))
    want = duckdb_rows(duck, spec.duckdb_sql)
    assert len(got) == len(want), diff_summary(got, want)
    assert got == want, diff_summary(got, want)
