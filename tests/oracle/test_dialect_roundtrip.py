"""Dialect round-trip (SURVEY §7 P3): feed the SAME DuckDB-dialect text to
both engines — DuckDB runs it natively, Spark runs it through
``to_spark_sql`` — and require identical normalized results.

This is a stronger claim than test_declared_queries.py (which uses
hand-written per-dialect texts): it proves the rewriter alone closes the
mechanical §2.4 divergences.

No exclusions: q50's native ``ASOF LEFT JOIN`` text rewrites to the
correlated-LATERAL form (dialect.py item 10) since round 3.

q36 (date+interval, date_diff width) round-trips since the rewriter casts
date_diff to BIGINT and the normalizer equates DATE with midnight
TIMESTAMP; q46 (ts - ts > INTERVAL) round-trips because Spark's ANSI
DayTimeInterval comparison matches DuckDB's interval comparison.
"""

from __future__ import annotations

import pytest

from duckdb_read_spark.dialect import to_spark_sql
from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows
from duckdb_read_spark.queries import QUERIES

@pytest.mark.parametrize("name", sorted(QUERIES))
def test_duckdb_text_roundtrips_through_rewriter(name, engine, duck):
    spec = QUERIES[name]
    duck_text = spec.duckdb if spec.duckdb is not None else spec.spark
    got = spark_rows(engine.sql(duck_text, dialect="duckdb"))
    want = duckdb_rows(duck, spec.duckdb_sql)
    assert got == want, diff_summary(got, want)


@pytest.mark.parametrize("expr,unit", [
    ("date_diff('month', DATE '2020-01-31', DATE '2020-02-01')", "month-boundary"),
    ("date_diff('month', DATE '2020-01-01', DATE '2020-03-31')", "month-span"),
    ("date_diff('hour', TIMESTAMP '2020-01-01 01:59:00', TIMESTAMP '2020-01-01 02:01:00')", "hour-boundary"),
    ("date_diff('minute', TIMESTAMP '2020-01-01 01:00:59', TIMESTAMP '2020-01-01 01:01:01')", "minute-boundary"),
    ("date_diff('year', DATE '2019-12-31', DATE '2020-01-01')", "year-boundary"),
    ("date_diff('day', TIMESTAMP '2020-01-01 23:59:00', TIMESTAMP '2020-01-02 00:01:00')", "day-boundary"),
])
def test_date_diff_boundary_semantics_match_duckdb(expr, unit, engine, duck):
    got = engine.sql(f"SELECT {expr} AS d", dialect="duckdb").first()["d"]
    want = duck.execute(f"SELECT {expr} AS d").fetchone()[0]
    assert got == want, unit


_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
ORDER BY o_custkey, o_totalprice DESC, o_orderkey
"""


def test_qualify_roundtrips_vs_duckdb(engine, duck):
    """DuckDB QUALIFY (top-2 orders per customer) through the rewriter must
    match DuckDB running the same text natively."""
    got = spark_rows(engine.sql(_QUALIFY_SQL, dialect="duckdb"))
    want = duckdb_rows(duck, _QUALIFY_SQL)
    assert got == want, diff_summary(got, want)


def test_using_sample_runs_on_spark(engine):
    """USING SAMPLE is syntax-mapped to TABLESAMPLE; membership is
    engine-RNG-specific (SURVEY §2.3), so only the bound is checked."""
    n = engine.sql(
        "SELECT COUNT(*) AS n FROM (SELECT * FROM orders USING SAMPLE 10%)",
        dialect="duckdb",
    ).first()["n"]
    total = engine.sql("SELECT COUNT(*) AS n FROM orders").first()["n"]
    assert 0 <= n < total


def test_pivot_statement_roundtrips_vs_duckdb(engine, duck):
    # sum over an integral column: CAST(double AS BIGINT) would diverge
    # (DuckDB rounds, Spark truncates — SURVEY §2.4)
    sql = ("PIVOT orders ON o_orderstatus IN ('O','F') "
           "USING sum(o_orderkey) GROUP BY o_orderpriority")
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, diff_summary(got, want)


def test_unpivot_statement_roundtrips_vs_duckdb(engine, duck):
    sql = ("UNPIVOT (SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS s "
           "FROM nation GROUP BY n_regionkey) ON n, s INTO NAME metric VALUE val")
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, diff_summary(got, want)
