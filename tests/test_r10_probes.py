"""Judge-probe cross-engine gate (round 10).

The r9 verdict's 84 fresh differential probes found six NEW silent
divergences on undeclared-but-ordinary SQL. This file commits the
probes (and the fixes' edge cases) as a permanent gate — every case is
identical text executed in both engines:

Fixed here (dialect.py / functions/udfs.py r10):
  1. Bare ASC ORDER BY keys: DuckDB defaults NULLS LAST in BOTH
     directions; Spark's ASC default is NULLS FIRST (statement, window,
     ORDER BY ALL, ordinal, LIMIT'd forms).
  2. EMPTY array_agg/string_agg/list → NULL (WHERE false, zero-row
     relation, fully-FILTERed group) — not []/''.
  3. avg() is DOUBLE for every input; DECIMAL '/' is DOUBLE division.
  4. Scalar DOUBLE→VARCHAR renders shortest-round-trip ('1e+16',
     '1e-05', 'nan', 'inf') via __duck_double_varchar__.
  5. DATE ± INTERVAL is TIMESTAMP (any interval class, either + order);
     mixed year-month + day-time interval literals fold to
     make_interval.

Documented divergences are pinned at the bottom so a behavior change
in either engine shows up as a test failure, not a silent drift.
"""

from __future__ import annotations

import duckdb as _duckdb
import pytest

from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows


def _check(engine, duck, q):
    got = spark_rows(engine.sql(q, dialect="duckdb"))
    want = duckdb_rows(duck, q)
    assert got == want, q + "\n" + diff_summary(got, want)


# ---------------------------------------------------------------- 1
def test_bare_order_by_nulls_last(engine, duck):
    """DuckDB's default_null_order is NULLS LAST for ASC and DESC
    [measured: (1,NULL,2) ORDER BY x → 1,2,NULL]; Spark ASC defaults
    NULLS FIRST — the r9 verdict's headline silent row-order wrong
    answer."""
    for q in (
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x",
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x ASC",
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x DESC",
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY ALL",
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY 1",
        "SELECT x FROM (VALUES (1),(NULL),(2),(NULL)) t(x) "
        "ORDER BY x LIMIT 3",
        "SELECT x FROM (VALUES (1),(NULL),(2),(NULL)) t(x) "
        "ORDER BY x LIMIT 2 OFFSET 1",
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY -x",
        "SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x % 2, x",
        "SELECT s FROM (VALUES ('b'),(NULL),('a')) t(s) ORDER BY s",
        "SELECT x FROM (VALUES (1.5),(NULL),(0.5)) t(x) ORDER BY x",
    ):
        _check(engine, duck, q)


def test_multi_key_order_by_mixed_nulls(engine, duck):
    """Multi-column keys with NULLs in several positions, mixed
    explicit/bare directions [measured]."""
    rows = "(VALUES (1,NULL),(NULL,2),(1,1),(2,NULL)) t(x,y)"
    for q in (
        f"SELECT x, y FROM {rows} ORDER BY x, y",
        f"SELECT x, y FROM {rows} ORDER BY x DESC, y",
        f"SELECT x, y FROM {rows} ORDER BY x NULLS FIRST, y DESC",
        f"SELECT x, y FROM {rows} ORDER BY x ASC, y ASC",
    ):
        _check(engine, duck, q)


def test_window_order_by_nulls_last(engine, duck):
    """Window ORDER BY has the same NULLS LAST default [measured:
    row_number numbers the NULL row last] — including inside RANGE /
    ROWS frames and PARTITION BY forms."""
    for q in (
        "SELECT x, row_number() OVER (ORDER BY x) rn "
        "FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY rn",
        "SELECT x, row_number() OVER (ORDER BY x DESC) rn "
        "FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY rn",
        "SELECT x, first_value(x) OVER (ORDER BY x) fv "
        "FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x",
        "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) s "
        "FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x",
        "SELECT x, sum(x) OVER (ORDER BY x RANGE BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) s FROM (VALUES (1),(NULL),(2)) t(x) "
        "ORDER BY x",
        "SELECT g, x, rank() OVER (PARTITION BY g ORDER BY x) r "
        "FROM (VALUES (1,1),(1,NULL),(2,NULL),(2,5)) t(g,x) "
        "ORDER BY g, r",
        "SELECT lag(x) OVER w lx FROM (VALUES (1),(NULL),(2)) t(x) "
        "WINDOW w AS (ORDER BY x) ORDER BY lx",
    ):
        _check(engine, duck, q)


def test_order_by_nulls_in_rewritten_forms(engine, duck):
    """Rewrites that RE-EMIT user sort keys (DISTINCT ON, scalar
    subquery) evaluate them under DuckDB's defaults too."""
    _check(engine, duck,
           "SELECT DISTINCT ON (g) g, x "
           "FROM (VALUES (1,NULL),(1,3),(2,7),(2,NULL)) t(g,x) "
           "ORDER BY g, x")
    _check(engine, duck,
           "SELECT (SELECT x FROM (VALUES (1),(NULL),(2)) t(x) "
           "ORDER BY x) first_x")


# ---------------------------------------------------------------- 2
def test_empty_aggregates_are_null(engine, duck):
    """array_agg/list/string_agg over ZERO rows → NULL [measured:
    WHERE false → NULL; collect_list gives [], array_join '']; an
    all-NULL (non-empty) input keeps DuckDB's element semantics."""
    for q in (
        "SELECT array_agg(x) a FROM (VALUES (1)) t(x) WHERE false",
        "SELECT array_agg(x ORDER BY x) a FROM (VALUES (1)) t(x) "
        "WHERE false",
        "SELECT array_agg(x ORDER BY x DESC) a FROM (VALUES (1)) t(x) "
        "WHERE false",
        "SELECT array_agg(DISTINCT x) a FROM (VALUES (1)) t(x) "
        "WHERE false",
        "SELECT string_agg(x, ',') a FROM (VALUES ('a')) t(x) "
        "WHERE false",
        "SELECT string_agg(x, ',' ORDER BY x) a FROM (VALUES ('a')) "
        "t(x) WHERE false",
        "SELECT string_agg(x) a FROM (VALUES ('a')) t(x) WHERE false",
        "SELECT list(x) a FROM (VALUES (1)) t(x) WHERE false",
        "SELECT array_agg(x) a FROM (VALUES (CAST(NULL AS INT))) t(x)",
        "SELECT string_agg(x, ',') a "
        "FROM (VALUES (CAST(NULL AS VARCHAR))) t(x)",
        "SELECT array_agg(l_orderkey ORDER BY l_orderkey) a "
        "FROM lineitem WHERE l_orderkey < 0",
        "SELECT array_agg(x) FILTER (WHERE x > 5) a "
        "FROM (VALUES (1),(2)) t(x)",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 3
def test_avg_is_double(engine, duck):
    """avg() is DOUBLE for EVERY accepted input in DuckDB [measured:
    typeof(avg(DECIMAL(4,1))) → DOUBLE 2.0]; Spark's decimal avg is
    DECIMAL(p+4,s+4) rendering '2.00000'. VARCHAR casts expose the
    render."""
    dec2 = ("(VALUES (CAST(1.5 AS DECIMAL(4,1))),"
            "(CAST(2.5 AS DECIMAL(4,1)))) t(x)")
    for q in (
        f"SELECT CAST(avg(x) AS VARCHAR) r FROM {dec2}",
        f"SELECT CAST(mean(x) AS VARCHAR) r FROM {dec2}",
        f"SELECT CAST(avg(DISTINCT x) AS VARCHAR) r FROM {dec2}",
        f"SELECT CAST(avg(x) OVER () AS VARCHAR) r FROM {dec2}",
        "SELECT g, CAST(avg(x) FILTER (WHERE x > 1) AS VARCHAR) r "
        "FROM (VALUES (1, CAST(1.5 AS DECIMAL(4,1))),"
        "(1, CAST(2.5 AS DECIMAL(4,1)))) t(g,x) GROUP BY g",
        "SELECT CAST(avg(x) AS VARCHAR) r FROM (VALUES (1),(2)) t(x)",
        "SELECT avg(l_quantity) r FROM lineitem",
    ):
        _check(engine, duck, q)


def test_decimal_division_is_double(engine, duck):
    """'/' yields DOUBLE for every numeric operand pair in DuckDB
    [measured: typeof(1/3), DECIMAL/DECIMAL, 1.5/2 all DOUBLE]; Spark
    keeps DECIMAL when an operand is decimal (0.333333 vs
    0.3333333333333333)."""
    for q in (
        "SELECT CAST(CAST(1 AS DECIMAL(4,1))/CAST(3 AS DECIMAL(4,1)) "
        "AS VARCHAR) r",
        "SELECT CAST(1.5/2 AS VARCHAR) r",
        "SELECT CAST(CAST(10 AS DECIMAL(10,2)) / 4 AS VARCHAR) r",
        "SELECT CAST(2 / CAST(8 AS DECIMAL(10,2)) AS VARCHAR) r",
        "SELECT CAST(7 / 0 AS VARCHAR) r",
        "SELECT CAST(CAST(1 AS DECIMAL(4,1)) / 0 AS VARCHAR) r",
        "SELECT CAST(1.5 % 2 AS VARCHAR) r",
        "SELECT CAST((CAST(1.1 AS DECIMAL(4,1)) + "
        "CAST(2.25 AS DECIMAL(4,2))) * 2 AS VARCHAR) r",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 4
def test_double_varchar_render(engine, duck):
    """Scalar DOUBLE→VARCHAR is shortest-round-trip in DuckDB —
    matches Python repr digit for digit [measured battery r10]."""
    for q in (
        "SELECT CAST(1e16 AS VARCHAR) r",
        "SELECT TRY_CAST(1e16 AS VARCHAR) r",
        "SELECT CAST(1.5e16 AS VARCHAR) r",
        "SELECT CAST(1e15 AS VARCHAR) r",
        "SELECT CAST(1e-5 AS VARCHAR) r",
        "SELECT CAST(1e-4 AS VARCHAR) r",
        "SELECT CAST(1e100 AS VARCHAR) r",
        "SELECT CAST(123456789.123e0 AS VARCHAR) r",
        "SELECT CAST('nan'::DOUBLE AS VARCHAR) r",
        "SELECT CAST('inf'::DOUBLE AS VARCHAR) r",
        "SELECT CAST('-inf'::DOUBLE AS VARCHAR) r",
        "SELECT CAST(0.0::DOUBLE * -1 AS VARCHAR) r",
        "SELECT CAST(CAST(NULL AS DOUBLE) AS VARCHAR) r",
        "SELECT CAST(sqrt(2) AS VARCHAR) r",
        "SELECT CAST(1/3 AS VARCHAR) r",
        "SELECT l_quantity::VARCHAR r FROM lineitem "
        "ORDER BY l_orderkey, l_linenumber LIMIT 5",
        "SELECT CAST(avg(l_quantity) AS VARCHAR) r FROM lineitem",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 5
def test_date_plus_interval_is_timestamp(engine, duck):
    """DATE ± INTERVAL is TIMESTAMP in DuckDB for EVERY interval class
    and either '+' operand order [measured]; Spark keeps DATE for
    year-month/whole-day intervals. date + int stays DATE."""
    for q in (
        "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH a",
        "SELECT DATE '2024-01-31' - INTERVAL 1 MONTH a",
        "SELECT INTERVAL 1 MONTH + DATE '2024-01-31' a",
        "SELECT DATE '2024-01-31' + INTERVAL 2 HOUR a",
        "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH + INTERVAL 2 DAY "
        "a",
        "SELECT DATE '2024-01-31' + 1 a",
        "SELECT CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS VARCHAR) "
        "a",
        "SELECT o_orderdate + INTERVAL 30 DAY a FROM orders "
        "ORDER BY o_orderkey LIMIT 3",
    ):
        _check(engine, duck, q)
    # schema promotion, not just values: the engine result is TIMESTAMP
    df = engine.sql("SELECT DATE '2024-01-31' + INTERVAL 1 MONTH a",
                    dialect="duckdb")
    assert df.schema["a"].dataType.simpleString() == "timestamp"


def test_mixed_interval_literal(engine, duck):
    """A quoted literal mixing year-month with day-time units parses in
    DuckDB but not Spark ('Cannot mix year-month and day-time fields')
    — folded to make_interval, which adds months before days like
    DuckDB [measured: 2024-01-31 + '1 month 2 days' → 2024-03-02]."""
    for q in (
        "SELECT DATE '2024-01-31' + INTERVAL '1 month 2 days' a",
        "SELECT TIMESTAMP '2024-01-31 01:02:03' + "
        "INTERVAL '1 year 1 day' a",
        "SELECT TIMESTAMP '2024-03-31 01:02:03' - "
        "INTERVAL '1 month 1 hour' a",
    ):
        _check(engine, duck, q)


def test_chained_positional_join(engine, duck):
    """``a POSITIONAL JOIN b POSITIONAL JOIN c`` resolves the WHOLE
    chain (ADVICE r9: the pairwise rewrite left 'POSITIONAL JOIN c'
    verbatim — Spark parsed POSITIONAL as an alias and silently
    cross-joined); non-table operands refuse loudly."""
    _check(engine, duck,
           "SELECT r_name, n_name, s_name FROM region POSITIONAL JOIN "
           "nation POSITIONAL JOIN supplier "
           "ORDER BY n_nationkey NULLS LAST, s_name NULLS LAST")
    _check(engine, duck,
           "SELECT r_name, n_name FROM region POSITIONAL JOIN nation "
           "ORDER BY n_nationkey")
    with pytest.raises(NotImplementedError, match="POSITIONAL"):
        engine.sql("SELECT * FROM (SELECT 1) POSITIONAL JOIN nation",
                   dialect="duckdb")


# ------------------------------------------------------- pinned
def test_r10_over_acceptance_pins(engine, duck):
    """Documented over-acceptances from the r9 verdict's probe batch 1
    (engine accepts and answers; DuckDB 1.0.0 errors) — pinned so
    drift in either engine is loud: boolean word casts, string+int
    arithmetic, sqrt/ln domain errors (DuckDB Out of Range; Spark
    NaN/-Infinity under its math semantics), and two functions DuckDB
    1.0 simply lacks (initcap, octet_length)."""
    for q in ("SELECT CAST('yes' AS BOOLEAN) AS c",
              "SELECT '1' + 1 AS c",
              "SELECT sqrt(-1) AS c",
              "SELECT ln(0) AS c",
              "SELECT initcap('ab cd') AS c",
              "SELECT octet_length('ab') AS c"):
        with pytest.raises(_duckdb.Error):
            duck.execute(q).fetchall()
        engine.sql(q, dialect="duckdb").collect()  # over-accepts (doc'd)


def test_negative_zero_literal_pin(engine, duck):
    """``-0.0::DOUBLE``: DuckDB binds '::' tighter than unary minus
    (negating the DOUBLE → '-0.0'). Was a pinned parse-precedence
    divergence through r11; FIXED r12 by _fold_negative_zero_double
    (the unary-minus+zero-literal postfix cast folds to a string-
    parse cast that keeps the sign bit)."""
    q = "SELECT CAST(-0.0::DOUBLE AS VARCHAR) r"
    assert duckdb_rows(duck, q) == [("-0.0",)]
    assert spark_rows(engine.sql(q, dialect="duckdb")) == [("-0.0",)]


def test_sum_bigint_overflow_pin(engine, duck):
    """sum(BIGINT) promotes to HUGEINT in DuckDB [measured:
    9223372036854775807 + 1 sums fine → HUGEINT]; Spark's ANSI sum
    throws ARITHMETIC_OVERFLOW — LOUD, not silent, and int128 has no
    Spark type (SURVEY §1.3 fence). Pinned in both directions; the
    non-overflowing same-shape query must agree."""
    q = ("SELECT sum(x) s FROM "
         "(VALUES (9223372036854775807), (1)) t(x)")
    assert duck.execute(q).fetchall()[0][0] == 9223372036854775808
    with pytest.raises(Exception):
        engine.sql(q, dialect="duckdb").collect()
    _check(engine, duck,
           "SELECT sum(x) s FROM (VALUES (9223372036854775806), (1)) "
           "t(x)")


# ------------------------------------------------- interval tranche
def test_interval_literal_comparisons(engine, duck):
    """DuckDB compares intervals across unit classes by normalizing
    1 month = 30 days = 720 hours [measured]; Spark type-errors on
    cross-class comparisons — literal-vs-literal forms constant-fold
    driver-side."""
    for q in (
        "SELECT INTERVAL '1 month' = INTERVAL '30 days' e",
        "SELECT INTERVAL '1 month' = INTERVAL '31 days' e",
        "SELECT INTERVAL '1 month' > INTERVAL '29 days' e",
        "SELECT INTERVAL '1 year' = INTERVAL '360 days' e",
        "SELECT INTERVAL '1 day' = INTERVAL '24 hours' e",
        "SELECT INTERVAL 90 MINUTE = INTERVAL '1.5 hours' e",
        "SELECT INTERVAL '1 month 1 day' > INTERVAL '30 days 23 "
        "hours' e",
    ):
        _check(engine, duck, q)


def test_interval_varchar_render(engine, duck):
    """Interval→VARCHAR renders DuckDB's component form ('3 days',
    '01:30:00', '1 year 2 months', '-1 year -2 months', fraction
    trimmed) [measured battery]; Spark says \"INTERVAL '3' DAY\".
    Literals fold driver-side; ts−ts routes through the day-time
    render UDF."""
    for q in (
        "SELECT CAST(INTERVAL '1 month' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '14 months' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '-14 months' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '3 days' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '1 day' AS VARCHAR) s",
        "SELECT CAST(INTERVAL 90 MINUTE AS VARCHAR) s",
        "SELECT CAST(INTERVAL '1.5 seconds' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '25 hours' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '2 days 3 hours' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '1 month 2 days' AS VARCHAR) s",
        "SELECT CAST(INTERVAL '1 year 2 months 3 days 04:05:06' "
        "AS VARCHAR) s",
        "SELECT INTERVAL '3 days'::VARCHAR s",
        "SELECT CAST(TIMESTAMP '2024-01-03 05:00:00' - "
        "TIMESTAMP '2024-01-01 02:30:00' AS VARCHAR) d",
        "SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' - "
        "TIMESTAMP '2024-01-03 02:30:00' AS VARCHAR) d",
        "SELECT CAST(CAST(NULL AS TIMESTAMP) - "
        "TIMESTAMP '2024-01-01 00:00:00' AS VARCHAR) d",
        "SELECT CAST(ts - TIMESTAMP '2024-01-01 00:00:00' AS VARCHAR) "
        "d FROM events ORDER BY event_id LIMIT 3",
    ):
        _check(engine, duck, q)


def test_fractional_interval_literals(engine, duck):
    """Quoted interval literals with FRACTIONAL unit values parse in
    DuckDB but not Spark (INVALID_TYPED_LITERAL) — folded to
    make_dt_interval; fractional months cascade into days at storage
    time ('1.5 months' = 1 mon 15 days, measured r8)."""
    for q in (
        "SELECT DATE '2024-01-01' + INTERVAL '1.5 hours' a",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '2.5 days' "
        "a",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1.5 "
        "months' a",
    ):
        _check(engine, duck, q)


def test_timestamptz_varchar_offset(engine, duck):
    """TIMESTAMPTZ→VARCHAR carries the session-zone offset ('…+00'
    under the UTC session both engines pin) [measured]; the naive
    TIMESTAMP render stays offset-less."""
    for q in (
        "SELECT CAST(TIMESTAMPTZ '2024-07-01 12:00:00' AS VARCHAR) t",
        "SELECT CAST(TIMESTAMPTZ '2024-07-01 12:00:00.5' AS VARCHAR) "
        "t",
        "SELECT TIMESTAMPTZ '2024-07-01 12:00:00'::VARCHAR t",
        "SELECT CAST(TIMESTAMP '2024-07-01 12:00:00' AS VARCHAR) t",
        "SELECT CAST(TIMESTAMP WITH TIME ZONE "
        "'2024-07-01 12:00:00+02' AS VARCHAR) t",
    ):
        _check(engine, duck, q)


def test_prefix_abs_unary_minus_and_alias(engine, duck):
    """``@`` prefix abs over a signed operand and before an alias —
    the operand scan stops at an adjacent-primary (alias) boundary
    ('@ -5 a' absorbed the alias before r10, a loud parse error)."""
    for q in (
        "SELECT @ -5 a",
        "SELECT @ 5 a",
        "SELECT 1 + @ 2 - 5 a",
        "SELECT @ x a FROM (VALUES (-3)) s(x)",
    ):
        _check(engine, duck, q)


def test_list_contains_false_not_null(engine, duck):
    """DuckDB contains is FALSE for an absent needle even with NULL
    elements present [measured: list_contains([1,NULL], 3) → FALSE];
    Spark's three-valued array_contains says NULL. NULL list/needle
    stay NULL."""
    for q in (
        "SELECT list_contains([1,NULL], 3) a, "
        "list_contains([1,NULL], 1) b",
        "SELECT list_contains([1,2], NULL) a, list_contains(NULL, 1) b",
        "SELECT list_contains([], 1) a",
        "SELECT array_contains([1,NULL], 3) a, list_has([1,NULL], 3) "
        "b, array_has([1,NULL], 3) c",
        "SELECT list_contains([x], y) a FROM "
        "(VALUES (1, NULL),(NULL, 2),(3, 3)) t(x, y)",
        "SELECT list_position([1,NULL,3], 3) p",
        "SELECT list_position(NULL, 3) p",
    ):
        _check(engine, duck, q)
    # element ORDER of list_distinct is hash-arbitrary in DuckDB and
    # first-seen in Spark (documented §2.4) — compare through list_sort
    _check(engine, duck,
           "SELECT list_sort(list_distinct([1,2,2,NULL])) d")


def test_arg_minmax_skip_null_values(engine, duck):
    """arg_max/arg_min/max_by/min_by skip rows where EITHER argument
    is NULL [measured: arg_min(v,k) over ('a',1),(NULL,0) → 'a'];
    Spark's min_by returns the NULL value sitting at the winning
    key."""
    for q in (
        "SELECT arg_min(v, k) a FROM (VALUES ('a',1),('b',3),(NULL,0))"
        " t(v,k)",
        "SELECT arg_min(v, k) a FROM (VALUES ('a',NULL),('b',3),"
        "('c',2)) t(v,k)",
        "SELECT min_by(v, k) a FROM (VALUES ('a',1),(NULL,0)) t(v,k)",
        "SELECT arg_max(v, k) a FROM (VALUES (NULL,9),('b',3)) t(v,k)",
        "SELECT max_by(v, k) a FROM (VALUES (NULL,9),('b',3)) t(v,k)",
        "SELECT arg_max(v, k) a FROM (VALUES (CAST(NULL AS VARCHAR),9))"
        " t(v,k)",
        "SELECT g, arg_max(v, k) a FROM (VALUES (1,'a',1),(1,NULL,5),"
        "(2,'z',1)) t(g,v,k) GROUP BY g ORDER BY g",
    ):
        _check(engine, duck, q)


def test_json_array_heterogeneous(engine, duck):
    """json_array converts each element INDEPENDENTLY in DuckDB
    [measured: json_array(1, 'a') → '[1,"a"]', NULL → literal null,
    zero args → '[]']; the old array()-based emission was a loud
    analysis error on mixed types."""
    for q in (
        "SELECT json_array(1, 'a') a",
        "SELECT json_array(1, NULL, 'a', [1,2]) a",
        "SELECT json_array() a",
        "SELECT json_array(42) a",
        "SELECT json_array(true, 1.5) a",
    ):
        _check(engine, duck, q)


def test_time_bucket_quoted_unit_width(engine, duck):
    """time_bucket accepts the quoted-unit width spelling
    (INTERVAL '15 minutes') — the old regex wanted the unit outside
    the quotes and silently fell through to a loud error."""
    for q in (
        "SELECT time_bucket(INTERVAL '15 minutes', "
        "TIMESTAMP '2024-06-05 01:22:03') b",
        "SELECT time_bucket(INTERVAL 15 MINUTE, "
        "TIMESTAMP '2024-06-05 01:22:03') b",
        "SELECT time_bucket(INTERVAL '1 week', DATE '2024-06-05') b",
        "SELECT time_bucket(INTERVAL '90 seconds', "
        "TIMESTAMP '2024-06-05 01:22:03') b",
        "SELECT time_bucket(INTERVAL '2 days', DATE '2024-06-05', "
        "DATE '2024-06-01') b",
    ):
        _check(engine, duck, q)


def test_natural_join_no_shared_columns_refuses(engine, duck):
    """NATURAL JOIN with zero shared column names: DuckDB Binder
    Error; Spark silently CROSS-joins — the engine refuses when both
    operands are registered tables with provably disjoint schemas."""
    q = "SELECT * FROM region NATURAL JOIN nation"
    with pytest.raises(_duckdb.Error):
        duck.execute(q).fetchall()
    with pytest.raises(ValueError, match="NATURAL JOIN"):
        engine.sql(q, dialect="duckdb")
    # a REAL natural join (shared column) still works in both
    _check(engine, duck,
           "SELECT n_name, s_name FROM "
           "(SELECT n_nationkey AS k, n_name FROM nation) a "
           "NATURAL JOIN "
           "(SELECT s_nationkey AS k, s_name FROM supplier) b "
           "ORDER BY n_name, s_name LIMIT 5")


def test_array_map_varchar_renders(engine, duck):
    """CAST of arrays with DOUBLE elements renders shortest-round-trip
    per element ('[1e+16, 2.5]' — one double types the whole array
    DOUBLE[], NULLs uppercase); map casts render '{k=v, …}' with NULL
    values spelled NULL (Spark: '{k -> v}') [all measured r10]."""
    for q in (
        "SELECT CAST([1e16] AS VARCHAR) a",
        "SELECT CAST([1e16, 2.5] AS VARCHAR) a",
        "SELECT CAST([1e16, 2] AS VARCHAR) a",
        "SELECT CAST([1e16, NULL] AS VARCHAR) a",
        "SELECT CAST([2.5, 1.5] AS VARCHAR) a",
        "SELECT CAST([1, NULL, 3] AS VARCHAR) a",
        "SELECT CAST(map([1,2],['a','b']) AS VARCHAR) m",
        "SELECT CAST(map([1],[CAST(NULL AS VARCHAR)]) AS VARCHAR) m",
        "SELECT CAST(map(['x y'],['a,b']) AS VARCHAR) m",
        "SELECT CAST(map([1.5],[DATE '2024-01-01']) AS VARCHAR) m",
        "SELECT CAST(map_from_entries([(1,'a')]) AS VARCHAR) m",
    ):
        _check(engine, duck, q)


def test_columns_list_form(engine, duck):
    """COLUMNS(['a', 'b']) — exact-name list star expansion, declared
    order; a missing name refuses like DuckDB's Binder Error."""
    _check(engine, duck,
           "SELECT min(COLUMNS(['n_nationkey', 'n_regionkey'])) "
           "FROM nation")
    _check(engine, duck,
           "SELECT COLUMNS(['n_name']) FROM nation "
           "WHERE n_nationkey = 0")
    with pytest.raises(Exception):
        engine.sql("SELECT COLUMNS(['nope']) FROM nation",
                   dialect="duckdb")


def test_catalog_sweep_function_gaps(engine, duck):
    """Fixes from a full duckdb_functions() catalog sweep (r10) — each
    measured: 1-arg greatest/least identity; 1-arg format with brace
    unescaping; formatReadableSize/DecimalSize ladders (truncated
    decimal, lowercase kB); epoch_us/ms/ns over DATE; array_* aliases
    of the list_* family; current_localtimestamp/current_schemas;
    to_binary = VARCHAR→BIT 0/1 text; bar() with a zero-width range
    renders an empty bar instead of a division error; strptime
    defaults MISSING fields from 1900-01-01 (Spark's to_timestamp
    defaults 1970) — year-less formats shift back 70 years."""
    for q in (
        "SELECT strptime('05', '%m') s",
        "SELECT strptime('abc', 'abc') s",
        "SELECT strptime('2024 05', '%Y %m') s",
        "SELECT try_strptime('xyz', 'abc') s",
        "SELECT try_strptime('05-03', ['%Y', '%m-%d']) s",
        "SELECT epoch_us(DATE '2024-06-05') u, "
        "epoch_ms(DATE '2024-06-05') m, epoch_ns(DATE '2024-06-05') n",
        "SELECT greatest(7) g, least(3) l",
        "SELECT format('abc') f1, format('{{}}') f2, "
        "format('a{{b') f3",
        "SELECT formatReadableSize(1048576) a, "
        "formatReadableDecimalSize(1048576) b, "
        "formatReadableDecimalSize(1500) c, "
        "formatReadableDecimalSize(0) d, "
        "formatReadableDecimalSize(-2000) e",
        "SELECT to_binary('abc') b1, to_binary('é') b2",
        "SELECT current_schemas(true) a, current_schemas(false) b",
        "SELECT array_indexof([10,20], 20) a, array_resize([1], 3) b, "
        "array_reverse_sort([1,3,2]) c, array_select([10,20,30],[2]) "
        "d",
        "SELECT bar(2.5, 2.5, 2.5, 2.5) ba",
        "SELECT bar(5, 0, 10) bb",
        "SELECT current_localtimestamp() IS NOT NULL c",
    ):
        _check(engine, duck, q)


def test_aggregate_catalog_gaps(engine, duck):
    """Aggregate-catalog sweep leftovers (r10, measured):
    arg_max_null/arg_min_null KEEP a NULL value at the winning key
    (= Spark's raw max_by/min_by); count_star() = count(*); sem() =
    stddev_samp / sqrt(n)."""
    rel = ("(VALUES (1, 2.5e0), (2, 1.5e0), (3, CAST(NULL AS DOUBLE)))"
           " t(k, d)")
    for q in (
        f"SELECT arg_max_null(k, d) a FROM {rel}",
        f"SELECT arg_max_null(d, k) a FROM {rel}",
        f"SELECT arg_min_null(d, k) a FROM {rel}",
        f"SELECT count_star() c FROM {rel}",
        f"SELECT sem(d) s FROM {rel}",
        f"SELECT sem(k) s FROM {rel}",
    ):
        _check(engine, duck, q)


def test_catalog_sweep_triage_two(engine, duck):
    """Second triage pass over the catalog sweep's loud names (r10,
    measured): strftime accepts the reversed (fmt, ts) Postgres
    order; length() counts list elements on provable lists;
    list_extract/list_element/array_extract over STRINGS pick 1-based
    chars ('' out-of-range, negatives from the back); zero-arg map();
    grade_up/array_grade_up alias list_grade_up; left/right_grapheme
    via substring_grapheme."""
    for q in (
        "SELECT strftime('%Y-%m', TIMESTAMP '2024-06-05 07:08:09') s",
        "SELECT strftime(TIMESTAMP '2024-06-05 07:08:09', '%Y-%m') s",
        "SELECT length([1,2,3]) l, length('abc') s",
        "SELECT list_element('abc', 2) e, list_extract('abc', -1) f, "
        "array_extract('abc', 9) g, list_extract('abc', 0) z",
        "SELECT list_element([10,20], 2) e",
        "SELECT map() m",
        "SELECT grade_up([3,1,2]) g, array_grade_up([3,1,2]) h",
        "SELECT left_grapheme('héllo', 2) l, "
        "right_grapheme('héllo', 2) r",
        "SELECT left_grapheme('héllo', 0) l, "
        "right_grapheme('héllo', 9) r",
    ):
        _check(engine, duck, q)


def test_window_exclude_group_ties(engine, duck):
    """EXCLUDE GROUP/TIES over RANGE frames containing the current row
    (RANGE bounds snap to peer boundaries, so the frame holds the
    WHOLE peer group): frame-agg minus peer-group-agg, plus the
    current row back for TIES [measured battery incl. NULL values and
    empty residuals]; ROWS-framed forms exclude only in-frame peers
    and refuse loudly."""
    rel = ("(VALUES (1, 1, 10.0e0),(2, 1, 20.0e0),(3, 2, 30.0e0),"
           "(4, 2, CAST(NULL AS DOUBLE)),(5, 3, 50.0e0)) t(id, k, x)")
    fr = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    fu = "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    for q in (
        f"SELECT id, sum(x) OVER (ORDER BY k {fr} EXCLUDE GROUP) s "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, sum(x) OVER (ORDER BY k {fr} EXCLUDE TIES) s "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, count(x) OVER (ORDER BY k {fr} EXCLUDE GROUP) c "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, count(*) OVER (ORDER BY k {fr} EXCLUDE GROUP) c "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, count(*) OVER (ORDER BY k {fr} EXCLUDE TIES) c "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, avg(x) OVER (ORDER BY k {fr} EXCLUDE GROUP) a "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, avg(x) OVER (ORDER BY k {fu} EXCLUDE TIES) a "
        f"FROM {rel} ORDER BY id",
        f"SELECT id, sum(x) OVER (PARTITION BY k % 2 ORDER BY k {fr} "
        f"EXCLUDE GROUP) s FROM {rel} ORDER BY id",
        f"SELECT id, sum(x) OVER (ORDER BY k RANGE BETWEEN 1 "
        f"PRECEDING AND CURRENT ROW EXCLUDE GROUP) s FROM {rel} "
        f"ORDER BY id",
    ):
        _check(engine, duck, q)
    with pytest.raises(NotImplementedError, match="EXCLUDE"):
        engine.sql(
            f"SELECT sum(x) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING "
            f"AND CURRENT ROW EXCLUDE GROUP) s FROM {rel}",
            dialect="duckdb")


def test_pivot_tails_and_count_cells(engine, duck):
    """PIVOT statement forms: a trailing ORDER BY/LIMIT belongs
    OUTSIDE the rewritten relation (it was glued into the agg/group
    text — loud parse error); subquery sources dynamize; count-USING
    pivots fill empty cells with 0 like DuckDB (Spark: NULL);
    reservoir(N ROWS) samples map to TABLESAMPLE (N ROWS) — exact row
    count, membership engine-specific."""
    for q in (
        "PIVOT (SELECT n_regionkey r, n_nationkey % 3 m, "
        "n_nationkey v FROM nation) ON m USING sum(v) GROUP BY r "
        "ORDER BY r",
        "PIVOT nation ON n_regionkey IN (0, 1) USING "
        "sum(n_nationkey) GROUP BY n_name ORDER BY n_name LIMIT 4",
        "PIVOT nation ON n_regionkey USING count(*) GROUP BY n_name "
        "ORDER BY n_name LIMIT 3",
        "PIVOT nation ON n_regionkey IN (0, 1) USING count(*) "
        "GROUP BY n_name ORDER BY n_name LIMIT 4",
        "SELECT count(*) c FROM (SELECT * FROM nation USING SAMPLE "
        "reservoir(5 ROWS) REPEATABLE (42)) t",
        "SELECT count(*) c FROM (SELECT * FROM nation USING SAMPLE "
        "reservoir(7 ROWS)) t",
    ):
        _check(engine, duck, q)


def test_fetch_clause_and_describe_shape(engine, duck):
    """ANSI FETCH FIRST/NEXT n ROWS ONLY (with the OFFSET k ROWS
    prefix) maps to LIMIT/OFFSET in Spark's required order; DESCRIBE
    emits DuckDB's 6-column shape with duck type spellings [measured:
    (column_name, column_type, null, key, default, extra)]."""
    for q in (
        "SELECT n_name FROM nation ORDER BY n_nationkey "
        "FETCH FIRST 3 ROWS ONLY",
        "SELECT n_name FROM nation ORDER BY n_nationkey "
        "OFFSET 2 ROWS FETCH NEXT 2 ROWS ONLY",
        "SELECT n_name FROM nation ORDER BY n_nationkey "
        "FETCH FIRST ROW ONLY",
        "SELECT n_name FROM nation ORDER BY n_nationkey "
        "OFFSET 23 ROWS",
        "SELECT 'FETCH FIRST 3 ROWS ONLY' s",
        "DESCRIBE SELECT n_nationkey, n_name FROM nation",
        "DESCRIBE nation",
    ):
        _check(engine, duck, q)


def test_string_distances_are_byte_based(engine, duck):
    """DuckDB's string-distance family measures UTF-8 BYTES, not
    characters [measured: levenshtein('é','e') = 2,
    jaro_similarity('éa','ea') = 0.0] — the char-based forms silently
    under-count on non-ASCII text."""
    for q in (
        "SELECT levenshtein('héllo', 'hello') a, "
        "levenshtein('abc', '') b, levenshtein('', '') c, "
        "levenshtein(NULL, 'a') d",
        "SELECT editdist3('héllo', 'hello') a, "
        "levenshtein('kitten', 'sitting') b",
        "SELECT damerau_levenshtein('é', 'e') a, "
        "damerau_levenshtein('ca', 'abc') b",
        "SELECT jaro_similarity('éa', 'ea') a, "
        "jaro_similarity('martha', 'marhta') b",
        "SELECT jaro_winkler_similarity('martha', 'marhta') a, "
        "jaro_winkler_similarity('é', 'e') b",
        "SELECT levenshtein('👍', 'x') a",
    ):
        _check(engine, duck, q)
