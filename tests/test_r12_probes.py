"""Judge-probe cross-engine gate (round 12).

Commits the r11 verdict's fresh findings ("What's wrong" #2-#10,
"What's missing" #1-#2) and the r11 ADVICE items as a permanent
differential gate — every positive case is identical text executed in
both engines; refusal parity and documented divergences are pinned so
a behavior change in either engine fails a test instead of drifting.

Fixed here (dialect.py / engine.py r12):
  A1. The bare-integer WHERE/HAVING→boolean rewrite is token-aware —
      it can no longer fire inside string literals.
  A2. E'…' decoding skips dollar-quoted $$…$$ spans (their content is
      RAW in DuckDB).
  A3. CREATE TEMP TABLE colliding with a permanent table SHADOWS it
      (session temp catalog) instead of overwriting the warehouse dir
      (tests/test_ddl.py::test_temp_table_shadows_permanent).
  A4. xor() over unequal-length BIT literals raises (Invalid Input
      parity) instead of zip-truncating.
  A5. set_bit() past the bit string's length raises (Out of Range
      parity) instead of appending a bit.
"""

from __future__ import annotations

import pytest

from duckdb_read_spark.dialect import to_spark_sql
from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows


def _check(engine, duck, q):
    got = spark_rows(engine.sql(q, dialect="duckdb"))
    want = duckdb_rows(duck, q)
    assert got == want, q + "\n" + diff_summary(got, want)


# ------------------------------------------------------------ ADVICE 1
def test_where_integer_rewrite_is_token_aware(engine, duck):
    """'WHERE 1' inside a string literal is CONTENT, not a filter —
    the old raw re.sub rewrote it to 'WHERE (1 <> 0)' inside the
    returned string (ADVICE r11)."""
    _check(engine, duck, "SELECT 'filter: WHERE 1 ORDER BY x' AS s")
    _check(engine, duck, "SELECT 'a HAVING 2 LIMIT b' AS s")
    # the real rewrite still fires, whole-predicate only
    _check(engine, duck,
           "SELECT count(*) AS n FROM (VALUES (1), (2)) t(x) WHERE 1")
    _check(engine, duck,
           "SELECT count(*) AS n FROM (VALUES (1), (2)) t(x) WHERE 0")
    _check(engine, duck,
           "SELECT x, count(*) AS n FROM (VALUES (1), (2)) t(x) "
           "GROUP BY x HAVING 1 ORDER BY x")
    _check(engine, duck,
           "SELECT n FROM (SELECT count(*) AS n FROM (VALUES (1)) "
           "t(x) WHERE 1) q")


# ------------------------------------------------------------ ADVICE 2
def test_escape_decode_skips_dollar_strings(engine, duck):
    r"""$$…$$ content is raw in DuckDB — an e'\n' shape inside must
    survive verbatim (the decoder used to run first and eat it)."""
    _check(engine, duck, r"SELECT $$keep e'\n' raw$$ AS s")
    _check(engine, duck, r"SELECT $tag$mix e'\t' and '' quotes$tag$ AS s")
    # E'…' outside the span still decodes
    _check(engine, duck, r"SELECT E'a\tb' AS s, $$e'\x41'$$ AS t")


# ---------------------------------------------------------- ADVICE 4+5
def test_bit_fold_error_parity():
    """xor() unequal lengths and set_bit() out-of-range raise like
    DuckDB instead of silently truncating/appending (ADVICE r11)."""
    with pytest.raises(ValueError, match="XOR bit strings"):
        to_spark_sql("SELECT xor('101'::BIT, '10'::BIT)")
    with pytest.raises(ValueError, match="[Oo]ut of [Rr]ange"):
        to_spark_sql("SELECT set_bit('101'::BIT, 7, 1)")
    with pytest.raises(ValueError, match="[Oo]ut of [Rr]ange"):
        to_spark_sql("SELECT set_bit('101'::BIT, 3, 0)")
    # in-range / equal-length forms still fold
    assert "'011'" in to_spark_sql("SELECT xor('101'::BIT, '110'::BIT)")
    assert "'111'" in to_spark_sql("SELECT set_bit('101'::BIT, 1, 1)")


# ------------------------------------------------------------ verdict 2
def test_any_value_skips_nulls(engine, duck):
    """DuckDB any_value(x) = first NON-NULL value [measured r12:
    (NULL,7) → 7]; Spark's 1-arg form keeps the NULL. Ordered forms
    skip NULL values in key order; DISTINCT is a no-op."""
    duck.execute("CREATE OR REPLACE TABLE av(k INT, v INT)")
    duck.execute("INSERT INTO av VALUES (2,NULL),(1,7),(3,NULL),(4,9)")
    engine.spark.createDataFrame(
        [(2, None), (1, 7), (3, None), (4, 9)], "k int, v int"
    ).createOrReplaceTempView("av")
    for q in (
        "SELECT any_value(v) AS a FROM av",
        "SELECT any_value(v ORDER BY k) AS a FROM av",
        "SELECT any_value(v ORDER BY k DESC) AS a FROM av",
        "SELECT any_value(v) FILTER (WHERE k > 2) AS a FROM av",
        "SELECT k % 2 AS g, any_value(v ORDER BY k) AS a FROM av "
        "GROUP BY g ORDER BY g",
        "SELECT k, any_value(v) OVER (ORDER BY k ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS a FROM av ORDER BY k",
        "SELECT any_value(v) AS a FROM "
        "(SELECT CAST(NULL AS INT) AS v UNION ALL SELECT NULL) s",
    ):
        _check(engine, duck, q)


# ------------------------------------------------------------ verdict 3
def test_substr_negative_length_matrix(engine, duck):
    """DuckDB 3-arg substr on the position line: negative length
    extends LEFT of start; negative start counts from the end; start 0
    counts the nonexistent position against the length [measured
    matrix r12]. Spark returns '' for negative lengths."""
    for s, ln in ((2, -1), (3, -2), (1, -1), (2, -5), (5, -10),
                  (-2, -1), (-2, 3), (0, 3), (0, -1), (2, 0),
                  (-10, 5), (6, -3), (2, 3), (-3, 2)):
        _check(engine, duck, f"SELECT substr('hello', {s}, {ln}) AS r")
    _check(engine, duck, "SELECT substr(NULL, 2, 3) AS r")
    _check(engine, duck, "SELECT substr('hello', NULL, 3) AS r")
    _check(engine, duck, "SELECT substr('hello', 2, NULL) AS r")
    # dynamic (non-literal) operands take the windowed form too
    _check(engine, duck,
           "SELECT substr(s, st, ln) AS r FROM (SELECT 'hello' AS s, "
           "2 AS st, -1 AS ln UNION ALL SELECT 'world', 0, 3 "
           "UNION ALL SELECT 'hello', -2, 3) q ORDER BY r")


def test_split_part_zero_null_matrix(engine, duck):
    """DuckDB split_part never errors and never returns NULL
    [measured r12]: index 0/NULL/out-of-range (either sign) → '',
    NULL string → '', NULL separator → the whole string. Spark throws
    INVALID_INDEX_OF_ZERO and NULLs on NULL input."""
    for q in (
        "SELECT split_part('a,b,c', ',', 0) AS r",
        "SELECT split_part('a,b,c', ',', -1) AS r",
        "SELECT split_part('a,b,c', ',', -5) AS r",
        "SELECT split_part('a,b,c', ',', 5) AS r",
        "SELECT split_part('a,b,c', ',', 2) AS r",
        "SELECT split_part(NULL, ',', 1) AS r",
        "SELECT split_part('a,b,c', NULL, 1) AS r",
        "SELECT split_part('a,b,c', ',', NULL) AS r",
        "SELECT split_part('a.b.c', '.', 2) AS r",
        "SELECT split_part('a||b||c', '||', 2) AS r",
        "SELECT split_part('a,b,c', '', 1) AS r",
    ):
        _check(engine, duck, q)


def test_regexp_extract_group_out_of_range(engine, duck):
    """A group index past the literal pattern's capture count → ''
    in DuckDB [measured r12]; Spark throws REGEX_GROUP_INDEX."""
    for q in (
        r"SELECT regexp_extract('ab12', '([a-z]+)(\d+)', 3) AS r",
        r"SELECT regexp_extract('ab12', '(\d+)', 2) AS r",
        r"SELECT regexp_extract('xy', '(a)(b)', 1) AS r",
        r"SELECT regexp_extract('ab12', '([a-z]+)(\d+)', 2) AS r",
        r"SELECT regexp_extract('ab12', '([a-z]+)(\d+)', 0) AS r",
    ):
        _check(engine, duck, q)


# ------------------------------------------------------------ verdict 4
def test_blob_literal_hex_escapes(engine, duck):
    r"""'\xAA'::BLOB is ONE byte in DuckDB [measured r12]; the old
    path left the four raw characters in the BINARY cast. Invalid
    escapes raise (Conversion Error parity)."""
    for q in (
        r"SELECT octet_length('\xAA'::BLOB) AS n",
        r"SELECT hex('\xAA'::BLOB) AS h",
        r"SELECT hex('ab\x41'::BLOB) AS h",
        r"SELECT hex('ab'::BLOB) AS h",
        r"SELECT hex(CAST('\x41' AS BLOB)) AS h",
        r"SELECT hex('\x41'::BYTEA) AS h",
        r"SELECT decode('\x41\x42'::BLOB) AS s",
        r"SELECT octet_length('\xAA\x42'::BLOB) AS n",
    ):
        _check(engine, duck, q)
    for bad in (r"SELECT '\xZZ'::BLOB", r"SELECT '\x4'::BLOB",
                r"SELECT 'a\b'::BLOB"):
        with pytest.raises(ValueError, match="blob conversion"):
            to_spark_sql(bad)


# ------------------------------------------------------------ verdict 6
def test_multi_arg_grouping_bitmask(engine, duck):
    """grouping(a, b) returns the combined bitmask in DuckDB (b = LSB);
    Spark's grouping is 1-arg — grouping_id(a, b) is the exact map."""
    _check(engine, duck,
           "SELECT a, b, grouping(a, b) AS g FROM (VALUES (1,'x'),"
           "(2,'y')) t(a,b) GROUP BY CUBE(a,b) "
           "ORDER BY a NULLS LAST, b NULLS LAST, g")
    _check(engine, duck,
           "SELECT a, grouping(a) AS g FROM (VALUES (1),(2)) t(a) "
           "GROUP BY ROLLUP(a) ORDER BY a NULLS LAST")


def test_varchar_typed_length_ignored(engine, duck):
    """CAST(x AS VARCHAR(n)) parses and IGNORES the length in DuckDB;
    Spark refuses STRING(n) — the parameter strips in the dialect."""
    _check(engine, duck, "SELECT CAST('abcdef' AS VARCHAR(2)) AS r")
    _check(engine, duck, "SELECT 'abcdef'::VARCHAR(3) AS r")


def test_percentile_disc_order_statistic(engine, duck):
    """percentile_disc WITHIN GROUP is an order statistic over ANY
    orderable type [measured r12: VARCHAR → 'b'; DESC picks from the
    top; array fractions return a list]; Spark's native form casts to
    DOUBLE and crashes on non-numerics."""
    for q in (
        "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY s) AS r "
        "FROM (VALUES ('a'),('b'),('c')) t(s)",
        "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY s DESC) "
        "AS r FROM (VALUES ('a'),('b'),('c')) t(s)",
        "SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY x DESC) "
        "AS r FROM (VALUES (1),(2),(3),(4)) t(x)",
        "SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS r "
        "FROM (VALUES (1),(2),(3),(4)) t(x)",
        "SELECT percentile_disc([0.25, 0.75]) WITHIN GROUP "
        "(ORDER BY x) AS r FROM (VALUES (1),(2),(3),(4)) t(x)",
        "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS r "
        "FROM (VALUES (DATE '2024-01-01'),(DATE '2024-03-01'),"
        "(DATE '2024-02-01')) t(d)",
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS r "
        "FROM (VALUES (1),(2),(3),(4)) t(x)",
    ):
        _check(engine, duck, q)


# ------------------------------------------------------------ verdict 5
def test_derived_map_bracket_lookup(engine, duck):
    """Bracket lookup on a DERIVED (subquery-aliased) map keeps
    DuckDB's one-element-LIST semantics ([v] present, [] missing) —
    the kind derivation now carries MAP through SELECT-item aliases."""
    for q in (
        "SELECT m['a'] AS r FROM (SELECT MAP {'a':1} AS m) q",
        "SELECT m['zz'] AS r FROM (SELECT MAP {'a':1} AS m) q",
        "SELECT q.m['a'] AS r FROM (SELECT MAP {'a':1, 'b':2} AS m) q",
        "SELECT m['a'] AS r FROM "
        "(SELECT map_from_entries([('a', 5)]) AS m) q",
        "SELECT m['x'] AS r FROM (SELECT map(['x','y'],[3,4]) AS m) q",
        "SELECT (MAP {'a':1})['a'] AS r",
    ):
        _check(engine, duck, q)


# ------------------------------------------------------------ verdict 7
def test_interval_render_and_ym_outputs(engine, duck):
    """(a) unary-minus interval casts render DuckDB-style
    ('-01:30:00'); (b) YEAR-MONTH and mixed (calendar) interval
    OUTPUTS fetch as 30-day-month timedeltas exactly like DuckDB's
    Python fetch (PySpark's fromInternal is unimplemented for both
    types); (c) literal interval ± interval folds driver-side on the
    three-field model (Spark cannot even analyze YM + DT)."""
    for q in (
        "SELECT CAST(- INTERVAL 90 MINUTE AS VARCHAR) AS r",
        "SELECT CAST(-INTERVAL '90' MINUTE AS VARCHAR) AS r",
        "SELECT CAST(- INTERVAL '1 month 3 days' AS VARCHAR) AS r",
        "SELECT to_days(3) AS r",
        "SELECT to_months(1) AS r",
        "SELECT to_years(2) AS r",
        "SELECT to_hours(5) AS r",
        "SELECT to_months(1) + to_days(3) AS r",
        "SELECT to_days(10) - to_hours(5) AS r",
        "SELECT INTERVAL '14' MONTH AS r",
        "SELECT INTERVAL 2 YEAR AS r",
        "SELECT INTERVAL '1 month 2 days' AS r",
        "SELECT INTERVAL '1 day' + INTERVAL '3 hours' AS r",
        "SELECT DATE '2024-01-31' + (INTERVAL 1 MONTH + INTERVAL "
        "2 DAY) AS r",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_hours(5) AS r",
        "SELECT CAST(to_months(1) + to_days(3) AS VARCHAR) AS r",
        "SELECT to_days(3) = INTERVAL '3 days' AS r",
    ):
        _check(engine, duck, q)


# ------------------------------------------------------- pinned (r12)
def test_r12_over_acceptance_pins(engine, duck):
    """Documented over-acceptances from the r11 verdict's probe batch
    (engine accepts and answers; DuckDB 1.0.0 errors loudly) — pinned
    so drift in either engine is loud. Spark's NULL/NaN math on
    out-of-domain inputs is kept deliberately: at 100 TB a single bad
    row aborting a full scan is the worse default, and Spark's
    non-ANSI math is the platform convention (SURVEY §2.4)."""
    import duckdb as _duckdb
    for q in (
        "SELECT log(-1) AS r",       # DuckDB: Out of Range; eng NULL
        "SELECT ln(0) AS r",         # DuckDB: Out of Range; eng NULL
        "SELECT sqrt(-1) AS r",      # DuckDB: Out of Range; eng NaN
        "SELECT asin(2) AS r",       # DuckDB: Invalid Input; eng NaN
        "SELECT acos(-2) AS r",
        "SELECT INTERVAL 1 DAY * 2.5 AS r",   # INTERVAL×DECIMAL binder
        "SELECT 'yes'::BOOLEAN AS r",         # 't'/'1' agree; 'yes' no
        "SELECT url_encode('a b') AS r",      # absent in DuckDB 1.0
        "SELECT url_decode('a%20b') AS r",
    ):
        with pytest.raises(_duckdb.Error):
            duck.execute(q).fetchall()
        engine.sql(q, dialect="duckdb").collect()  # over-accepts (doc'd)
    # multi-column (1,2) IN (subquery): BOTH loud now — DuckDB binder-
    # errors and the r12 value-position IN emission surfaces Spark's
    # analysis error (was an over-acceptance before r12)
    q2 = "SELECT (1,2) IN (SELECT 1, 2) AS r"
    with pytest.raises(_duckdb.Error):
        duck.execute(q2).fetchall()
    with pytest.raises(Exception):
        engine.sql(q2, dialect="duckdb").collect()
    # agreeing BOOLEAN spellings stay green
    _check(engine, duck, "SELECT 't'::BOOLEAN AS r")
    _check(engine, duck, "SELECT '1'::BOOLEAN AS r")


def test_scalar_subquery_many_rows_pinned_loud(engine, duck):
    """A scalar subquery returning >1 row: DuckDB 1.0 silently takes
    the FIRST row — scan-order-dependent, i.e. nondeterministic on a
    parallel engine — so the engine KEEPS Spark's loud
    SCALAR_SUBQUERY_TOO_MANY_ROWS instead (documented divergence,
    SURVEY §2.4; VERDICT r11 #8 decision)."""
    q = ("SELECT x FROM (VALUES (1),(2)) t(x) WHERE x = "
         "(SELECT y FROM (VALUES (5),(6)) s(y))")
    duck.execute(q).fetchall()  # DuckDB answers (first row)
    with pytest.raises(Exception, match="(?i)more than one row|"
                       "SCALAR_SUBQUERY"):
        engine.sql(q, dialect="duckdb").collect()
    # the single-row form agrees
    _check(engine, duck,
           "SELECT x FROM (VALUES (1),(2)) t(x) WHERE x = "
           "(SELECT min(y) FROM (VALUES (1),(6)) s(y)) ORDER BY x")


# ------------------------------------------------------ missing 3-5
def test_format_thousands_separator(engine, duck):
    """format('{:,}' / '{:,d}') groups integers with commas in DuckDB
    (floats error — stays loud); Java printf's ',' flag matches."""
    for q in (
        "SELECT format('{:,}', 123456789) AS r",
        "SELECT format('{:,d}', 1234567) AS r",
        "SELECT format('{:,}', 42) AS r",
        "SELECT format('{:,}', -1234567) AS r",
        "SELECT format('{} has {:,}', 'x', 1000) AS r",
    ):
        _check(engine, duck, q)


def test_unsigned_type_casts(engine, duck):
    """UTINYINT/USMALLINT/UINTEGER/UBIGINT casts ride lossless wider
    signed/decimal carriers with explicit range checks — out-of-range
    raises like DuckDB (never wraps); TRY_CAST yields NULL; floats
    round [measured r12]."""
    for q in (
        "SELECT 5::UTINYINT AS r", "SELECT 255::UTINYINT AS r",
        "SELECT 3.7::UINTEGER AS r", "SELECT 65535::USMALLINT AS r",
        "SELECT 4294967295::UINTEGER AS r",
        "SELECT '42'::UBIGINT AS r",
        "SELECT CAST(NULL AS UINTEGER) AS r",
        "SELECT CAST(18446744073709551615 AS UBIGINT) AS r",
        "SELECT TRY_CAST(-1 AS UTINYINT) AS r",
        "SELECT TRY_CAST(300 AS UTINYINT) AS r",
        "SELECT 5::UTINYINT + 3 AS r",
        "SELECT x::USMALLINT AS r FROM (VALUES (7),(65535)) t(x) "
        "ORDER BY r",
        "SELECT (x + 1)::UINTEGER AS r FROM (VALUES (7)) t(x)",
    ):
        _check(engine, duck, q)
    import duckdb as _duckdb
    for q in ("SELECT (-1)::UTINYINT", "SELECT 256::UTINYINT",
              "SELECT CAST(-5 AS UBIGINT)"):
        with pytest.raises(_duckdb.Error):
            duck.execute(q).fetchall()
        with pytest.raises(Exception):
            engine.sql(q, dialect="duckdb").collect()


def test_infinity_temporal_literals(engine, duck):
    """±infinity DATE/TIMESTAMP literals fold to the exact values
    DuckDB's Python fetch returns (9999-12-31 / 0001-01-01 / max
    timestamp); TIMESTAMP '-infinity' fences loudly — PySpark cannot
    fetch the 0001-01-01 minimum at all."""
    for q in (
        "SELECT DATE 'infinity' AS r",
        "SELECT DATE '-infinity' AS r",
        "SELECT TIMESTAMP 'infinity' AS r",
        "SELECT 'infinity'::DATE AS r",
        "SELECT DATE 'infinity' > DATE '2024-01-01' AS r",
        "SELECT DATE '-infinity' < DATE '0001-06-01' AS r",
    ):
        _check(engine, duck, q)
    with pytest.raises(NotImplementedError, match="no Spark carrier"):
        to_spark_sql("SELECT TIMESTAMP '-infinity'")


def test_limit_percent_null_and_expr(engine, duck):
    """LIMIT NULL% keeps every row (DuckDB treats a NULL percent like
    LIMIT NULL); constant-expression percents evaluate; >100 errors in
    both engines [measured r12]."""
    _check(engine, duck,
           "SELECT x FROM (VALUES (1),(2),(3),(4)) t(x) "
           "ORDER BY x LIMIT NULL%")
    _check(engine, duck,
           "SELECT x FROM (VALUES (1),(2),(3),(4)) t(x) "
           "ORDER BY x LIMIT (25+25)%")
    _check(engine, duck,
           "SELECT x FROM (VALUES (1),(2),(3)) t(x) "
           "ORDER BY x LIMIT 33.4%")
    import duckdb as _duckdb
    with pytest.raises(_duckdb.Error):
        duck.execute("SELECT 1 LIMIT 150%").fetchall()
    with pytest.raises(ValueError, match="Limit percent out of range"):
        engine.sql("SELECT 1 AS r LIMIT 150%", dialect="duckdb").collect()


def test_hex_literal_and_describe_nullability_pins(engine, duck):
    """Two pinned divergences from the r11 verdict's probe batch:
    (a) DuckDB 1.0's tokenizer splits `SELECT 0x1F` into `0 AS x1F`(!)
    — the engine refuses the malformed number loudly instead of
    reproducing the tokenizer accident; (b) DESCRIBE SELECT reports
    null='NO' for literal columns where DuckDB says 'YES' for every
    column unconditionally — Spark's analyzer actually proves literal
    non-nullability, which is the more informative answer."""
    assert duck.execute("SELECT 0x1F").fetchall() == [(0,)]  # 0 AS x1F
    with pytest.raises(Exception):
        engine.sql("SELECT 0x1F", dialect="duckdb").collect()
    dd = duck.execute("DESCRIBE SELECT 1 AS a").fetchall()
    assert dd[0][2] == "YES"  # DuckDB: always-YES
    ed = {r["column_name"]: r["null"] for r in
          engine.sql("DESCRIBE SELECT 1 AS a", dialect="duckdb")
          .collect()}
    assert ed["a"] == "NO"    # engine: proven non-null (documented)


# --------------------------------------------------- r12 probe batch 1
def test_format_printf_long_tail(engine, duck):
    """format()/printf() spec long tail [measured r12]: radix specs
    (X/o/b with sign-aware negatives and # prefixes — Java %x would
    print the two's complement), e/E scientific, sign flags, g/G with
    C-style trailing-zero strip, C star widths folded from literal
    args, %i/%u aliases, %a hex-float exponent '+', %c codepoints."""
    for q in (
        "SELECT format('{:X}', 255) AS r",
        "SELECT format('{:o}', 8) AS r",
        "SELECT format('{:b}', 5) AS r",
        "SELECT format('{:#b}', -5) AS r",
        "SELECT format('{:x}', -255) AS r",
        "SELECT format('{:#x}', -255) AS r",
        "SELECT format('{:+x}', 255) AS r",
        "SELECT format('{:e}', 12345.678) AS r",
        "SELECT format('{:E}', 12345.678) AS r",
        "SELECT format('{:.3e}', 12345.678) AS r",
        "SELECT format('{:+d}|{: d}', 5, 5) AS r",
        "SELECT format('{:08d}', -42) AS r",
        "SELECT format('{:g}', 100.0) AS r",
        "SELECT format('{:g}', 0.000012345) AS r",
        "SELECT format('{:.3g}', 12345.678) AS r",
        "SELECT format('{:G}', 0.000012345) AS r",
        "SELECT format('{:6x}', 255) AS r",
        "SELECT format('{:#o}', 8) AS r",
        "SELECT printf('%g', 1.5) AS r",
        "SELECT printf('%g', 100.0) AS r",
        "SELECT printf('%g', 123456789.0) AS r",
        "SELECT printf('%G %g', 0.000012345, 2.0) AS r",
        "SELECT printf('%.3g', 12345.678) AS r",
        "SELECT printf('%*d', 6, 42) AS r",
        "SELECT printf('%-*d|', 6, 42) AS r",
        "SELECT printf('%.*f', 2, 3.14159) AS r",
        "SELECT printf('%i %u', 42, 7) AS r",
        "SELECT printf('%a', 1.5) AS r",
        "SELECT printf('%c', 65) AS r",
        "SELECT printf('%e', 12345.678) AS r",
        # the user-written RE2-replacement path must still convert
        "SELECT regexp_replace('abc', '(b)', '[\\1]') AS r",
    ):
        _check(engine, duck, q)


def test_timezone_fields_and_typeof_time(engine, duck):
    """extract(timezone[_hour|_minute] FROM ts) → BIGINT 0 on naive
    timestamps and TIME (no zone displacement); typeof(TIME) spells
    the single micro-precision TIME [measured r12]."""
    for q in (
        "SELECT extract(timezone FROM TIMESTAMP '2024-01-01 00:00:00')"
        " AS r",
        "SELECT extract(timezone_hour FROM TIMESTAMP "
        "'2024-01-01 00:00:00') AS a, extract(timezone_minute FROM "
        "TIMESTAMP '2024-01-01 00:00:00') AS b",
        "SELECT date_part('timezone', TIMESTAMP '2024-01-01 00:00:00')"
        " AS r",
        "SELECT extract(timezone FROM TIME '13:00:00') AS r",
        "SELECT typeof(TIME '13:00:00') AS r",
        "SELECT date_part(['year','month','day'], DATE '2024-03-05') "
        "AS r",
    ):
        _check(engine, duck, q)


def test_star_exclude_replace_combined(engine, duck):
    """* [EXCLUDE …] REPLACE (…) over base tables AND derived tables
    (subquery schemas resolve through one analysis-only pass; alias
    column lists name the schema outright) [r12 — the combined form
    parse-errored and derived tables refused]."""
    for q in (
        "SELECT * EXCLUDE (b) REPLACE (a * 10 AS a) FROM "
        "(VALUES (1, 2, 3)) t(a, b, c)",
        "SELECT * REPLACE (a + 1 AS a) FROM (SELECT 1 AS a, 'x' AS b)"
        " q",
        "SELECT * EXCLUDE b REPLACE (a * 2 AS a) FROM "
        "(VALUES (1, 2)) t(a, b)",
        "SELECT * REPLACE (upper(r_name) AS r_name) FROM region "
        "ORDER BY r_regionkey LIMIT 2",
    ):
        _check(engine, duck, q)


def test_nth_value_ignore_nulls_pinned(engine, duck):
    """nth_value(..) IGNORE NULLS: DuckDB 1.0's parser rejects the
    clause outright; the engine accepts Spark's native support —
    pinned over-acceptance (documented divergence, SURVEY §2.4)."""
    import duckdb as _duckdb
    q = ("SELECT x, nth_value(y, 2) IGNORE NULLS OVER (ORDER BY x "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
         "AS r FROM (VALUES (1,NULL),(2,'a'),(3,NULL),(4,'b')) t(x,y) "
         "ORDER BY x")
    with pytest.raises(_duckdb.Error):
        duck.execute(q).fetchall()
    rows = engine.sql(q, dialect="duckdb").collect()
    assert [r["r"] for r in rows] == ["b", "b", "b", "b"]


def test_numeric_cast_rounding_matrix(engine, duck):
    """Fractional→integer and decimal-downscale casts [measured r12]:
    DECIMAL→int rounds HALF AWAY FROM ZERO, DOUBLE/FLOAT→int rounds
    HALF TO EVEN (C++ nearbyint — the old decimal hop was half-up),
    VARCHAR→int parses then rounds away from zero, DECIMAL downscale
    truncates toward zero; postfix ``::`` casts now convert to CAST
    form first (Spark's native ``::`` truncates), and INT4/SIGNED/
    INT1/INT2/INT8 alias spellings normalize for Spark's parser."""
    for q in (
        "SELECT 2.5::INTEGER AS a, 3.5::INTEGER AS b, "
        "(-2.5)::INTEGER AS c",
        "SELECT CAST(2.5::DOUBLE AS INTEGER) AS a, "
        "CAST(3.5::DOUBLE AS INTEGER) AS b, "
        "CAST(-2.5::DOUBLE AS INTEGER) AS c",
        "SELECT CAST(2.49999::DOUBLE AS INTEGER) AS r",
        "SELECT CAST(2.5::FLOAT AS INTEGER) AS r",
        "SELECT CAST(2.5 AS INT4) AS a, CAST(2.5 AS SIGNED) AS b, "
        "CAST(2.5 AS INT8) AS c, CAST(2.5 AS INT1) AS d, "
        "CAST(2.5 AS INT2) AS e",
        "SELECT 2.5::INT4 AS a, 2.5::SIGNED AS b",
        "SELECT '2.5'::INTEGER AS a, TRY_CAST('xx' AS INTEGER) AS b",
        "SELECT TRY_CAST(2.5::DOUBLE AS INTEGER) AS r",
        "SELECT CAST(9.5 AS DECIMAL(3,0)) AS a, "
        "CAST(9.99 AS DECIMAL(4,1)) AS b",
        "SELECT 1.26::DECIMAL(6,1) AS r",
        "SELECT CAST(x AS INTEGER) AS r FROM "
        "(VALUES (2.5::DOUBLE),(3.5::DOUBLE)) t(x) ORDER BY r",
        "SELECT 3.99::INTEGER::VARCHAR AS r",
        "SELECT (2.5 + 1)::INTEGER AS r",
        "SELECT CAST(7 AS BIGINT) AS r",
        "SELECT l_quantity::INTEGER AS r FROM lineitem "
        "ORDER BY l_orderkey, l_linenumber LIMIT 3",
    ):
        _check(engine, duck, q)


def test_correlated_dml_and_script_shapes(engine, duck):
    """Correlated-SET UPDATE, correlated DELETE, UPDATE…FROM join,
    DELETE…USING, INSERT BY NAME, and multi-column SET — the same
    statement scripts run in both engines, final table compared."""
    cases = [
        (["CREATE OR REPLACE TABLE r12a AS SELECT * FROM "
          "(VALUES (1, 10),(2, 20),(3, 30)) v(id, val)",
          "CREATE OR REPLACE TABLE r12b AS SELECT * FROM "
          "(VALUES (1, 100),(3, 300)) v(id, bonus)",
          "UPDATE r12a SET val = (SELECT bonus FROM r12b WHERE "
          "r12b.id = r12a.id) WHERE id IN (SELECT id FROM r12b)"],
         "SELECT * FROM r12a ORDER BY id"),
        (["CREATE OR REPLACE TABLE r12c AS SELECT * FROM "
          "(VALUES (1, 10),(2, 20)) v(id, val)",
          "UPDATE r12c SET val = (SELECT max(id) FROM r12c x "
          "WHERE x.id > r12c.id)"],
         "SELECT * FROM r12c ORDER BY id"),
        (["CREATE OR REPLACE TABLE r12d AS SELECT * FROM "
          "(VALUES (1, 10),(2, 20),(3, 5)) v(id, val)",
          "DELETE FROM r12d WHERE val < (SELECT avg(val) FROM r12d)"],
         "SELECT * FROM r12d ORDER BY id"),
        (["CREATE OR REPLACE TABLE r12e AS SELECT * FROM "
          "(VALUES (1, 10),(2, 20)) v(id, val)",
          "CREATE OR REPLACE TABLE r12f AS SELECT * FROM "
          "(VALUES (1, 7)) v(id, nv)",
          "UPDATE r12e SET val = r12f.nv FROM r12f "
          "WHERE r12e.id = r12f.id"],
         "SELECT * FROM r12e ORDER BY id"),
        (["CREATE OR REPLACE TABLE r12g AS SELECT * FROM "
          "(VALUES (1),(2),(3)) v(id)",
          "CREATE OR REPLACE TABLE r12h AS SELECT * FROM "
          "(VALUES (2)) v(id)",
          "DELETE FROM r12g USING r12h WHERE r12g.id = r12h.id"],
         "SELECT * FROM r12g ORDER BY id"),
        (["CREATE OR REPLACE TABLE r12i AS SELECT * FROM "
          "(VALUES (1, 'x')) v(id, name)",
          "INSERT INTO r12i BY NAME SELECT 'y' AS name, 2 AS id"],
         "SELECT * FROM r12i ORDER BY id"),
        (["CREATE OR REPLACE TABLE r12j AS SELECT * FROM "
          "(VALUES (1, 10, 'a')) v(id, val, tag)",
          "UPDATE r12j SET val = 99, tag = 'z' WHERE id = 1"],
         "SELECT * FROM r12j ORDER BY id"),
    ]
    for stmts, final in cases:
        for st in stmts:
            engine.sql(st, dialect="duckdb")
            duck.execute(st)
        _check(engine, duck, final)


def test_value_position_in_subquery_3vl(engine, duck):
    """PROJECTED [NOT] IN (subquery) and = ANY / <> ALL follow
    DuckDB's 3-valued logic (NULL on a null-bearing no-match) via the
    CASE-over-EXISTS emission; filter positions keep Spark's
    semi/null-aware-anti join plan, which is 3VL-equivalent there
    [measured r12]."""
    for q in (
        "SELECT 1 = ANY(SELECT y FROM (VALUES (NULL::INTEGER),(2)) "
        "s(y)) AS r",
        "SELECT 2 = ANY(SELECT y FROM (VALUES (NULL::INTEGER),(2)) "
        "s(y)) AS r",
        "SELECT 1 IN (SELECT y FROM (VALUES (NULL::INTEGER),(2)) "
        "s(y)) AS r",
        "SELECT 1 NOT IN (SELECT y FROM (VALUES (NULL::INTEGER),(2)) "
        "s(y)) AS r",
        "SELECT 2 NOT IN (SELECT y FROM (VALUES (NULL::INTEGER),(2)) "
        "s(y)) AS r",
        "SELECT 1 <> ALL(SELECT y FROM (VALUES (NULL::INTEGER),(2)) "
        "s(y)) AS r",
        "SELECT x FROM (VALUES (1),(5)) t(x) WHERE x = ANY(SELECT y "
        "FROM (VALUES (1),(2)) s(y)) ORDER BY x",
        "SELECT x FROM (VALUES (1),(5)) t(x) WHERE x NOT IN (SELECT "
        "y FROM (VALUES (1),(NULL::INTEGER)) s(y)) ORDER BY x",
        "SELECT CASE WHEN 1 IN (SELECT y FROM (VALUES (2)) s(y)) "
        "THEN 'a' ELSE 'b' END AS r",
        "SELECT coalesce(1 IN (SELECT y FROM "
        "(VALUES (NULL::INTEGER)) s(y)), false) AS r",
        "SELECT 1 > ALL(SELECT y FROM (VALUES (5)) s(y) WHERE false)"
        " AS r",
        "SELECT 1 = ANY(SELECT y FROM (VALUES (NULL::INTEGER)) s(y) "
        "WHERE false) AS r",
    ):
        _check(engine, duck, q)


def test_unnest_named_args_and_struct(engine, duck):
    """unnest named arguments [measured r12]: recursive := true
    flattens nested LISTS fully, max_depth := n unnests n list levels
    (literal depth), recursive := false is the bare unnest; a STRUCT
    operand expands fields into COLUMNS (inline(array(s)));
    generate_subscripts(a, 1) → 1..len rows ([] on NULL/empty)."""
    for q in (
        "SELECT unnest([[1,2],[3]], recursive := true) AS u",
        "SELECT unnest([[1,2],[3]], max_depth := 1) AS u",
        "SELECT unnest([[1,2],[3]], max_depth := 2) AS u",
        "SELECT unnest([[[1]],[[2,3]]], recursive := true) AS u",
        "SELECT unnest([1,2,3], recursive := false) AS u",
        "SELECT unnest({'a': 1, 'b': 2})",
        "SELECT unnest({'a': 1, 'b': 2}, recursive := true)",
        "SELECT unnest(struct_pack(x := 5, y := 'z'))",
        "SELECT generate_subscripts([10,20,30], 1) AS g",
        "SELECT generate_subscripts([], 1) AS g",
        "SELECT generate_subscripts(CAST(NULL AS INT[]), 1) AS g",
    ):
        _check(engine, duck, q)


def test_macro_named_default_params(engine, duck):
    """CREATE MACRO with `p := default` named parameters [measured
    r12]: omitted names take the default, `name := v` overrides,
    positional args for named params error ('requires a single
    positional parameter' in DuckDB)."""
    for stmt in ("CREATE OR REPLACE MACRO r12m(a, b := 10) AS a + b",):
        engine.sql(stmt, dialect="duckdb")
        duck.execute(stmt)
    _check(engine, duck, "SELECT r12m(1) AS x, r12m(1, b := 2) AS y")
    import duckdb as _duckdb
    with pytest.raises(_duckdb.Error):
        duck.execute("SELECT r12m(1, 2)").fetchall()
    with pytest.raises(ValueError):
        engine.sql("SELECT r12m(1, 2)", dialect="duckdb").collect()


def test_pivot_join_source_and_count_fill(engine, duck):
    """PIVOT over a JOINed subquery (the table-ref scan now stops at
    the depth-0 ON, not the join's ON) and count-USING pivots filling
    empty cells with 0 in the implicit-group form too [r12]."""
    q1 = ("PIVOT (SELECT r_name, n_regionkey FROM region JOIN nation "
          "ON r_regionkey = n_regionkey) ON r_name USING count(*)")
    got = sorted(spark_rows(engine.sql(q1, dialect="duckdb")))
    want = sorted(duckdb_rows(duck, q1))
    assert got == want
    q2 = ("PIVOT (SELECT n_regionkey, n_name FROM nation) "
          "ON n_regionkey IN (0, 1) USING count(*)")
    got = sorted(spark_rows(engine.sql(q2, dialect="duckdb")))
    want = sorted(duckdb_rows(duck, q2))
    assert got == want


def test_tablesample_after_subquery_alias(engine, duck):
    """``(subquery) alias TABLESAMPLE (…)`` — DuckDB's alias-first
    order reorders to Spark's sample-first grammar [r12]."""
    for q in (
        "SELECT count(*) <= 1 AS r FROM (SELECT 1 AS x) t "
        "TABLESAMPLE (100 PERCENT)",
        "SELECT t.x AS r FROM (SELECT 1 AS x) t "
        "TABLESAMPLE (100 PERCENT)",
    ):
        _check(engine, duck, q)


def test_method_call_syntax(engine, duck):
    """DuckDB dot-method syntax expr.fn(args) → fn(expr, args)
    [measured r12: column refs / parenthesized exprs / list literals;
    bare string literals parse-error in DuckDB too]; main.-qualified
    builtins strip the schema."""
    for q in (
        "SELECT n_name.lower() AS r FROM nation ORDER BY n_nationkey "
        "LIMIT 3",
        "SELECT [3,1,2].list_sort() AS r",
        "SELECT (1+2).sqrt() AS r",
        "SELECT main.abs(-1) AS r",
        "SELECT n_name.lower().upper() AS r FROM nation "
        "ORDER BY n_nationkey LIMIT 2",
        "SELECT n_name.substr(2, 3) AS r FROM nation "
        "ORDER BY n_nationkey LIMIT 2",
        "SELECT n.n_name AS r FROM nation n ORDER BY n.n_nationkey "
        "LIMIT 2",
        "SELECT ({'a': {'b': 42}}).a.b AS r",
    ):
        _check(engine, duck, q)


def test_timestamp_precision_types(engine, duck):
    """TIMESTAMP_S / TIMESTAMP_MS / TIMESTAMP_NS literals and cast
    targets ride the micro carrier with DuckDB's ROUNDING cast
    semantics [measured r12: 45.678901 → TIMESTAMP_S :46,
    TIMESTAMP_MS .679; NS fetches micros]."""
    for q in (
        "SELECT TIMESTAMP_S '2024-01-01 12:30:45' AS r",
        "SELECT TIMESTAMP_S '2024-01-01 12:30:45.9' AS r",
        "SELECT TIMESTAMP_MS '2024-01-01 12:30:45.123' AS r",
        "SELECT TIMESTAMP_NS '2024-01-01 12:30:45.123456789' AS r",
        "SELECT CAST(TIMESTAMP '2024-01-01 12:30:45.678901' "
        "AS TIMESTAMP_S) AS r",
        "SELECT CAST(TIMESTAMP '2024-01-01 12:30:45.678901' "
        "AS TIMESTAMP_MS) AS r",
        "SELECT TIMESTAMP '2024-01-01 12:30:45.678901'"
        "::TIMESTAMP_S AS r",
    ):
        _check(engine, duck, q)


def test_float_render_and_signed_zero(engine, duck):
    """FLOAT→VARCHAR rides the shortest-round-trip double render
    ('inf', '1e+20', '16777216.0'); unary -0.0 cast to DOUBLE keeps
    its SIGN (Spark's decimal-literal negation loses it) [r12]."""
    for q in (
        "SELECT CAST('inf'::FLOAT AS VARCHAR) AS a, "
        "CAST(1.5::FLOAT AS VARCHAR) AS b, "
        "CAST(16777217::FLOAT AS VARCHAR) AS c",
        "SELECT CAST(1e20::FLOAT AS VARCHAR) AS a",
        "SELECT CAST(-0.0::DOUBLE AS VARCHAR) AS a, "
        "CAST(0.0::DOUBLE AS VARCHAR) AS b",
        # CAST(-0.0 AS DOUBLE) loses the sign in BOTH engines (unary
        # minus negates the DECIMAL literal before the cast)
        "SELECT CAST(CAST(-0.0 AS DOUBLE) AS VARCHAR) AS a",
        "SELECT 3 - 0.0::DOUBLE AS a",
    ):
        _check(engine, duck, q)


def test_null_slice_bounds_and_bc_fence(engine, duck):
    """A NULL slice bound NULLs the whole slice [measured r12];
    BC-era / year-zero temporal literals fence LOUDLY (no Spark
    carrier — silently dropping '(BC)' mis-dated by the era)."""
    for q in (
        "SELECT ([1,2,3])[NULL:2] AS a, ([1,2,3])[2:NULL] AS b",
        "SELECT 'hello'[NULL:2] AS a",
        "SELECT '2024-06-05 (BC) party' AS s",  # bare text untouched
    ):
        _check(engine, duck, q)
    for bad in ("SELECT DATE '0044-03-15 (BC)'",
                "SELECT DATE '0000-01-01'",
                "SELECT '0001-01-01 (BC)'::DATE"):
        duck.execute(bad).fetchall()  # DuckDB answers
        with pytest.raises(NotImplementedError, match="no Spark"):
            engine.sql(bad, dialect="duckdb").collect()


def test_grouping_in_having(engine, duck):
    """grouping()/grouping_id() in HAVING — Spark resolves HAVING
    against output columns when the group column is aliased, so the
    calls hoist into hidden select items stripped by an outer
    * EXCEPT [r12]."""
    for q in (
        "SELECT n_regionkey AS r, count(*) AS c FROM nation GROUP BY "
        "ROLLUP(n_regionkey) HAVING grouping(n_regionkey) = 0 "
        "ORDER BY r",
        "SELECT n_regionkey AS r, n_nationkey % 2 AS p, count(*) AS c "
        "FROM nation GROUP BY CUBE(n_regionkey, n_nationkey % 2) "
        "HAVING grouping(n_regionkey, n_nationkey % 2) = 3 "
        "ORDER BY r NULLS LAST, p NULLS LAST",
        "SELECT n_regionkey AS r, count(*) AS c FROM nation GROUP BY "
        "n_regionkey HAVING count(*) > 4 ORDER BY r",
    ):
        _check(engine, duck, q)


def test_insert_or_ignore_and_sequence_defaults(engine, duck):
    """INSERT OR IGNORE (ON CONFLICT DO NOTHING sugar), CREATE OR
    REPLACE SEQUENCE (re-creates and RESETS), and DEFAULT
    nextval('seq') allocating a contiguous per-row range on insert
    [r12]."""
    for st in (
        "CREATE OR REPLACE TABLE r12oi (id INTEGER PRIMARY KEY, "
        "v INTEGER)",
        "INSERT INTO r12oi VALUES (1, 10)",
        "INSERT OR IGNORE INTO r12oi VALUES (1, 99), (2, 20)",
    ):
        engine.sql(st, dialect="duckdb")
        duck.execute(st)
    _check(engine, duck, "SELECT * FROM r12oi ORDER BY id")
    for st in (
        "CREATE OR REPLACE SEQUENCE r12sq START 100 INCREMENT BY 2",
        "CREATE OR REPLACE TABLE r12st (id INTEGER DEFAULT "
        "nextval('r12sq'), v VARCHAR)",
        "INSERT INTO r12st (v) VALUES ('a'), ('b'), ('c')",
    ):
        engine.sql(st, dialect="duckdb")
        duck.execute(st)
    _check(engine, duck, "SELECT * FROM r12st ORDER BY id")
    _check(engine, duck, "SELECT nextval('r12sq') AS n")


def test_r12_batch5_over_acceptance_pins(engine, duck):
    """width_bucket and listagg: absent in DuckDB 1.0 (loud there);
    the engine answers with Spark's native support — documented
    over-acceptances."""
    import duckdb as _duckdb
    for q in ("SELECT width_bucket(5.5, 0, 10, 5) AS r",
              "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) AS r "
              "FROM (VALUES ('b'),('a')) t(x)",
              "SELECT substring('abcdef'::BLOB, 2, 3) AS r",
              "SELECT overlay('hello' PLACING 'XX' FROM 2 FOR 3) AS r"):
        with pytest.raises(_duckdb.Error):
            duck.execute(q).fetchall()
        engine.sql(q, dialect="duckdb").collect()  # over-accepts (doc'd)


def test_regex_flags_posix_and_formats(engine, duck):
    """DuckDB regex option letters: only i/s change behavior — m/n/p
    are NO-OPS for ^$/. [measured r12]; RE2 POSIX classes
    ([[:digit:]]) translate to Java spellings; %I/%p strftime
    specifiers map to Java hh/a; fdiv/fmod on a zero divisor → NULL
    (not inf, not an error)."""
    for q in (
        r"SELECT regexp_matches(e'a\nb', '^b$', 'm') AS r",
        r"SELECT regexp_matches('ABC', 'abc', 'i') AS r",
        r"SELECT regexp_matches(e'a\nb', 'a.b', 's') AS r",
        r"SELECT regexp_matches(e'a\nb', 'a.b', 'n') AS r",
        r"SELECT regexp_matches('A1', '[[:alpha:]][[:digit:]]') AS r",
        r"SELECT regexp_extract('x42', '[[:digit:]]+') AS r",
        r"SELECT regexp_matches('a b', '[[:space:]]') AS r",
        r"SELECT regexp_replace('a1b2', '[[:digit:]]', 'X', 'g') AS r",
        "SELECT fdiv(5.0, 0.0) AS a, fmod(5.0, 0.0) AS b, "
        "fdiv(-7.5, 2.0) AS c, fmod(-7.5, 2.0) AS d",
        "SELECT strftime(TIMESTAMP '2024-01-01 15:30:00', "
        "'%I:%M %p') AS r",
        "SELECT strptime('2024-01-01 03:30 PM', "
        "'%Y-%m-%d %I:%M %p') AS r",
    ):
        _check(engine, duck, q)


def test_read_csv_names_and_json_auto(engine, duck, tmp_path):
    """read_csv names=[…] renames leading columns (list-valued
    options parse through bracket-aware splitting); read_json_auto
    aliases read_json [r12]."""
    csvp = str(tmp_path / "t.csv")
    with open(csvp, "w") as f:
        f.write("a|b|c\n1|x|2.5\n2|NULLVAL|3.5\n")
    jsonp = str(tmp_path / "t.json")
    with open(jsonp, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    for q in (
        f"SELECT cc FROM read_csv('{csvp}', delim='|', header=true, "
        f"names=['aa','bb','cc']) ORDER BY cc",
        f"SELECT bb FROM read_csv('{csvp}', delim='|', header=true, "
        f"names=['aa','bb']) ORDER BY bb NULLS LAST",
        f"SELECT * FROM read_csv('{csvp}', delim='|', header=true, "
        f"nullstr='NULLVAL') ORDER BY a",
        f"SELECT a + 10 AS r FROM read_json_auto('{jsonp}') "
        f"ORDER BY r",
    ):
        got = [tuple(map(str, r))
               for r in engine.sql(q, dialect="duckdb").collect()]
        want = [tuple(map(str, r)) for r in duck.execute(q).fetchall()]
        assert got == want, q


def test_ignore_nulls_family_pinned(engine, duck):
    """first_value/last_value/lag/nth_value … IGNORE NULLS: DuckDB
    1.0's parser rejects the clause on ALL of them; the engine
    accepts Spark's native support — pinned over-acceptance family
    (extends the nth_value pin)."""
    import duckdb as _duckdb
    for q in (
        "SELECT last_value(y) IGNORE NULLS OVER (ORDER BY x) AS r "
        "FROM (VALUES (1,'a'),(2,NULL)) t(x,y)",
        "SELECT lag(y) IGNORE NULLS OVER (ORDER BY x) AS r "
        "FROM (VALUES (1,'a'),(2,NULL)) t(x,y)",
    ):
        with pytest.raises(_duckdb.Error):
            duck.execute(q).fetchall()
        engine.sql(q, dialect="duckdb").collect()  # over-accepts (doc'd)


def test_windowed_aggregate_divisor(engine, duck):
    """share-of-total shapes: the null-safe division rewrite keeps a
    windowed/filtered aggregate divisor's OVER/FILTER clause inside
    the operand (sum(count(*)) OVER () used to split, orphaning the
    OVER) [r12]."""
    for q in (
        "SELECT n_regionkey AS r, round(count(*) * 100.0 / "
        "sum(count(*)) OVER (), 2) AS pct FROM nation "
        "GROUP BY n_regionkey ORDER BY r",
        "SELECT n_regionkey AS r, sum(count(*)) OVER () AS t "
        "FROM nation GROUP BY n_regionkey ORDER BY r",
        "SELECT n_regionkey AS r, rank() OVER (ORDER BY count(*) "
        "DESC, n_regionkey) AS rk FROM nation GROUP BY n_regionkey "
        "ORDER BY r",
    ):
        _check(engine, duck, q)


def test_list_shortcut_folds(engine, duck):
    """list_count/product/bool_and/bool_or/entropy/first/last
    [measured r12]: count counts non-NULL (empty → 0); product/
    bool_and/bool_or skip NULLs, empty → NULL (product DOUBLE);
    entropy is log2 over frequencies (empty → 0.0); first/last take
    the PLAIN end elements; list_aggregate dispatches the same
    names."""
    for q in (
        "SELECT list_count([1, NULL, 3]) AS a, "
        "list_product([2.0, 3.0]) AS b",
        "SELECT list_product([2.0, NULL, 3.0]) AS a, "
        "list_product(CAST([] AS DOUBLE[])) AS b, "
        "list_product([2, 3]) AS c",
        "SELECT list_bool_and([true, NULL]) AS a, "
        "list_bool_and([true, false]) AS b, "
        "list_bool_or([false, NULL]) AS c",
        "SELECT round(list_entropy([1,1,2]), 6) AS a, "
        "round(list_entropy(['a','a','b','c']), 6) AS b, "
        "list_entropy(CAST([] AS INT[])) AS c",
        "SELECT list_first([NULL, 2]) AS a, list_last([1, NULL]) "
        "AS b, list_last([1,2,3]) AS c, "
        "list_last(CAST([] AS INT[])) AS d",
        "SELECT list_aggregate([2.0,3.0], 'product') AS a, "
        "list_aggregate([true,false], 'bool_and') AS b, "
        "list_aggregate([4,5], 'last') AS c",
    ):
        _check(engine, duck, q)


def test_nested_type_cast_spellings(engine, duck):
    """STRUCT(name TYPE, …) / MAP(K, V) / STRUCT(…)[] spellings in
    cast position → Spark DDL generics; expression MAP literals and
    struct_pack calls stay untouched [r12]."""
    for q in (
        "SELECT (CAST(NULL AS STRUCT(a INTEGER))).a AS r",
        "SELECT CAST(NULL AS MAP(VARCHAR, INTEGER)) AS r",
        "SELECT CAST({'a': 1} AS STRUCT(a BIGINT)).a AS r",
        "SELECT CAST([{'a': 1}] AS STRUCT(a BIGINT)[])[1].a AS r",
        "SELECT CAST({'a': {'b': 2}} AS STRUCT(a STRUCT(b BIGINT)))"
        ".a.b AS r",
        "SELECT ({'x': 1})::STRUCT(x BIGINT) AS r",
        "SELECT MAP {'a': 1} AS r",
        "SELECT struct_pack(a := 1) AS r",
    ):
        _check(engine, duck, q)


def test_advisory_set_pragma_options(engine, duck):
    """DuckDB resource/behavior hints (memory_limit,
    preserve_insertion_order, enable_progress_bar, PRAGMA key=value
    sugar) are ACCEPTED as tracked advisory no-ops — Spark's own
    memory/ordering model governs; a loud refusal broke every ported
    tuning script [r12]. Unknown options still refuse loudly."""
    for st in ("SET memory_limit='1GB'",
               "PRAGMA memory_limit='500MB'",
               "SET preserve_insertion_order=false",
               "SET enable_progress_bar=true"):
        engine.sql(st, dialect="duckdb")
        duck.execute(st)
    got = engine.sql("SELECT current_setting('memory_limit') AS r",
                     dialect="duckdb").collect()
    assert got[0]["r"] == "500MB"
    with pytest.raises(ValueError):
        engine.sql("SET bogus_option_xyz=1", dialect="duckdb")


def test_review_fixes_r12(engine, duck):
    """Self-review findings (r12): interval fold left-associativity
    (ts - a + b is ts - (a - b)), printf %%-escape-safe %i/%u alias,
    '(BC)' strings cast to NON-temporal types pass through,
    regexp_extract OOB group keeps NULL subjects NULL, TRY_CAST of an
    invalid blob escape is NULL, double→unsigned casts round half to
    even."""
    for q in (
        "SELECT TIMESTAMP '2024-01-10 00:00:00' - INTERVAL '1' DAY "
        "- INTERVAL '2' DAY AS r",
        "SELECT TIMESTAMP '2024-01-10 00:00:00' - INTERVAL '1' DAY "
        "+ INTERVAL '2' HOUR AS r",
        "SELECT TIMESTAMP '2024-01-10 00:00:00' + INTERVAL '1' DAY "
        "- INTERVAL '2' HOUR AS r",
        "SELECT - INTERVAL '1 day' + INTERVAL '2 hours' AS r",
        "SELECT TIMESTAMP '2024-01-10 00:00:00' - INTERVAL '1' DAY "
        "- INTERVAL '2' DAY + INTERVAL '1' HOUR AS r",
        "SELECT printf('%% increase: %d', 42) AS r",
        "SELECT printf('100%%utilized %d', 42) AS r",
        "SELECT printf('%i %u', 42, 7) AS r",
        "SELECT 'note (BC)'::VARCHAR AS r",
        "SELECT TRY_CAST('a\\q' AS BLOB) AS r",
        r"SELECT regexp_extract(NULL, '(a)', 5) AS r",
        r"SELECT regexp_extract('xy', '(a)(b)', 5) AS r",
        "SELECT (2.5::DOUBLE)::UINTEGER AS a, "
        "(3.5::DOUBLE)::UINTEGER AS b",
        "SELECT round(list_entropy(v), 6) AS r "
        "FROM (SELECT [1,1,2] AS v) t",
    ):
        _check(engine, duck, q)


def test_window_in_orderby_and_parquet_schema(engine, duck):
    """Windowed sort keys hoist into hidden select items (Spark
    refuses window functions in ORDER BY); parquet_schema now emits
    DuckDB's full 11-column tree INCLUDING the root group element
    [r12]."""
    for q in (
        "SELECT n_nationkey AS k FROM nation ORDER BY row_number() "
        "OVER (ORDER BY n_name), k LIMIT 5",
        "SELECT n_nationkey AS k FROM nation ORDER BY rank() OVER "
        "(ORDER BY n_name DESC) DESC, k LIMIT 4",
    ):
        _check(engine, duck, q)
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    q = (f"SELECT name, type, repetition_type, num_children, "
         f"converted_type, logical_type FROM "
         f"parquet_schema('{sf}/region.parquet') "
         f"ORDER BY name NULLS LAST")
    _check(engine, duck, q)


def test_json_wildcards_and_function_tails(engine, duck):
    """'$…[*]…' JSON path wildcards return a LIST of nodes (a
    dedicated ArrayType UDF — the scalar walker used to crash);
    jaro('','') = 0.0; to_base 3-arg zero-pads; printf '%08s' pads
    with spaces (C ignores the 0 flag on %s) [measured r12]."""
    J = ('\'{"a": {"b": [1, 2, 3]}, "c": "x", '
         '"arr": [{"v": 1}, {"v": 2}]}\'')
    for q in (
        f"SELECT json_extract({J}, '$.arr[*].v') AS r",
        f"SELECT json_extract({J}, '$.a.b[*]') AS r",
        f"SELECT json_extract_string({J}, '$.arr[*].v') AS r",
        "SELECT printf('%08s|%-8s|', 'ab', 'cd') AS r",
        "SELECT to_base(10, 2, 8) AS a, to_base(255, 16, 4) AS b",
        "SELECT jaro_similarity('', '') AS a, "
        "jaro_winkler_similarity('', '') AS b, "
        "jaro_similarity('a', '') AS c",
        "SELECT jaro_similarity('martha', 'marhta') AS r",
    ):
        _check(engine, duck, q)
