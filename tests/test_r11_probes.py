"""Judge-probe cross-engine gate (round 11).

The r10 verdict's 209 fresh differential probes found a new tail of
divergences on undeclared-but-ordinary SQL. This file commits the
probes (and the fixes' edge cases) as a permanent gate — every case is
identical text executed in both engines:

Fixed here (dialect.py / deltalog.py / engine.py / udfs.py r11):
  1. date_trunc return type follows the FIELD: day-or-coarser → DATE
     (even over TIMESTAMP input), hour-or-finer → TIMESTAMP; all
     DuckDB alias spellings map; isoyear truncates to the Monday of
     ISO week 1; unknown specifiers refuse loudly (Spark NULLs them).
  2. sum(DECIMAL(p,s)) → DECIMAL(38,s) for ANY p, overflow-safe to 38
     digits (Spark's p+10 rule threw at 14 digits), incl. DISTINCT /
     FILTER / OVER forms.
  3. corr() on zero-variance or single-row input → NULL (Spark's corr
     throws DIVIDE_BY_ZERO under ANSI), with pairwise NULL skipping.
  4. extract(field FROM INTERVAL-literal) computes on DuckDB's
     three-field (months, days, micros) model — hours unbounded,
     millisecond/microsecond within-the-minute — for extract,
     date_part, and the field-function spellings.
  5. VALUES-derived and SELECT-cast-alias decimal columns are provable
     (quantile_cont/median/sum/avg over literal tables quantize like
     DuckDB).
  6. to_timestamp(secs) and make_timestamptz(…) are TIMESTAMPTZ
     sources: a ::VARCHAR render carries the '+00' session offset.
  7. strptime's 1900-default −70-year shift fires only for string-
     LITERAL formats (ADVICE: a dynamic format with a runtime year
     directive was silently shifted 70 years early).

Documented divergences are pinned at the bottom so a behavior change
in either engine shows up as a test failure, not a silent drift.
"""

from __future__ import annotations

import pytest

from duckdb_read_spark.dialect import to_spark_sql
from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows


def _check(engine, duck, q):
    got = spark_rows(engine.sql(q, dialect="duckdb"))
    want = duckdb_rows(duck, q)
    assert got == want, q + "\n" + diff_summary(got, want)


# ---------------------------------------------------------------- 1
def test_date_trunc_field_decides_type(engine, duck):
    """DuckDB 1.0 date_trunc returns DATE for day-or-coarser fields and
    TIMESTAMP for hour-or-finer, regardless of the input type
    [measured matrix r11]; Spark always returns TIMESTAMP — a silent
    schema AND render divergence on GROUP BY date_trunc('month', …)."""
    for fld in ("day", "week", "month", "quarter", "year", "decade",
                "century", "millennium", "hour", "minute", "second",
                "millisecond", "microsecond", "isoyear", "epoch"):
        for expr in ("DATE '2024-05-17'",
                     "TIMESTAMP '2024-05-17 10:30:45.123456'"):
            _check(engine, duck,
                   f"SELECT CAST(date_trunc('{fld}', {expr}) "
                   f"AS VARCHAR) v, date_trunc('{fld}', {expr}) r")


def test_date_trunc_alias_spellings(engine, duck):
    """Short/plural alias fields map to the same truncation [measured:
    'd','days','w','mon','quarters','y','decades','centuries',
    'millennia','h','hr','mins','s','secs','ms','us' all accepted]."""
    for fld in ("d", "days", "w", "weeks", "mon", "months", "quarters",
                "y", "years", "decades", "centuries", "millenniums",
                "millennia", "h", "hr", "hours", "m", "mins", "minutes",
                "s", "secs", "seconds", "ms", "milliseconds", "us",
                "microseconds", "epoch"):
        _check(engine, duck,
               f"SELECT CAST(date_trunc('{fld}', "
               f"TIMESTAMP '2024-05-17 10:30:45.123456') AS VARCHAR) v")


def test_date_trunc_isoyear(engine, duck):
    """isoyear truncates to the MONDAY of ISO week 1 [measured:
    '2021-01-01' → '2019-12-30'; '2023-01-01' → '2022-01-03']."""
    for d in ("2021-01-01", "2020-12-31", "2023-01-01", "2024-05-17",
              "2024-12-30"):
        _check(engine, duck,
               f"SELECT CAST(date_trunc('isoyear', DATE '{d}') "
               f"AS VARCHAR) v")


def test_date_trunc_group_by(engine, duck):
    """GROUP BY date_trunc — the ordinary-SQL shape the r10 verdict
    flagged — matches in schema, values, and render."""
    rows = ("(VALUES (DATE '2024-05-17'),(DATE '2024-05-02'),"
            "(DATE '2024-06-01'),(DATE '2023-12-31')) t(d)")
    _check(engine, duck,
           f"SELECT date_trunc('month', d) m, count(*) c FROM {rows} "
           f"GROUP BY 1 ORDER BY 1")
    _check(engine, duck,
           f"SELECT date_trunc('year', d) y, count(*) c FROM {rows} "
           f"GROUP BY 1 ORDER BY 1")
    _check(engine, duck,
           "SELECT date_trunc('month', l_shipdate) m, count(*) c "
           "FROM lineitem GROUP BY 1 ORDER BY 1 LIMIT 5")


def test_date_trunc_group_by_fuzz(engine, duck):
    """Deterministic fuzz family: GROUP BY date_trunc over a seeded
    spread of dates/timestamps × every day-or-coarser field — schema,
    values, and render all match (the r10 verdict's done-bar)."""
    import random

    rng = random.Random(1137)
    cells = []
    for _ in range(40):
        y = rng.randint(1989, 2031)
        mth = rng.randint(1, 12)
        dd = rng.randint(1, 28)
        if rng.random() < 0.5:
            cells.append(f"(TIMESTAMP '{y:04d}-{mth:02d}-{dd:02d} "
                         f"{rng.randint(0, 23):02d}:"
                         f"{rng.randint(0, 59):02d}:00')")
        else:
            cells.append(
                f"(CAST(DATE '{y:04d}-{mth:02d}-{dd:02d}' "
                f"AS TIMESTAMP))")
    rows = "(VALUES " + ",".join(cells) + ") t(d)"
    for fld in ("day", "week", "month", "quarter", "year", "isoyear",
                "decade", "century"):
        _check(engine, duck,
               f"SELECT date_trunc('{fld}', d) k, count(*) c, "
               f"CAST(date_trunc('{fld}', d) AS VARCHAR) r "
               f"FROM {rows} GROUP BY 1, 3 ORDER BY 1")


def test_date_trunc_unknown_specifier_refuses(engine):
    """DuckDB rejects an unrecognized specifier with a Conversion
    Error; Spark would silently return NULL — the engine refuses."""
    for bad in ("qtr", "dd", "yy", "era"):
        with pytest.raises(Exception, match="(?i)not recognized"):
            engine.sql(f"SELECT date_trunc('{bad}', DATE '2024-05-17')",
                       dialect="duckdb").collect()


# ---------------------------------------------------------------- 2
def test_sum_decimal_result_type(engine, duck):
    """sum(DECIMAL(p,s)) is DECIMAL(38,s) in DuckDB for ANY p
    [measured]; Spark's p+10 rule gave DECIMAL(14,1) — schema mismatch
    on every undeclared decimal sum."""
    for q in (
        "SELECT typeof(sum(x)) t, CAST(sum(x) AS VARCHAR) v "
        "FROM (VALUES (CAST(1.5 AS DECIMAL(4,1))),"
        "(CAST(2.5 AS DECIMAL(4,1)))) t(x)",
        "SELECT typeof(sum(DISTINCT x)) t "
        "FROM (VALUES (CAST(1.5 AS DECIMAL(4,1)))) t(x)",
        "SELECT typeof(sum(x) FILTER (WHERE x > 1)) t "
        "FROM (VALUES (CAST(1.5 AS DECIMAL(4,1)))) t(x)",
        "SELECT x, typeof(sum(x) OVER ()) t "
        "FROM (VALUES (CAST(1.5 AS DECIMAL(4,1)))) t(x)",
        "SELECT typeof(sum(x)) t, CAST(sum(x) AS VARCHAR) v "
        "FROM (VALUES (1.5),(2.25)) t(x)",
        "SELECT typeof(sum(l_quantity)) t, "
        "CAST(sum(l_quantity) AS VARCHAR) v FROM lineitem",
    ):
        _check(engine, duck, q)


def test_sum_decimal_survives_p_plus_10_overflow(engine, duck):
    """A DECIMAL(3,1) summed 100k times exceeds Spark's p+10 = 13-digit
    accumulator headroom zone by construction — DuckDB keeps going to
    38 digits and so must the engine."""
    _check(engine, duck,
           "SELECT typeof(sum(x)) t, CAST(sum(x) AS VARCHAR) v FROM "
           "(SELECT CAST(99.9 AS DECIMAL(3,1)) x FROM range(100000)) t")


def test_sum_non_decimal_untouched(engine, duck):
    """Integer sums keep the HUGEINT-fence behavior and double sums
    stay DOUBLE — only provably-decimal operands rewrite."""
    _check(engine, duck, "SELECT sum(x) s FROM (VALUES (1),(2)) t(x)")
    _check(engine, duck,
           "SELECT typeof(sum(x)) t FROM (VALUES (1.5e0)) t(x)")


# ---------------------------------------------------------------- 3
def test_corr_zero_variance_is_null(engine, duck):
    """corr() with a constant side or a single row: DuckDB → NULL;
    Spark's corr throws DIVIDE_BY_ZERO under ANSI [measured r11] — a
    loud failure for a legal answer."""
    for q in (
        "SELECT corr(y,x) c FROM (VALUES (1,1),(1,2),(1,3)) t(x,y)",
        "SELECT corr(y,x) c FROM (VALUES (1,1),(2,1),(3,1)) t(x,y)",
        "SELECT corr(y,x) c FROM (VALUES (1,1)) t(x,y)",
        "SELECT corr(y,x) c FROM (VALUES (1,1),(2,2)) t(x,y)",
        # pairwise NULL skipping: the NULL y row must not perturb
        # stddev(x)
        "SELECT corr(y,x) c FROM (VALUES (1,NULL),(2,3),(3,4),(4,5)) "
        "t(x,y)",
        "SELECT corr(y,x) FILTER (WHERE x < 3) c "
        "FROM (VALUES (1,1),(2,2),(3,9)) t(x,y)",
        # grouped: one degenerate group must not kill the others
        "SELECT g, corr(y,x) c FROM (VALUES (1,1,1),(1,1,2),(2,1,1),"
        "(2,2,3)) t(g,x,y) GROUP BY g ORDER BY g",
        "SELECT x, CAST(CAST(corr(y,x) OVER (ORDER BY x) "
        "AS DECIMAL(10,6)) AS DOUBLE) c "
        "FROM (VALUES (1,1),(2,3),(3,4)) t(x,y) ORDER BY x",
    ):
        _check(engine, duck, q)


def test_regr_family_degenerate_agrees_natively(engine, duck):
    """regr_slope/intercept/r2 and covar already agree on degenerate
    input (NULL / 1.0) without a rewrite — pinned so a Spark behavior
    change surfaces."""
    for q in (
        "SELECT regr_slope(y,x) s, regr_intercept(y,x) i "
        "FROM (VALUES (1,1),(1,2)) t(x,y)",
        "SELECT regr_r2(y,x) r FROM (VALUES (1,1),(2,1),(3,1)) t(x,y)",
        "SELECT covar_samp(y,x) c FROM (VALUES (1,1)) t(x,y)",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 4
def test_extract_interval_three_field_model(engine, duck):
    """extract over interval LITERALS: DuckDB's (months, days, micros)
    storage is NOT normalized across fields — hour('26:30:00') = 26,
    day('400 days') = 400, millisecond includes the seconds digits
    [measured matrix r11]; Spark folds micros into days."""
    for q in (
        "SELECT extract(hour FROM INTERVAL '26:30:00') h",
        "SELECT extract(minute FROM INTERVAL '26:30:45.123456') m",
        "SELECT extract(second FROM INTERVAL '26:30:45.123456') s",
        "SELECT extract(millisecond FROM INTERVAL '26:30:45.123456') v",
        "SELECT extract(microsecond FROM INTERVAL '26:30:45.123456') v",
        "SELECT extract(day FROM INTERVAL '400 days') d",
        "SELECT extract(day FROM INTERVAL '26 hours') d",
        "SELECT extract(year FROM INTERVAL '25 months') y",
        "SELECT extract(month FROM INTERVAL '25 months') m",
        "SELECT extract(month FROM INTERVAL '-14 months') m",
        "SELECT extract(quarter FROM INTERVAL '-11 months') q",
        "SELECT extract(hour FROM INTERVAL '-26:30:00') h",
        "SELECT extract(minute FROM INTERVAL '-26:30:00') m",
        "SELECT extract(decade FROM INTERVAL '250 months') d",
        "SELECT extract(century FROM INTERVAL '15000 months') c",
        "SELECT extract(hour FROM INTERVAL '14 months 3 days 2 hours')"
        " h",
        "SELECT date_part('hour', INTERVAL '1 day 26 hours 90 minutes')"
        " h",
        "SELECT hour(INTERVAL '26:30:00') h",
        "SELECT minute(INTERVAL '26:30:00') m",
        "SELECT year(INTERVAL '25 months') y",
        "SELECT day(INTERVAL '400 days') d",
        # timestamps keep Spark's native path
        "SELECT extract(hour FROM TIMESTAMP '2024-05-17 10:30:45') h",
        "SELECT hour(TIMESTAMP '2024-05-17 10:30:45') h",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 5
def test_values_derived_decimals_prove(engine, duck):
    """Bare dotted literals ARE decimals in DuckDB (1.5 → DECIMAL(2,1))
    and a VALUES column unifies to (max int digits + max scale, max
    scale) [measured r11] — median/quantile_cont/avg over a literal
    table quantize to that scale, not DOUBLE."""
    for q in (
        "SELECT typeof(x) t FROM (VALUES (1.5),(2.25)) t(x) LIMIT 1",
        "SELECT typeof(x) t FROM (VALUES (1.5),(2)) t(x) LIMIT 1",
        "SELECT quantile_cont(x, [0.25, 0.75]) q "
        "FROM (VALUES (1.0),(2.0),(3.0)) t(x)",
        "SELECT median(x) m FROM (VALUES (1.0),(2.0)) t(x)",
        "SELECT typeof(avg(x)) t, avg(x) v "
        "FROM (VALUES (1.5),(2.25)) t(x)",
        "SELECT x / 2 d, typeof(x / 2) t FROM (VALUES (1.5)) t(x)",
        "SELECT a, b, sum(a*b) s FROM (VALUES (1.5, 2),(2.5, 3)) "
        "t(a,b) GROUP BY a, b ORDER BY a",
        # SELECT-alias of a decimal cast in a derived table
        "SELECT typeof(sum(x)) t, CAST(sum(x) AS VARCHAR) v FROM "
        "(SELECT CAST(99.9 AS DECIMAL(3,1)) x FROM range(10)) t",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 6
def test_instant_constructor_varchar_render(engine, duck):
    """to_timestamp(secs) and make_timestamptz are TIMESTAMPTZ in
    DuckDB — a VARCHAR render carries the '+00' session offset
    [measured]; epoch_ms/make_timestamp are naive and render bare."""
    for q in (
        "SELECT CAST(to_timestamp(1718000000) AS VARCHAR) v",
        "SELECT to_timestamp(1718000000)::VARCHAR v",
        "SELECT CAST(to_timestamp(1718000000.5) AS VARCHAR) v",
        "SELECT CAST(make_timestamptz(2024,6,10,7,33,20) AS VARCHAR) v",
        "SELECT CAST(make_timestamptz(2024,6,10,7,33,20,"
        "'America/New_York') AS VARCHAR) v",
        "SELECT make_timestamptz(2024,6,10,7,33,20) r",
        "SELECT CAST(make_timestamp(2024,6,10,7,33,20) AS VARCHAR) v",
        "SELECT CAST(epoch_ms(1718000000000) AS VARCHAR) v",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 7
def test_strptime_shift_only_for_literal_formats():
    """A non-literal strptime format carries no '%' in its SQL text, so
    the 1900-default shift CANNOT be proven — it must stay unshifted
    (ADVICE r10: a runtime format with a year directive was silently
    shifted 70 years early). Rewrite-text check (no runtime needed)."""
    shifted = to_spark_sql("SELECT strptime(s, '%m-%d') FROM t")
    assert "INTERVAL '-70' YEAR" in shifted
    unshifted = to_spark_sql("SELECT strptime(s, f) FROM t")
    assert "INTERVAL '-70' YEAR" not in unshifted
    year_lit = to_spark_sql("SELECT strptime(s, '%Y-%m-%d') FROM t")
    assert "INTERVAL '-70' YEAR" not in year_lit


def test_strptime_literal_shift_still_runs(engine, duck):
    """The literal-format year-less default still lands on 1900 in both
    engines, including the FORMAT-LIST form."""
    for q in (
        "SELECT CAST(strptime('05-03', '%m-%d') AS VARCHAR) v",
        "SELECT CAST(try_strptime('05-03', ['%Y', '%m-%d']) "
        "AS VARCHAR) v",
        "SELECT CAST(strptime('2024-05-03', '%Y-%m-%d') AS VARCHAR) v",
    ):
        _check(engine, duck, q)


# ---------------------------------------------------------------- 8
def test_double_varchar_volatile_single_draw(engine):
    """random()::VARCHAR evaluates the source ONCE (ADVICE r11: the old
    (x, x IS NULL) emission drew twice — the render and the NULL flag
    could disagree). Every row must parse as a float in [0, 1)."""
    rows = spark_rows(engine.sql(
        "SELECT random()::VARCHAR v FROM range(20)", dialect="duckdb"))
    for (v,) in rows:
        assert v is not None
        assert 0.0 <= float(v) < 1.0


# ---------------------------------------------------------------- 9
def test_setop_varchar_unification(engine, duck):
    """Mixed-type set-op arms: DuckDB unifies a VARCHAR arm with int/
    decimal/date/bool arms to VARCHAR [measured r11 lattice]; Spark
    under ANSI cast the string arm to the numeric type (runtime error
    for 'a', SILENT int typing for '2')."""
    for q in (
        "SELECT 1 UNION ALL SELECT 'a'",
        "SELECT 1 x UNION ALL SELECT 'a' ORDER BY x",
        "SELECT 1 UNION ALL SELECT '2'",
        "SELECT 1.5 UNION ALL SELECT 'a'",
        "SELECT DATE '2024-01-01' UNION ALL SELECT 'x'",
        "SELECT 1.5e0 UNION ALL SELECT 'a'",
        "SELECT true UNION ALL SELECT 'yes'",
        "SELECT 'a' UNION ALL SELECT 1",
        "SELECT 1, 'b' UNION ALL SELECT 'a', 'c'",
        "SELECT 1 UNION SELECT '1' ORDER BY 1",
        "SELECT 1 INTERSECT SELECT '1'",
        "SELECT 1 EXCEPT SELECT '1'",
        "SELECT 1 UNION ALL SELECT 'a' UNION ALL SELECT 2.5",
        "SELECT x FROM (SELECT 1 x UNION ALL SELECT 'a') t ORDER BY x",
        "SELECT n_name FROM nation WHERE n_nationkey = 0 "
        "UNION ALL SELECT 1",
        # same-type arms stay native
        "SELECT 1 UNION ALL SELECT 2",
        "SELECT 1 UNION ALL SELECT NULL",
        "SELECT 1 UNION ALL SELECT 1.5",
    ):
        got = sorted(map(str, spark_rows(
            engine.sql(q, dialect="duckdb"))))
        want = sorted(map(str, duckdb_rows(duck, q)))
        assert got == want, q + f"\n got {got}\n want {want}"


# --------------------------------------------------------------- 10
def test_windowed_median_over_frames(engine, duck):
    """median(x) OVER with ORDER BY / an explicit frame: Spark's
    median refuses (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), DuckDB
    computes it — rewritten to percentile(x, 0.5), Spark's identical
    exact interpolating median that accepts every frame."""
    for q in (
        "SELECT x, median(x) OVER (ORDER BY x ROWS BETWEEN 1 "
        "PRECEDING AND CURRENT ROW) m FROM (VALUES (1),(2),(4),(8)) "
        "t(x) ORDER BY x",
        "SELECT x, median(x) OVER (ORDER BY x) m "
        "FROM (VALUES (1),(2),(4)) t(x) ORDER BY x",
        "SELECT x, median(x) OVER (ORDER BY x RANGE BETWEEN 2 "
        "PRECEDING AND CURRENT ROW) m FROM (VALUES (1),(2),(4),(8)) "
        "t(x) ORDER BY x",
        "SELECT g, x, median(x) OVER (PARTITION BY g) m "
        "FROM (VALUES (1,1),(1,2),(2,5)) t(g,x) ORDER BY g, x",
        "SELECT x, quantile_cont(x, 0.25) OVER (ORDER BY x ROWS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW) q "
        "FROM (VALUES (1),(2),(4)) t(x) ORDER BY x",
        "SELECT x, median(x) OVER w m FROM (VALUES (1),(2),(4)) t(x) "
        "WINDOW w AS (ORDER BY x ROWS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW) ORDER BY x",
        "SELECT median(x) m FROM (VALUES (1),(2)) t(x)",
    ):
        _check(engine, duck, q)


# --------------------------------------------------------------- 11
def test_age_on_dates_and_struct_insert(engine, duck):
    """Two r11 sweep finds: age(DATE, DATE) crashed the render UDF on
    the missing time attributes (dates now promote to midnight like
    DuckDB's implicit cast), and struct_insert's ``k := v`` named-
    argument syntax was a Spark parse error (literal-struct bases now
    merge; non-literal bases refuse with guidance)."""
    for q in (
        "SELECT age(DATE '2024-03-01', DATE '2020-01-15')::VARCHAR a",
        "SELECT age(TIMESTAMP '2024-03-01 10:00:00', "
        "TIMESTAMP '2020-01-15 04:00:00')::VARCHAR a",
        "SELECT struct_insert({'a': 1}, b := 2) s",
        "SELECT struct_insert({'a': 1}, b := 2, c := 'x') s",
        "SELECT struct_insert({'a': 1}, b := 2).b v",
    ):
        _check(engine, duck, q)
    with pytest.raises(Exception, match="non-literal struct"):
        engine.sql("SELECT struct_insert(s, b := 2) FROM "
                   "(SELECT {'a': 1} s) t", dialect="duckdb").collect()


# --------------------------------------------------------------- 12
def test_bit_literals_fold(engine, duck):
    """DuckDB BITSTRING surface over literal operands constant-folds
    (Spark has no BIT type at all): casts render the 0/1 string,
    bit_count/get_bit/set_bit/bit_length/octet_length/bit_position/
    bitstring and the |/&/xor combinators compute driver-side."""
    for q in (
        "SELECT '101'::BIT b",
        "SELECT '101'::BIT::VARCHAR v",
        "SELECT bit_count('1011'::BIT) c",
        "SELECT get_bit('101'::BIT, 1) g",
        "SELECT set_bit('101'::BIT, 1, 1)::VARCHAR s",
        "SELECT bit_length('101'::BIT) l, "
        "octet_length('10101010'::BIT) o",
        "SELECT bit_position('010'::BIT, '1101011'::BIT) p",
        "SELECT bit_position('11'::BIT, '0000'::BIT) p",
        "SELECT bitstring('101', 7)::VARCHAR b",
        "SELECT ('101'::BIT | '010'::BIT)::VARCHAR v",
        "SELECT ('101'::BIT & '011'::BIT)::VARCHAR v",
        "SELECT xor('101'::BIT, '011'::BIT)::VARCHAR v",
        "SELECT bit_count(bitstring('101', 9)) c",
    ):
        _check(engine, duck, q)
    for bad, msg in (("SELECT '12'::BIT", "Invalid character"),
                     ("SELECT ('101'::BIT | '01'::BIT)",
                      "different size")):
        with pytest.raises(Exception, match=msg):
            engine.sql(bad, dialect="duckdb").collect()


def test_timezone_naive_direction_renders_instant(engine, duck):
    """timezone(tz, naive TIMESTAMP) returns TIMESTAMPTZ in DuckDB —
    its VARCHAR render carries '+00'; the instant→wall direction stays
    a bare naive render [measured r11]."""
    for q in (
        "SELECT timezone('America/New_York', "
        "TIMESTAMP '2024-06-05 07:08:09')::VARCHAR v",
        "SELECT timezone('America/New_York', "
        "TIMESTAMPTZ '2024-06-05 07:08:09+00')::VARCHAR v",
        "SELECT timezone('America/New_York', "
        "TIMESTAMP '2024-06-05 07:08:09') r",
    ):
        _check(engine, duck, q)


def test_least_greatest_mixed_and_where_int(engine, duck):
    """least/greatest with a string literal against numeric/date args:
    DuckDB casts the STRING to the other side's type ('05' orders as
    5, not as text) where Spark refuses mixed types; and a bare
    integer literal in WHERE/HAVING casts to BOOLEAN [measured r11]."""
    for q in (
        "SELECT least(1, '2') l",
        "SELECT greatest('1', 2) g",
        "SELECT least('10', 9) l",
        "SELECT least(1, '05') l",
        "SELECT greatest(DATE '2024-01-01', '2023-06-01') g",
        "SELECT least(1.5e0, '2') l",
        "SELECT count(*) c FROM nation WHERE 1",
        "SELECT count(*) c FROM nation WHERE 0",
        "SELECT n_regionkey, count(*) c FROM nation GROUP BY 1 "
        "HAVING 1 ORDER BY 1",
        "SELECT least('a', 'b') l",
        "SELECT least(1, 2) l",
    ):
        _check(engine, duck, q)


def test_escape_string_literals(engine, duck):
    """Postgres-style E'…' literals decode driver-side [measured:
    controls, \\xHH hex, \\ooo octal, '' and \\' quote escapes, an
    unknown escape drops the backslash]; Spark refuses the typed
    literal E outright."""
    for q in (
        r"SELECT e'a\nb' v", r"SELECT E'a\tb' v",
        r"SELECT e'it''s' v", r"SELECT e'it\'s' v",
        r"SELECT e'a\x41b' v", r"SELECT e'a\101b' v",
        r"SELECT e'back\\slash' v", r"SELECT e'\q' v",
        r"SELECT length(e'a\nb') l",
        r"SELECT 'a\nb' v",  # plain literal keeps the raw backslash
    ):
        _check(engine, duck, q)


def test_alias_tablesample_array_alias_kinds(engine, duck):
    """Three r11 sweep finds: alias() rebinds on a BARE trailing alias
    (not just AS); TABLESAMPLE method-forms map like USING SAMPLE
    (bernoulli/system percent → PERCENT, reservoir rows → ROWS); and a
    list-literal SELECT alias proves array kind so the outer len()/
    indexing dispatch sees the derived column."""
    for q in (
        "SELECT alias(n_nationkey) a FROM nation LIMIT 1",
        "SELECT alias(n_nationkey) AS b FROM nation LIMIT 1",
        "SELECT alias(n_nationkey) FROM nation LIMIT 1",
        "SELECT count(*) c FROM nation TABLESAMPLE reservoir(4 ROWS)",
        "SELECT count(*) = 25 c FROM nation "
        "TABLESAMPLE system(100 PERCENT)",
        "SELECT arr[1] one, arr[len(arr)] lst "
        "FROM (SELECT ['a','b','c'] arr) t",
        "SELECT len(arr) l FROM (SELECT [1,2,3] arr) t",
    ):
        _check(engine, duck, q)
    # approximate % sample: count is within [0, full]
    rows = spark_rows(engine.sql(
        "SELECT count(*) c FROM nation TABLESAMPLE BERNOULLI(50%)",
        dialect="duckdb"))
    assert 0 <= rows[0][0] <= 25


def test_histogram_varchar_render(engine, duck):
    """CAST(histogram(…) AS VARCHAR) renders DuckDB's '{k=v}' shape —
    the render pass's cheap guard skipped the map_from_entries
    emission (r11)."""
    for q in (
        "SELECT CAST(histogram(x) AS VARCHAR) h "
        "FROM (VALUES (1),(2),(2)) t(x)",
        "SELECT CAST(list_histogram([1,1,2]) AS VARCHAR) h",
    ):
        _check(engine, duck, q)


def test_list_histogram_and_time_date_diff(engine, duck):
    """list_histogram (NULL-skipping sorted-key MAP) and date_diff over
    TIME literals (anchored on one date) — r11 sweep finds."""
    for q in (
        "SELECT list_histogram([1,1,2,NULL]) h",
        "SELECT list_histogram(['b','a','b']) h",
        "SELECT list_histogram([]) h",
        "SELECT date_diff('minute', TIME '10:00:00', "
        "TIME '11:30:00') d",
        "SELECT date_diff('hour', TIME '01:59:00', "
        "TIME '02:01:00') d",
        "SELECT datediff('minute', TIME '10:00:00', "
        "TIME '10:45:00') d",
    ):
        _check(engine, duck, q)


def test_windowed_rewritten_aggregates(engine, duck):
    """Rewritten aggregates accept window frames: the trailing OVER
    hoists onto the inner collect_list/sub-aggregates (r11 — product/
    quantile_disc/entropy/histogram/sem parse-errored or demanded a
    GROUP BY when windowed)."""
    V = "(VALUES (1, 2.0),(2, 4.0),(3, 8.0),(4, 16.0)) t(o, x)"
    for q in (
        f"SELECT o, quantile_disc(x, 0.5) OVER (ORDER BY o ROWS "
        f"BETWEEN 1 PRECEDING AND CURRENT ROW) q FROM {V} ORDER BY o",
        f"SELECT o, quantile(x, [0.25, 0.75]) OVER (ORDER BY o) q "
        f"FROM {V} ORDER BY o",
        f"SELECT o, product(x) OVER (ORDER BY o ROWS BETWEEN 1 "
        f"PRECEDING AND CURRENT ROW) p FROM {V} ORDER BY o",
        f"SELECT o, CAST(CAST(entropy(o) OVER (ORDER BY o) "
        f"AS DECIMAL(12,6)) AS DOUBLE) e FROM {V} ORDER BY o",
        f"SELECT o, histogram(o) OVER (ORDER BY o ROWS BETWEEN 1 "
        f"PRECEDING AND CURRENT ROW) h FROM {V} ORDER BY o",
        f"SELECT o, CAST(CAST(sem(x) OVER (ORDER BY o) "
        f"AS DECIMAL(12,6)) AS DOUBLE) s FROM {V} ORDER BY o",
        f"SELECT product(x) p, quantile_disc(x, 0.5) q, "
        f"sem(x)::DECIMAL(12,6)::DOUBLE s FROM {V}",
        f"SELECT entropy(o)::DECIMAL(12,6)::DOUBLE e, histogram(o) h "
        f"FROM {V}",
    ):
        _check(engine, duck, q)


def test_filter_clause_on_rewritten_aggregates(engine, duck):
    """Trailing FILTER clauses hoist onto the inner collect_list of
    rewritten aggregates (r11 — quantile_disc/quantile_cont FILTER
    landed on the element_at wrapper); array_pop_back/front map to
    clamped slices."""
    V = "(VALUES (1, 2.0),(2, 4.0),(3, 8.0),(4, 16.0)) t(o, x)"
    for q in (
        f"SELECT product(x) FILTER (WHERE o > 1) p FROM {V}",
        f"SELECT quantile_disc(x, 0.5) FILTER (WHERE o > 1) q "
        f"FROM {V}",
        f"SELECT quantile_cont(x, [0.5]) FILTER (WHERE o > 1) q "
        f"FROM {V}",
        f"SELECT median(x) FILTER (WHERE o > 1) m FROM {V}",
        f"SELECT entropy(o) FILTER (WHERE o < 3) e FROM {V}",
        f"SELECT histogram(o) FILTER (WHERE o < 3) h FROM {V}",
        f"SELECT sem(x) FILTER (WHERE o > 1)::DECIMAL(12,6)::DOUBLE s "
        f"FROM {V}",
        "SELECT array_pop_back([1,2,3]) b, array_pop_front([1,2,3]) f",
        "SELECT array_pop_back([1]) b, array_pop_front([1]) f",
        "SELECT array_pop_back(CAST(NULL AS INT[])) b",
    ):
        _check(engine, duck, q)


def test_map_literal_nonstring_keys(engine, duck):
    """MAP brace literals accept any literal key in DuckDB (numeric,
    decimal, DATE) — the struct-literal pass only recognized quoted/
    identifier keys, so MAP {1: 'x'} reached Spark unparsed (r11)."""
    for q in (
        "SELECT element_at(MAP {1: 'x'}, 2) e",
        "SELECT element_at(MAP {1: 'x'}, 1) e",
        "SELECT MAP {1: 'x', 2: 'y'}[2] v",
        "SELECT MAP {1.5: 'x'}[1.5] v",
        "SELECT map_keys(MAP {DATE '2024-01-01': 1}) k",
        "SELECT MAP {'a': 1}['a'] v",
    ):
        _check(engine, duck, q)


def test_distinct_on_expression_keys(engine, duck):
    """DISTINCT ON with EXPRESSION keys: the compiled row_number form
    projects each non-column key as a hidden __don_kN so the outer
    ORDER BY can resolve it (r11 — Spark errored UNRESOLVED_COLUMN)."""
    for q in (
        "SELECT DISTINCT ON (n_regionkey, n_nationkey % 2) "
        "n_regionkey, n_name FROM nation "
        "ORDER BY n_regionkey, n_nationkey % 2, n_name",
        "SELECT DISTINCT ON (substr(n_name, 1, 1)) "
        "substr(n_name,1,1) c, n_name FROM nation "
        "ORDER BY substr(n_name, 1, 1), n_name",
        "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name "
        "FROM nation ORDER BY n_regionkey, n_name DESC",
    ):
        _check(engine, duck, q)


def test_comprehension_mod_and_dynamic_interval(engine, duck):
    """Two r11 sweep finds: a list comprehension's IF filter with %
    arithmetic was mangled by the try_mod pass running first (the
    comprehension now compiles before the operator passes), and
    INTERVAL (expr) UNIT — a dynamic quantity — maps to
    (expr) * INTERVAL '1' UNIT (weeks as 7 days)."""
    for q in (
        "SELECT [x FOR x IN [1,2,3] IF x % 2 = 1] lf",
        "SELECT [x * 2 FOR x IN [1,2,3]] lc",
        "SELECT INTERVAL (n_nationkey) DAY iv FROM nation "
        "WHERE n_nationkey = 2",
        "SELECT DATE '2024-01-01' + INTERVAL (n_nationkey) MONTH d "
        "FROM nation WHERE n_nationkey = 3",
        "SELECT INTERVAL (2) WEEK w",
        "SELECT INTERVAL 3 DAY v",
    ):
        _check(engine, duck, q)


def test_multi_key_ordered_aggregates(engine, duck):
    """array_agg/string_agg with MULTI-key or NULLS-overridden ORDER
    BY: comparator-sorted struct collection with per-key direction and
    DuckDB's NULLS LAST default (r11 — multi-key forms reached Spark's
    parser and failed; NULLS keywords emitted invalid sort text)."""
    V = ("(VALUES (1, 'b', 10),(2, 'a', 10),(3, 'a', 5),"
         "(NULL, 'c', 1)) t(x, s, k)")
    for q in (
        "SELECT n_regionkey r, array_agg(n_name ORDER BY "
        "length(n_name) DESC, n_name) a FROM nation "
        "GROUP BY 1 ORDER BY 1",
        f"SELECT array_agg(x ORDER BY s, k DESC) a FROM {V}",
        f"SELECT array_agg(x ORDER BY k DESC, s) a FROM {V}",
        f"SELECT array_agg(x ORDER BY x NULLS FIRST) a FROM {V}",
        f"SELECT array_agg(s ORDER BY x DESC NULLS FIRST) a FROM {V}",
        f"SELECT string_agg(s, '-' ORDER BY k, s DESC) a FROM {V}",
        f"SELECT string_agg(s, '|' ORDER BY x NULLS FIRST) a FROM {V}",
        f"SELECT array_agg(x ORDER BY x) a FROM {V}",
        f"SELECT array_agg(x ORDER BY x DESC) a FROM {V}",
    ):
        _check(engine, duck, q)


def test_union_type_fence(engine):
    """DuckDB UNION (sum) types have no Spark analog — union_value/
    union_extract/union_tag refuse with guidance, not a ':=' parse
    error."""
    with pytest.raises(Exception, match="UNION types"):
        engine.sql("SELECT union_value(num := 2) u",
                   dialect="duckdb").collect()


# ------------------------------------------------------- pinned
def test_r11_over_acceptance_pins(engine, duck):
    """Documented over-acceptances from the r10 verdict's probe batch
    (engine accepts and answers; DuckDB 1.0.0 errors) — pinned so
    drift in either engine is loud: sum(INTERVAL) (DuckDB binder-
    errors, Spark sums day-time intervals), the postfix
    ``lead(x) IGNORE NULLS`` spelling (DuckDB parser rejects), and
    overlay() (absent from DuckDB 1.0's catalog)."""
    import duckdb as _duckdb
    for q in (
        "SELECT sum(INTERVAL '1 day') s FROM (VALUES (1)) t(x)",
        "SELECT lead(x) IGNORE NULLS OVER (ORDER BY x) l "
        "FROM (VALUES (1)) t(x)",
        "SELECT overlay('hello' PLACING 'XX' FROM 2) o",
    ):
        with pytest.raises(_duckdb.Error):
            duck.execute(q).fetchall()
        engine.sql(q, dialect="duckdb").collect()  # over-accepts (doc'd)


def test_arg_max_tie_break_pin(engine, duck):
    """arg_max/max_by on TIED keys: DuckDB keeps the FIRST-SEEN value
    (single-threaded scan order); Spark's choice is unspecified and
    partition-order-dependent — a documented divergence (like the
    mode() tie pin): the engine must return SOME tied value, exact
    identity is not contractual."""
    q = "SELECT arg_max(v, k) a FROM (VALUES ('a',1),('b',1)) t(v,k)"
    assert duckdb_rows(duck, q) == [("a",)]  # first seen
    got = spark_rows(engine.sql(q, dialect="duckdb"))
    assert got[0][0] in ("a", "b")


def test_double_varchar_renders_unchanged(engine, duck):
    """The single-arg re-parse render keeps every r10 shape [measured:
    repr-style shortest round-trip, 'nan'/'inf', NULL]."""
    for q in (
        "SELECT CAST(1e16 AS VARCHAR) a, CAST(0.5e0 AS VARCHAR) b, "
        "CAST(1e-5 AS VARCHAR) c",
        "SELECT CAST(CAST('nan' AS DOUBLE) AS VARCHAR) a, "
        "CAST(CAST('inf' AS DOUBLE) AS VARCHAR) b, "
        "CAST(CAST('-inf' AS DOUBLE) AS VARCHAR) c",
        "SELECT CAST(CAST(NULL AS DOUBLE) AS VARCHAR) v",
        "SELECT CAST(sqrt(2) AS VARCHAR) v",
        "SELECT CAST(-0.0e0 AS VARCHAR) v",
        "SELECT CAST(avg(x) AS VARCHAR) v FROM (VALUES (1),(2)) t(x)",
        "SELECT (1.5e0)::VARCHAR v",
    ):
        _check(engine, duck, q)
