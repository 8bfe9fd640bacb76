"""Property-based differential fuzzing (SURVEY §5.5, sqllogictest spirit).

A seeded generator emits random queries in the *common dialect subset*
(identical text valid in DuckDB and Spark), obeying the SURVEY §2.0
determinism conventions by construction:

- every double aggregate is decimal-wrapped,
- every query ends with ORDER BY over all output columns, NULLS FIRST,
- only operators/functions spelled identically in both engines are drawn
  (comparisons, IN, BETWEEN, LIKE, CASE, COALESCE, arithmetic, COUNT/MIN/
  MAX/SUM, HAVING, LIMIT).

Each seed is one test case; failures reproduce exactly by seed. 200 seeds
across (projection | aggregation | join | window | setop | QUALIFY |
list/map-construct | star-expression/series-TVF | struct-literal/
comprehension) shapes. This catches divergence classes
the 50 hand-declared queries don't enumerate (operator interaction, literal
edge values, grouping on expressions).
"""

from __future__ import annotations

import random

import pytest

from duckdb_read_spark.oracle import diff_summary, duckdb_rows, spark_rows

# column metadata: (numeric_double, numeric_int, string, key) per table —
# from FIXTURES.md (driver fixture footers).
TABLES = {
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "num": ["o_totalprice"],
        "int": ["o_orderkey", "o_custkey"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "num": ["c_acctbal"],
        "int": ["c_custkey", "c_nationkey"],
        "str": ["c_mktsegment", "c_name"],
    },
    "part": {
        "num": ["p_retailprice"],
        "int": ["p_partkey", "p_size"],
        "str": ["p_brand", "p_type", "p_name"],
    },
    "supplier": {
        "num": ["s_acctbal"],
        "int": ["s_suppkey", "s_nationkey"],
        "str": ["s_name"],
    },
}

# literal pools drawn from the fixture domains (FIXTURES.md)
STR_LITERALS = {
    "l_returnflag": ["'A'", "'N'", "'R'"],
    "l_linestatus": ["'F'", "'O'"],
    "o_orderstatus": ["'F'", "'O'", "'P'"],
    "o_orderpriority": ["'1-URGENT'", "'2-HIGH'", "'3-MEDIUM'"],
    "c_mktsegment": ["'BUILDING'", "'AUTOMOBILE'", "'MACHINERY'"],
    "p_brand": ["'Brand#10'", "'Brand#23'"],
}


def _pred(rng: random.Random, t: dict) -> str:
    kind = rng.choice(["num_cmp", "int_cmp", "str_eq", "in_list", "between", "like", "null"])
    if kind == "num_cmp":
        c = rng.choice(t["num"])
        return f"{c} {rng.choice(['<', '>', '<=', '>='])} {rng.choice([0.05, 10, 500, 4.2, 100000])}"
    if kind == "int_cmp":
        c = rng.choice(t["int"])
        if rng.random() < 0.3:
            return f"MOD({c}, {rng.choice([3, 7])}) = 0"
        return f"{c} {rng.choice(['<', '>', '='])} {rng.choice([3, 7, 100, 999])}"
    if kind == "str_eq":
        c = rng.choice(t["str"])
        lit = rng.choice(STR_LITERALS.get(c, ["'zzz'"]))
        return f"{c} {rng.choice(['=', '<>', '>='])} {lit}"
    if kind == "in_list":
        c = rng.choice(t["int"])
        vals = ", ".join(str(rng.randrange(0, 50)) for _ in range(3))
        return f"{c} IN ({vals})"
    if kind == "between":
        c = rng.choice(t["int"])
        lo = rng.randrange(0, 100)
        return f"{c} BETWEEN {lo} AND {lo + rng.randrange(1, 500)}"
    if kind == "like":
        c = rng.choice(t["str"])
        return f"{c} LIKE '%{rng.choice('aeinor')}%'"
    c = rng.choice(t["str"])
    return f"{c} IS NOT NULL"


def _where(rng: random.Random, t: dict) -> str:
    n = rng.randrange(0, 3)
    if n == 0:
        return ""
    preds = [_pred(rng, t) for _ in range(n)]
    return " WHERE " + f" {rng.choice(['AND', 'OR'])} ".join(f"({p})" for p in preds)


def _num_expr(rng: random.Random, t: dict) -> str:
    # Bounded-magnitude expressions only: a product of two ~1e5 columns
    # overflows double precision relative to a DECIMAL(18,4) quantum, making
    # the final rounding engine-dependent (found by seed 15 — the §2.0
    # float-determinism rule extends to expression magnitude).
    a, b = rng.choice(t["num"]), rng.choice(t["num"])
    return rng.choice([
        f"{a} + {b}", f"{a} * 0.1", f"ABS({a} - {b})",
        f"COALESCE(NULLIF({a}, 0), -1)",
        f"CASE WHEN {a} > {b} THEN {a} ELSE {b} END",
    ])


def gen_projection(rng: random.Random) -> str:
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    cols = [
        f"{rng.choice(t['int'])} AS k1",
        f"CAST({_num_expr(rng, t)} AS DECIMAL(18,4)) AS v1",
        f"{rng.choice(t['str'])} AS s1",
    ]
    order = "ORDER BY k1 NULLS FIRST, v1 NULLS FIRST, s1 NULLS FIRST"
    return f"SELECT {', '.join(cols)} FROM {name}{_where(rng, t)} {order} LIMIT 500"


def gen_aggregation(rng: random.Random) -> str:
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    g = rng.choice(t["str"])
    aggs = [
        "COUNT(*) AS cnt",
        f"CAST(SUM(CAST({rng.choice(t['num'])} AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s",
        f"MIN({rng.choice(t['int'])}) AS mn",
        f"MAX({rng.choice(t['num'])}) AS mx",
    ]
    having = " HAVING COUNT(*) > 1" if rng.random() < 0.4 else ""
    return (
        f"SELECT {g} AS g, {', '.join(aggs)} FROM {name}{_where(rng, t)} "
        f"GROUP BY {g}{having} ORDER BY g NULLS FIRST"
    )


_JOINS = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("lineitem", "supplier", "l_suppkey = s_suppkey"),
]


def gen_join(rng: random.Random) -> str:
    lt, rt, cond = rng.choice(_JOINS)
    l, r = TABLES[lt], TABLES[rt]
    jt = rng.choice(["JOIN", "LEFT JOIN"])
    g = rng.choice(r["str"] if jt == "JOIN" else l["str"])
    return (
        f"SELECT {g} AS g, COUNT(*) AS cnt, "
        f"CAST(SUM(CAST({rng.choice(l['num'])} AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s "
        f"FROM {lt} {jt} {rt} ON {cond}{_where(rng, l)} "
        f"GROUP BY {g} ORDER BY g NULLS FIRST"
    )


def gen_window(rng: random.Random) -> str:
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    part = rng.choice(t["str"])
    order_val = rng.choice(t["num"] + t["int"])
    uid = t["int"][0]  # unique-ish tiebreak column (first int col is a key)
    fn = rng.choice([
        "ROW_NUMBER()",
        "RANK()",
        "DENSE_RANK()",
        f"CAST(SUM(CAST({order_val} AS DECIMAL(18,4))) OVER "
        f"(PARTITION BY {part} ORDER BY {order_val}, {uid} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,4))",
        f"LAG({uid}) OVER (PARTITION BY {part} ORDER BY {order_val}, {uid})",
    ])
    over = (
        ""
        if "OVER" in fn
        else f" OVER (PARTITION BY {part} ORDER BY {order_val}, {uid})"
    )
    return (
        f"SELECT {uid} AS k, {part} AS p, {fn}{over} AS w "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY k NULLS FIRST, p NULLS FIRST, w NULLS FIRST LIMIT 500"
    )


_SETOP_SIDES = [
    ("customer", "c_nationkey"),
    ("supplier", "s_nationkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_suppkey"),
]


def gen_setop(rng: random.Random) -> str:
    (lt, lc), (rt, rc) = rng.sample(_SETOP_SIDES, 2)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    lw = _where(rng, TABLES[lt])
    rw = _where(rng, TABLES[rt])
    return (
        f"SELECT {lc} AS x FROM {lt}{lw} {op} "
        f"SELECT {rc} FROM {rt}{rw} ORDER BY x NULLS FIRST"
    )


def gen_qualify(rng: random.Random) -> str:
    """DuckDB-dialect shape: QUALIFY through the rewriter vs DuckDB native.
    Both the select-alias and inline-window predicate forms."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    part = rng.choice(t["str"])
    order_val = rng.choice(t["num"] + t["int"])
    uid = t["int"][0]
    k = rng.randint(1, 4)
    fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    over = f"OVER (PARTITION BY {part} ORDER BY {order_val}, {uid})"
    if rng.random() < 0.5:
        return (
            f"SELECT {uid} AS k, {part} AS p, {fn} {over} AS rn "
            f"FROM {name}{_where(rng, t)} QUALIFY rn <= {k} "
            f"ORDER BY k NULLS FIRST"
        )
    return (
        f"SELECT {uid} AS k, {part} AS p FROM {name}{_where(rng, t)} "
        f"QUALIFY {fn} {over} <= {k} ORDER BY k NULLS FIRST"
    )


def gen_listmap(rng: random.Random) -> str:
    """DuckDB-dialect shape for the list/map construct rewrites: bracket
    literals (incl. subscripted and keyword-context single-element ones),
    1-based subscripts after calls/literals/END, list_* renames, map
    construction + extraction."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    k = rng.randint(1, 3)
    pool = [
        f"[{i1} % 7, {i2} % 5, {k}][{rng.randint(1, 3)}] AS e1",
        f"CASE WHEN {i1} > {k} THEN [{k}] ELSE [0] END[1] AS e2",
        f"len(list_distinct([{i1} % 5, {i2} % 5, {k}])) AS e3",
        f"list_sort([{i1} % 9, {i2} % 7, 3])[{rng.randint(1, 3)}] AS e4",
        f"map_extract(map(['a', 'b'], [{i1} % 10, {i2} % 10]), "
        f"{rng.choice(['chr(97)', chr(39) + 'b' + chr(39)])})[1] AS e5",
        f"len(map_keys(map(['x', 'y'], [{i1}, {i2}]))) AS e6",
        f"list_contains([{i1} % 4, 2], {k}) AS e7",
        f"array_to_string(list_sort(string_split({s1}, 'a')), '|') AS e8",
    ]
    exprs = rng.sample(pool, k=3)
    uid = t["int"][0]
    return (
        f"SELECT {uid} AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY k NULLS FIRST LIMIT 300"
    )


def gen_star_exprs(rng: random.Random) -> str:
    """DuckDB star-expression / series-TVF shapes: COLUMNS('regex') bare
    and wrapped, * REPLACE, generate_series/range — all text that runs
    verbatim in DuckDB while Spark goes through Engine.sql's schema-driven
    expansion."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    kind = rng.randrange(4)
    if kind == 0:
        pat = rng.choice(["key$", "^" + name[0] + "_", "a"])
        return (f"SELECT COLUMNS('{pat}') FROM {name}{_where(rng, t)} "
                f"ORDER BY ALL NULLS FIRST LIMIT 100")
    if kind == 1:
        pat = rng.choice(["key$", "^" + name[0] + "_"])
        fn = rng.choice(["min", "max", "count"])
        return f"SELECT {fn}(COLUMNS('{pat}')) FROM {name}{_where(rng, t)}"
    if kind == 2:
        i1 = rng.choice(t["int"])
        s1 = rng.choice(t["str"])
        return (f"SELECT * REPLACE ({i1} % {rng.randint(2, 9)} AS {i1}, "
                f"upper({s1}) AS {s1}) FROM {name}{_where(rng, t)} "
                f"ORDER BY ALL NULLS FIRST LIMIT 60")
    a = rng.randint(-5, 5)
    b = a + rng.randint(0, 40)
    s = rng.choice([1, 2, 3, 7])
    fn = rng.choice(["generate_series", "range"])
    return (f"SELECT g.{fn} AS n, g.{fn} % 5 AS m "
            f"FROM {fn}({a}, {b}, {s}) AS g ORDER BY n")


def gen_struct_compr(rng: random.Random) -> str:
    """Struct/MAP brace literals + list comprehensions — native DuckDB
    text through Engine.sql's rewrites, verbatim in DuckDB."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    kind = rng.randrange(3)
    uid = t["int"][0]
    if kind == 0:
        return (f"SELECT {uid} AS k, "
                f"{{'a': {i1} % 9, 'b': {{'c': upper({s1})}}}}.b.c AS v "
                f"FROM {name}{_where(rng, t)} ORDER BY k NULLS FIRST LIMIT 200")
    if kind == 1:
        lit = rng.choice(["'x'", "'y'"])
        return (f"SELECT {uid} AS k, "
                f"map_extract(MAP {{{lit}: {i1} % 7, 'z': {i2} % 5}}, {lit})[1] AS v "
                f"FROM {name}{_where(rng, t)} ORDER BY k NULLS FIRST LIMIT 200")
    thr = rng.randint(0, 4)
    return (f"SELECT {uid} AS k, "
            f"len([w FOR w IN string_split({s1}, 'a') IF strlen(w) > {thr}]) AS v "
            f"FROM {name}{_where(rng, t)} ORDER BY k NULLS FIRST LIMIT 200")


def generate(seed: int) -> tuple[str, str]:
    """seed → (sql, dialect): dialect='duckdb' shapes exercise the
    rewriter (the text is native DuckDB, Spark runs it via to_spark_sql)."""
    rng = random.Random(seed)
    if seed >= 180:
        return gen_struct_compr(rng), "duckdb"
    if seed >= 150:
        return gen_star_exprs(rng), "duckdb"
    if seed >= 130:
        return gen_listmap(rng), "duckdb"
    if seed >= 110:
        return gen_qualify(rng), "duckdb"
    if seed >= 90:
        return gen_setop(rng), "spark"
    if seed >= 60:
        return gen_window(rng), "spark"
    shape = [gen_projection, gen_aggregation, gen_join][seed % 3]
    return shape(rng), "spark"


@pytest.mark.parametrize("seed", range(200))
def test_fuzzed_query_matches_oracle(seed, engine, duck):
    sql, dialect = generate(seed)
    got = spark_rows(engine.sql(sql, dialect=dialect))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


# --- DML-script differential fuzz (D5 statement layer) --------------------

def gen_dml_script(rng: random.Random) -> list[str]:
    """A CREATE + 2-5 mutations + final SELECT, in the common DuckDB/Spark
    statement subset — both engines execute the IDENTICAL script text and
    must converge to the same table state."""
    stmts = ["CREATE TABLE fz AS SELECT n_nationkey AS k, "
             "n_regionkey AS r, n_name AS v FROM nation"]
    altered = rng.random() < 0.4
    if altered:
        # schema evolution mid-script: both engines must agree on the
        # evolved shape and the NULL-backfill of pre-ALTER rows
        stmts.append("ALTER TABLE fz ADD COLUMN w BIGINT")
        stmts.append(f"UPDATE fz SET w = k * {rng.randint(2, 5)} "
                     f"WHERE k % {rng.randint(2, 4)} = 0")
    xtra_val = ", NULL" if altered else ""
    xtra_sel = ", n_nationkey * 7" if altered else ""
    for _ in range(rng.randint(2, 5)):
        kind = rng.randrange(5)
        if kind == 0:
            vals = ", ".join(
                f"({rng.randint(100, 999)}, {rng.randint(0, 4)}, "
                f"'{rng.choice('abcde') * 3}'{xtra_val})"
                for _ in range(rng.randint(1, 3)))
            stmts.append(f"INSERT INTO fz VALUES {vals}")
        elif kind == 1:
            stmts.append(f"DELETE FROM fz WHERE k % {rng.randint(2, 7)} = "
                         f"{rng.randint(0, 1)}")
        elif kind == 2:
            stmts.append(f"UPDATE fz SET r = r + {rng.randint(1, 5)} "
                         f"WHERE k % {rng.randint(2, 5)} = 1")
        elif kind == 3:
            stmts.append(
                f"INSERT INTO fz SELECT n_nationkey + {rng.randint(1000, 2000)}, "
                f"n_regionkey, lower(n_name){xtra_sel} FROM nation "
                f"WHERE n_nationkey % {rng.randint(2, 5)} = 0")
        else:
            # r6 statement: TRUNCATE wipes, then repopulate a slice so
            # later mutations still have rows to chew on
            stmts.append("TRUNCATE fz")
            stmts.append(
                f"INSERT INTO fz SELECT n_nationkey, n_regionkey, "
                f"n_name{xtra_sel} FROM nation "
                f"WHERE n_nationkey < {rng.randint(5, 25)}")
    tail = ", w" if altered else ""
    stmts.append(f"SELECT k, r, v{tail} FROM fz ORDER BY k, r, v{tail}")
    return stmts


@pytest.mark.parametrize("seed", range(200, 220))
def test_fuzzed_dml_script_matches_oracle(seed, spark, tmp_path):
    import duckdb as _duck

    from duckdb_read_spark.conf import TABLES as _FT
    from duckdb_read_spark.engine import Engine
    from tests.conftest import SF_SMOKE
    import os as _os

    stmts = gen_dml_script(random.Random(seed))
    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    eng.register_fixture_dir(SF_SMOKE)
    con = _duck.connect()
    for t in _FT:
        p = _os.path.join(SF_SMOKE, f"{t}.parquet")
        if _os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}')")
    for stmt in stmts[:-1]:
        eng.sql(stmt, dialect="duckdb")
        con.execute(stmt)
    got = spark_rows(eng.sql(stmts[-1]))
    want = duckdb_rows(con, stmts[-1])
    assert got == want, f"seed={seed}\nscript={stmts}\n" + \
        diff_summary(got, want)


# --- temporal generate_series/range fuzz (F11 r6 forms) -------------------

def gen_temporal_series(rng: random.Random) -> str:
    """Random DATE/TIMESTAMP bounds + INTERVAL steps through the series
    TVFs — identical text in both engines; exercises inclusive/exclusive
    stops, descending steps, interval spelling variants, and the
    DATE-bounds→TIMESTAMP-rows coercion."""
    import datetime as _dt

    fn = rng.choice(["generate_series", "range"])
    start = _dt.datetime(2024, 1, rng.randint(1, 20), rng.randint(0, 23))
    span_h = rng.randint(1, 24 * 40)
    unit, qty = rng.choice([
        ("day", rng.randint(1, 3)),
        ("hour", rng.randint(1, 36)),
        ("minute", rng.randint(7, 300)),
    ])
    desc = rng.random() < 0.25
    stop = start + _dt.timedelta(hours=-span_h if desc else span_h)
    sqty = -qty if desc else qty
    style = rng.randrange(3)
    if style == 1 and sqty < 0:
        style = 0  # DuckDB rejects a bare negative (INTERVAL -26 HOUR)
    if style == 0:
        step = f"INTERVAL '{sqty} {unit}{'s' if abs(sqty) != 1 else ''}'"
    elif style == 1:
        step = f"INTERVAL {sqty} {unit.upper()}"
    else:
        step = f"INTERVAL '{sqty}' {unit.upper()}"
    use_date = unit == "day" and start.hour == 0 and rng.random() < 0.5
    if use_date:
        a = f"DATE '{start.date().isoformat()}'"
        b = f"DATE '{stop.date().isoformat()}'"
    else:
        a = f"TIMESTAMP '{start.strftime('%Y-%m-%d %H:%M:%S')}'"
        b = f"TIMESTAMP '{stop.strftime('%Y-%m-%d %H:%M:%S')}'"
    src = f"{fn}({a}, {b}, {step}) AS t(ts)"
    if rng.random() < 0.5:
        return (f"SELECT COUNT(*) AS n, MIN(ts) AS mn, MAX(ts) AS mx "
                f"FROM {src}")
    return f"SELECT ts FROM {src} ORDER BY ts LIMIT 500"


@pytest.mark.parametrize("seed", range(220, 240))
def test_fuzzed_temporal_series_matches_oracle(seed, engine, duck):
    sql = gen_temporal_series(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


# --- slice/format/list-fold fuzz (r6 dialect additions) -------------------

def gen_slice_format(rng: random.Random) -> str:
    """Negative/open list slices, fmt-style format(), list_unique /
    list_reduce — native DuckDB text through the rewriter, verbatim in
    DuckDB."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    lst = f"string_split({s1}, '{rng.choice('aeio')}')"
    lo = rng.choice(["", "1", "2", "-2", "-5"])
    hi = rng.choice(["", "-1", "-2", "2", "9"])
    pool = [
        f"({lst})[{lo}:{hi}] AS e1",
        f"list_unique({lst}) AS e2",
        f"list_reduce([{i1} % 9 + 1, {i2} % 7 + 1, {rng.randint(1, 5)}], "
        f"(x, y) -> x + y) AS e3",
        f"list_reduce({lst}, (x, y) -> x || '-' || y) AS e4",
        f"format('{{}}#{{:d}}', coalesce({s1}, ''), "
        f"coalesce({i1}, 0) % 100) AS e5",
        f"format('{{:.2f}}|{{}}', coalesce({i2}, 0) * 1.5, "
        f"{rng.randint(1, 9)}) AS e6",
    ]
    exprs = rng.sample(pool, k=3)
    uid = t["int"][0]
    return (
        f"SELECT {uid} AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY k NULLS FIRST LIMIT 300"
    )


@pytest.mark.parametrize("seed", range(240, 260))
def test_fuzzed_slice_format_matches_oracle(seed, engine, duck):
    sql = gen_slice_format(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


def gen_agg_extras(rng: random.Random) -> str:
    """product / quantile_disc / entropy / ordered-DISTINCT aggs /
    FILTERed ordered aggs / time_bucket — grouped, verbatim DuckDB."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    g = rng.choice(t["int"])
    q_ = rng.choice(["0.25", "0.5", "0.75", "1.0"])
    pool = [
        f"round(product(CASE WHEN {i1} % 13 = 0 THEN 0.5 ELSE 1.0 END), 6)"
        f" AS e1",
        f"quantile_disc({i1}, {q_}) AS e2",
        f"round(entropy({i1} % {rng.randint(2, 6)}), 6) AS e3",
        f"array_agg(DISTINCT {i1} % 7 ORDER BY {i1} % 7) AS e4",
        f"string_agg(DISTINCT substr({s1}, 1, 2), '|' "
        f"ORDER BY substr({s1}, 1, 2) DESC) AS e5",
        f"array_agg({i1} % 11 ORDER BY {i1} % 11) "
        f"FILTER (WHERE {i2} % 3 = 0) AS e6",
        f"max(time_bucket(INTERVAL {rng.choice([2, 5, 7])} HOUR, "
        f"TIMESTAMP '2024-01-06 00:00:00' "
        f"+ ({i1} % 200) * INTERVAL 1 HOUR)) AS e7",
        f"any_value({i1} % 13 ORDER BY {i1} % 13) AS e8",
    ]
    exprs = rng.sample(pool, k=3)
    return (
        f"SELECT {g} % 4 AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"GROUP BY 1 ORDER BY k NULLS FIRST"
    )


def gen_fn_tranche(rng: random.Random) -> str:
    """log/sign/century/to_base/isfinite/date_sub/date_diff-week/
    array_slice/list_select/grade_up/strpos/gcd — verbatim DuckDB."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    n1 = rng.choice(t["num"])
    s1 = rng.choice(t["str"])
    lst = f"string_split({s1}, '{rng.choice('aeo')}')"
    base = rng.choice([2, 8, 16])
    pool = [
        f"round(log({i1} % 90 + 10), 6) AS e1",
        f"sign({i1} % 7 - 3) AS e2",
        f"to_base({i1} % 4000 + 1, {base}) AS e3",
        f"isfinite({n1}) AS e4, isinf({n1}) AS e5",
        f"date_sub('day', DATE '2024-01-01', "
        f"DATE '2024-01-01' + ({i1} % 90) * INTERVAL 1 DAY) AS e6",
        f"date_diff('week', DATE '2024-01-01', "
        f"DATE '2024-01-01' + ({i1} % 60) * INTERVAL 1 DAY) AS e7",
        f"array_slice({lst}, {rng.choice([1, 2, -3])}, "
        f"{rng.choice([-1, -2, 3])}) AS e8",
        f"list_grade_up({lst}) AS e9",
        f"strpos({s1}, '{rng.choice('ae')}') AS e10",
        f"gcd({i1} % 30 + 1, {i2} % 20 + 1) AS e11",
        f"century(DATE '1999-12-31' + ({i1} % 800) * INTERVAL 30 DAY) "
        f"AS e12",
        f"json_extract_string(json_object('k', {i1} % 50, 's', {s1}), "
        f"'$.s') AS e13",
        f"json_valid(json_array({i1} % 9, {i2} % 9)) AS e14",
        # vector trio: coalesce keeps NULLs out of the list elements
        # (DuckDB errors on NULL elements; the Spark composition doesn't)
        f"list_cosine_similarity([coalesce({i1} % 7, 0) + 1.0, "
        f"coalesce({i2} % 5, 0) + 1.0], [3.0, 4.0]) AS e15",
        f"list_inner_product([coalesce({i1} % 9, 0), 2], "
        f"[coalesce({i2} % 9, 0), 5]) AS e16",
        f"list_distance([coalesce({i1} % 11, 0) + 0.5, 1.0], "
        f"[2.0, coalesce({i2} % 6, 0) + 0.5]) AS e17",
        # r6b tranche: power operator, xor, trunc/even, format_bytes,
        # mismatches (padded to a fixed length — DuckDB errors on
        # unequal/empty strings)
        f"({i1} % 5 + 1) ^ 2 AS e18",
        f"xor({i1} % 50, {i2} % 30) AS e19",
        f"trunc({n1} + 0.5) AS e20, even({n1}) AS e21",
        f"format_bytes(CAST({i1} % 100000 AS BIGINT) * 137) AS e22",
        f"mismatches(substr(coalesce({s1}, '') || 'xyzw', 1, 4), "
        f"substr(reverse(coalesce({s1}, '') || 'wzyx'), 1, 4)) AS e23",
        f"bar(coalesce({i1} % 12, 0), 0, 12, 9) AS e24",
        # raw-literal family: backslash regexes, LIKE without escape,
        # literal split separators (regex-special '.')
        f"regexp_extract({s1}, '([A-Z]+)(_\\d+)?') AS e27",
        f"({s1} LIKE '%\\_%') AS e28, string_split({s1}, '.') AS e29",
        f"regexp_replace({s1}, '([A-Z])_', '\\1-', 'g') AS e30",
        f"list_extract([{i1} % 9, 5, 7], "
        f"CASE WHEN {i2} % 2 = 0 THEN -1 ELSE 2 END) AS e25",
        f"list_sum([{n1}, 2.0, NULL]) AS e26",
    ]
    exprs = rng.sample(pool, k=3)
    uid = t["int"][0]
    return (
        f"SELECT {uid} AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY k NULLS FIRST LIMIT 300"
    )


def gen_window_exclude(rng: random.Random) -> str:
    """EXCLUDE CURRENT ROW frames + ordered any_value, verbatim DuckDB;
    partitioned and unpartitioned, with and without NULLs in play."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    fn = rng.choice(["sum", "count", "avg"])
    lo, hi = rng.randint(1, 3), rng.randint(0, 3)
    part = rng.choice(["", f"PARTITION BY {i2} % 5 "])
    arg = rng.choice([f"{i1} % 97",
                      f"CASE WHEN {i1} % 4 = 0 THEN NULL "
                      f"ELSE {i1} % 97 END"])
    # ROWS frames are positional: the window ORDER BY must be a TOTAL
    # order (all int columns = a unique key on every fixture table) or
    # tied rows make the frame engine-nondeterministic (seed 296)
    total = ", ".join(t["int"])
    expr = (f"round({fn}({arg}) OVER ({part}ORDER BY {total} "
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING "
            f"EXCLUDE CURRENT ROW), 6)")
    uid = t["int"][0]
    # the OUTER order must be total too: LIMIT cutting inside an
    # ORDER BY tie group selects engine-dependent rows (seed 296 again)
    return (
        f"SELECT {uid} AS k, {expr} AS e1 "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY {total} LIMIT 300"
    )


def gen_power_moments(rng: random.Random) -> str:
    """Power-operator operand shapes (unary signs, ::-casts, CASE,
    paren groups, precedence vs * and -, left-associativity) and grouped
    sample skewness/kurtosis — verbatim DuckDB text. Bases are
    NULL-guarded and positive wherever a fractional result could go
    complex; every value rounds to 6 d.p. before the compare."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    n1 = rng.choice(t["num"])
    b = f"(coalesce({i1} % 7, 0) + 2)"
    if rng.random() < 0.4:  # grouped moment shape
        g = rng.choice(t["int"])
        # 3 d.p., not 6: DuckDB's one-pass moment accumulation and
        # Spark's distributed merge genuinely differ ~1e-6 on
        # thousand-row groups — a 6 d.p. compare flips on real noise
        return (
            f"SELECT {g} % 4 AS k, "
            f"round(skewness({n1}), 3) AS m1, "
            f"round(kurtosis({n1}), 3) AS m2, "
            f"round(kurtosis_pop({n1}), 3) AS m3, "
            f"round(skewness(coalesce({i2} % 9, 0) ^ 2), 3) AS m4 "
            f"FROM {name}{_where(rng, t)} "
            f"GROUP BY 1 ORDER BY k NULLS FIRST"
        )
    pool = [
        f"round({b} ^ 2, 6) AS p1",
        f"round(2 ^ coalesce({i2} % 5, 0), 6) AS p2",
        f"round({b} ^ -2, 6) AS p3",
        f"round({b} ^ 2 ^ 1, 6) AS p4",
        f"round(CAST({i1} % 5 AS BIGINT)::INTEGER ^ 2, 6) AS p5",
        f"round(CASE WHEN coalesce({i2}, 0) % 2 = 0 THEN 2 ELSE 3 END "
        f"^ 2, 6) AS p6",
        f"round(2 * {b} ^ 2 - 1, 6) AS p7",
        f"round(sqrt(abs(coalesce({n1}, 1)) + 1) ** 2, 6) AS p8",
    ]
    exprs = rng.sample(pool, k=3)
    uid = t["int"][0]
    # total order over EVERY output column: uid alone is not unique in
    # every table, and a LIMIT cutting inside a tie group is
    # engine-nondeterministic (the standing fuzz rule)
    return (
        f"SELECT {uid} AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, "
        f"4 NULLS FIRST LIMIT 300"
    )


@pytest.mark.parametrize("seed", range(300, 316))
def test_fuzzed_power_moments_matches_oracle(seed, engine, duck):
    sql = gen_power_moments(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


@pytest.mark.parametrize("seed", range(292, 300))
def test_fuzzed_window_exclude_matches_oracle(seed, engine, duck):
    sql = gen_window_exclude(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


def gen_divergence_probes(rng: random.Random) -> str:
    """r7 judge-probe families: 3-arg regexp_replace (FIRST match),
    NULL-keeping array_agg, NULL-dropping array_distinct (order-free via
    list_sort), strftime %- no-pad, full-Unicode chr, element_at-on-map,
    IGNORE NULLS in parens, week/EXTRACT-subsecond/timezone. Verbatim
    DuckDB text; NULLs injected via CASE so every family exercises its
    null path; ORDER BY keys are unique ints (total order)."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    uid = t["int"][0]
    ch = rng.choice("aeinor")
    pool = [
        f"regexp_replace({s1}, '{ch}', '<&>') AS e1",
        f"regexp_replace({s1}, '([a-z])([a-z])', '\\2\\1') AS e2",
        f"regexp_replace({s1}, '{ch}+', 'X', 'i') AS e3",
        f"list_sort(array_distinct([{i1} % 5, {i2} % 5, NULL, "
        f"{i1} % 3])) AS e4",
        f"strftime(DATE '2024-01-01' + ({i1} % 400) * INTERVAL 1 DAY, "
        f"'%-d/%-m/%Y') AS e5",
        # DuckDB chr binds INTEGER only — BIGINT key columns need a cast
        f"chr(CAST(65 + {i1} % 26 AS INTEGER)) "
        f"|| chr(CAST(945 + {i2} % 24 AS INTEGER)) "
        f"|| chr(CAST(8352 + {i1} % 30 AS INTEGER)) AS e6",
        f"element_at(MAP([0, 1, 2], [{i1} % 9, {i2} % 9, 7]), "
        f"coalesce({i2}, 0) % 4) AS e7",
        f"week(DATE '2023-12-25' + ({i1} % 30) * INTERVAL 1 DAY) AS e8",
        f"EXTRACT(microseconds FROM TIMESTAMP '2024-01-06 00:00:10.123456' "
        f"+ ({i1} % 500) * INTERVAL 61 SECOND) AS e9",
        f"strftime(timezone('America/New_York', "
        f"TIMESTAMP '2024-01-06 00:00:00' + ({i1} % 300) "
        f"* INTERVAL 7 HOUR), '%Y-%m-%d %H:%M') AS e10",
    ]
    exprs = rng.sample(pool, k=3)
    total = ", ".join(t["int"])  # unique key: LIMIT never cuts a tie
    return (
        f"SELECT {uid} AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY {total} LIMIT 300"
    )


def gen_null_agg_probes(rng: random.Random) -> str:
    """Grouped NULL-keeping array_agg forms + IGNORE NULLS windows —
    separate family because these need a GROUP BY / OVER shape."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    g = rng.choice(t["int"])
    uid = t["int"][0]
    nullable = (f"CASE WHEN {i1} % {rng.randint(2, 4)} = 0 "
                f"THEN NULL ELSE {i2} % 13 END")
    if rng.random() < 0.5:
        d = rng.choice(["", " DESC"])
        agg = rng.choice([
            f"array_agg({nullable} ORDER BY {nullable}{d})",
            f"array_agg(DISTINCT {nullable} ORDER BY {nullable}{d})",
            f"array_agg({nullable} ORDER BY {nullable}{d}) "
            f"FILTER (WHERE {i2} % 2 = 0)",
        ])
        return (f"SELECT {g} % 3 AS k, {agg} AS v "
                f"FROM {name}{_where(rng, t)} "
                f"GROUP BY 1 ORDER BY k NULLS FIRST")
    fn = rng.choice(["first_value", "last_value", "lag", "lead"])
    frame = ("" if fn in ("lag", "lead")  # lag/lead reject frames
             else " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    total = ", ".join(t["int"])  # unique key: total window/LIMIT order
    return (f"SELECT {uid} AS k, {fn}({nullable} IGNORE NULLS) "
            f"OVER (ORDER BY {total}{frame}) AS v "
            f"FROM {name}{_where(rng, t)} "
            f"ORDER BY {total} LIMIT 300")


def gen_probe_batch_fns(rng: random.Random) -> str:
    """r7 probe-batch families 2-4: JSON arrow chains, series
    expressions, date subtraction, list_resize/list_sort options,
    new scalar mappings — verbatim DuckDB over fixture columns."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    uid = t["int"][0]
    k = rng.choice(["a", "b"])
    pool = [
        f"concat('{{\"a\":', {i1} % 40, ', \"b\": {{\"c\": 7}}}}') "
        f"->> '{k}' AS e1",
        f"('[' || ({i1} % 9) || ', 5]') ->> {rng.randint(0, 1)} AS e2",
        f"generate_series({i1} % 4, {i2} % 6) AS e3",
        f"range({i1} % 5, {i2} % 7) AS e4",
        f"DATE '2024-03-01' + ({i1} % 50) * INTERVAL 1 DAY "
        f"- DATE '2024-02-01' AS e5",
        f"list_resize(string_split({s1}, 'a'), {rng.randint(1, 4)}) "
        f"AS e6",
        f"list_sort(string_split({s1}, '{rng.choice('aeo')}'), "
        f"'DESC') AS e7",
        f"sha256(substr({s1}, 1, 3)) AS e8",
        f"add({i1} % 9, {i2} % 4) AS e9",
        f"multiply({i1} % 5, 3) AS e10, subtract({i1} % 9, 2) AS e11",
        f"date_trunc('decade', DATE '1998-07-04' + ({i1} % 900) "
        f"* INTERVAL 20 DAY) AS e12",
        f"regexp_full_match({s1}, '[A-Za-z#_ ]+[0-9]*') AS e13",
        f"list_aggregate(string_split({s1}, '_'), 'string_agg', '|') "
        f"AS e14",
        f"array_cat(string_split({s1}, 'a'), ['z']) AS e15",
        f"1_000 + {i1} % 7 AS e16",
        f"CAST(('[' || ({i1} % 9) || ']') AS INTEGER[]) AS e17",
    ]
    exprs = rng.sample(pool, k=3)
    total = ", ".join(t["int"])
    return (
        f"SELECT {uid} AS k, {', '.join(exprs)} "
        f"FROM {name}{_where(rng, t)} "
        f"ORDER BY {total} LIMIT 300"
    )


@pytest.mark.parametrize("seed", range(328, 344))
def test_fuzzed_probe_batch_fns_match_oracle(seed, engine, duck):
    sql = gen_probe_batch_fns(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


@pytest.mark.parametrize("seed", range(300, 316))
def test_fuzzed_divergence_probes_match_oracle(seed, engine, duck):
    sql = gen_divergence_probes(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


@pytest.mark.parametrize("seed", range(316, 328))
def test_fuzzed_null_agg_probes_match_oracle(seed, engine, duck):
    sql = gen_null_agg_probes(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


@pytest.mark.parametrize("seed", range(276, 292))
def test_fuzzed_fn_tranche_matches_oracle(seed, engine, duck):
    sql = gen_fn_tranche(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


@pytest.mark.parametrize("seed", range(260, 276))
def test_fuzzed_agg_extras_matches_oracle(seed, engine, duck):
    sql = gen_agg_extras(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


# --- upsert-script differential fuzz (INSERT OR REPLACE / ON CONFLICT) ----

def gen_upsert_script(rng: random.Random) -> list[str]:
    """A PRIMARY KEY table + a cycle of OR-REPLACE / ON-CONFLICT upserts
    and deletes — identical text in both engines, converging states."""
    stmts = ["CREATE TABLE uz (k BIGINT PRIMARY KEY, v BIGINT, s VARCHAR)"]
    stmts.append("INSERT INTO uz VALUES " + ", ".join(
        f"({k}, {k * 10}, '{rng.choice('xyz')}')"
        for k in range(1, rng.randint(4, 8))))
    for _ in range(rng.randint(2, 5)):
        kind = rng.randrange(3)
        ks = rng.sample(range(1, 12), rng.randint(1, 3))
        vals = ", ".join(
            f"({k}, {rng.randint(0, 99)}, '{rng.choice('abc')}')"
            for k in ks)
        if kind == 0:
            stmts.append(f"INSERT OR REPLACE INTO uz VALUES {vals}")
        elif kind == 1:
            stmts.append(
                f"INSERT INTO uz VALUES {vals} "
                f"ON CONFLICT (k) DO UPDATE SET v = excluded.v")
        else:
            stmts.append(f"DELETE FROM uz WHERE k % {rng.randint(2, 5)} "
                         f"= {rng.randint(0, 1)}")
    stmts.append("SELECT k, v, s FROM uz ORDER BY k")
    return stmts


@pytest.mark.parametrize("seed", range(500, 512))
def test_fuzzed_upsert_script_matches_oracle(seed, spark, tmp_path):
    import duckdb as _duck

    from duckdb_read_spark.engine import Engine

    stmts = gen_upsert_script(random.Random(seed))
    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    con = _duck.connect()
    for stmt in stmts[:-1]:
        eng.sql(stmt, dialect="duckdb")
        con.execute(stmt)
    got = spark_rows(eng.sql(stmts[-1]))
    want = duckdb_rows(con, stmts[-1])
    assert got == want, f"seed={seed}\nscript={stmts}\n" + \
        diff_summary(got, want)


def gen_r8_tranche(rng: random.Random) -> str:
    """r8 shapes: 1-based indexed lambdas, step slices, quantified
    comparisons, tilde matches, interval epoch, trailing commas, TIME
    folds, mad/bitstring_agg over fixture ints — verbatim DuckDB."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    uid = t["int"][0]
    a = rng.randint(1, 3)
    b = rng.randint(3, 6)
    st = rng.choice([2, 3, -1, -2])
    op = rng.choice(["=", "<>", "<", ">", "<=", ">="])
    q = rng.choice(["ANY", "ALL", "SOME"])
    if q == "ALL" and op == "=":
        op = ">"
    unit = rng.choice(["MINUTE", "HOUR", "SECOND"])
    pool = [
        f"list_transform([{i1} % 7, {i2} % 5, 3], (x, i) -> x * i) "
        f"AS e1",
        f"list_filter([{i1} % 9, 4, {i2} % 6, 1], (v, i) -> i % 2 = "
        f"{rng.randint(0, 1)}) AS e2",
        f"list_reduce([{i1} % 5 + 1, {i2} % 4 + 1, 2], "
        f"(acc, v, i) -> acc + v * i) AS e3",
        f"([{i1} % 8, {i2} % 6, 5, 2, 7])"
        f"[{a}:{b}:{st}] AS e4",
        f"({i1} % 10) {op} {q} (SELECT {i2} % 10 FROM {name} "
        f"WHERE {uid} % 5 = {rng.randint(0, 4)}) AS e5",
        f"{s1} ~ '[A-Za-z ]*{rng.choice('aeo')}[A-Za-z ]*' AS e6",
        f"{s1} ~~ '%{rng.choice('aeo')}%' AS e7",
        f"epoch(INTERVAL '{rng.randint(1, 30)} days "
        f"{rng.randint(0, 59)} minutes') AS e8",
        f"extract(epoch FROM TIME '0{rng.randint(1, 9)}:"
        f"{rng.randint(10, 59)}:{rng.randint(10, 59)}') AS e9",
        f"TIME '{rng.randint(10, 23)}:00:00' + INTERVAL "
        f"{rng.randint(1, 90)} {unit} AS e10",
        f"mad({i1} % 13) AS e11",
        f"bitstring_agg({i1} % 8, 0, 7) AS e12",
        f"quantile({i1} % 11, 0.{rng.randint(1, 9)}) AS e13",
        f"sum({i1} ORDER BY {i2}) AS e14",
    ]
    rng.shuffle(pool)
    picks = pool[:rng.randint(3, 5)]
    aggish = [p for p in picks if p.split(" AS ")[0].startswith(
        ("mad(", "bitstring_agg(", "quantile(", "sum("))]
    if aggish:
        picks = aggish  # aggregates can't mix with per-row exprs here
        return (f"SELECT {', '.join(picks)}, FROM {name} "
                f"WHERE {uid} < 500")
    return (f"SELECT {uid} AS k, {', '.join(picks)} FROM {name} "
            f"WHERE {uid} < 40 ORDER BY k, 2")


@pytest.mark.parametrize("seed", range(344, 360))
def test_fuzzed_r8_tranche_matches_oracle(seed, engine, duck):
    sql = gen_r8_tranche(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


def gen_r9_tranche(rng: random.Random) -> str:
    """r9 shapes: double-quoted identifiers, // floor division,
    null-safe / and %, decimal downscale casts, json introspection,
    dollar strings, @/! operators, COLLATE, parse_* paths —
    verbatim DuckDB."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    i1, i2 = rng.choice(t["int"]), rng.choice(t["int"])
    s1 = rng.choice(t["str"])
    uid = t["int"][0]
    n1 = rng.randint(2, 9)
    n2 = rng.randint(1, 5)
    sc = rng.randint(0, 2)
    pool = [
        f'"{i1}" // {n1} AS e1',
        f"{i1} // ({i2} % {n1}) AS e2",
        f"{i1} % ({i2} % {n2}) AS e3",
        f"{i1} / nullif({i2} % {n2}, -1) AS e4",
        f"CAST(CAST({i1} * 1.377 AS DECIMAL(18,6)) "
        f"AS DECIMAL(18,{sc})) AS e5",
        f"json_extract('{{\"a\": {{\"b\": ' || ({i1} % 50) || "
        f"', \"c\": 2.50}}}}', '$.a.b') AS e6",
        f"json_type('[1, \"x\", null, 2.5]', '$[{rng.randint(0, 3)}]')"
        f" AS e7",
        f"json_extract_string('{{\"k\": ' || ({i2} % 9) || '}}', 'k') "
        f"AS e8",
        f"{s1} ~ $$[A-Za-z ,.]*$$ AS e9",
        f"@ ({i1} % 19 - 9) AS e10",
        f"CAST(CAST({i1} % 7 AS INTEGER)! AS VARCHAR) AS e11",
        f"{s1} COLLATE NOCASE = upper({s1}) AS e12",
        f"parse_filename('/d/' || {i1} || '.x', true) AS e13",
        f"parse_dirpath('a/' || ({i2} % 5) || '/f') AS e14",
        f"divide({i1}, {n1}) AS e15",
        f"date_sub('month', DATE '2023-01-31', DATE '2023-01-31' "
        f"+ to_days(CAST({i1} % 90 AS INTEGER))) AS e16",
    ]
    rng.shuffle(pool)
    picks = pool[:rng.randint(3, 5)]
    return (f"SELECT {uid} AS k, {', '.join(picks)} FROM {name} "
            f"WHERE {uid} < 40 ORDER BY k, 2")


@pytest.mark.parametrize("seed", range(360, 376))
def test_fuzzed_r9_tranche_matches_oracle(seed, engine, duck):
    sql = gen_r9_tranche(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)


def gen_r10_nulls_in_sort(rng: random.Random) -> str:
    """r10 shapes: NULL-bearing sort keys under BARE (and explicit
    ASC/DESC) ORDER BY — the NULLS LAST injection must reproduce
    DuckDB's default_null_order everywhere a user sort key lands
    (statement sorts, window ORDER BY, ordered aggregates) — plus
    empty/FILTERed ordered aggregates (NULL, not []/'') and decimal
    division (DOUBLE, not DECIMAL). Unlike the §2.0-conventional
    families, the tail ORDER BY is deliberately BARE: a unique
    trailing key keeps the order total in both engines."""
    name = rng.choice(list(TABLES))
    t = TABLES[name]
    uid = t["int"][0]
    i = rng.choice(t["int"])
    n = rng.choice(t["num"])
    s = rng.choice(t["str"])
    m1 = rng.randint(2, 5)
    m2 = rng.randint(2, 7)
    k1 = f"nullif({i} % {m1}, {rng.randint(0, m1 - 1)})"
    d = rng.choice(["", " DESC", " ASC"])
    shape = rng.randrange(4)
    if shape == 0:
        return (f"SELECT {uid} AS k, {k1} AS a, {s} AS b FROM {name} "
                f"WHERE {uid} < 60 ORDER BY a{d}, b, k")
    if shape == 1:
        return (f"SELECT {uid} AS k, row_number() OVER "
                f"(ORDER BY {k1}{d}, {uid}) AS rn, "
                f"sum({i}) OVER (ORDER BY {k1}{d}, {uid} "
                f"ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rs "
                f"FROM {name} WHERE {uid} < 40 ORDER BY k")
    if shape == 2:
        return (f"SELECT nullif({i} % {m2}, 1) AS g, "
                f"array_agg({s} ORDER BY {uid}{d}) "
                f"FILTER (WHERE {uid} % 3 = 0) AS aa, "
                f"string_agg({s}, '|' ORDER BY {uid} DESC) AS sa "
                f"FROM {name} WHERE {uid} < 60 GROUP BY g "
                f"ORDER BY g, sa")
    return (f"SELECT {uid} AS k, "
            f"CAST(CAST({i} AS DECIMAL(18,3)) / {m1} AS VARCHAR) AS dv,"
            f" CAST({n} AS VARCHAR) AS nv FROM {name} "
            f"WHERE {uid} < 50 ORDER BY k")


@pytest.mark.parametrize("seed", range(376, 396))
def test_fuzzed_r10_nulls_in_sort_matches_oracle(seed, engine, duck):
    sql = gen_r10_nulls_in_sort(random.Random(seed))
    got = spark_rows(engine.sql(sql, dialect="duckdb"))
    want = duckdb_rows(duck, sql)
    assert got == want, f"seed={seed}\nsql={sql}\n" + diff_summary(got, want)
