"""The declared query inventory — SURVEY.md §2.2, all 50 oracle queries.

Each spec carries the Spark SQL text and (when the dialects diverge, SURVEY
§2.4) the DuckDB text. These exact pairs were executed in both engines and
hash-matched at sf0.001 and sf0.01; treat edits as contract changes.

DuckDB-side events shim: the driver registers *raw* views over the parquet
files, and ``events.ts`` is TIMESTAMP_NS there. Every DuckDB query that
touches ``events.ts`` therefore goes through a CTE that truncates to µs
(``CAST(ts AS TIMESTAMP)``), matching the Spark-side view shim in
catalog.py (``timestamp_micros(ts DIV 1000)``). See SURVEY §1.3/§2.4.4.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: str
    duckdb: str | None = None  # None → the Spark text runs verbatim in DuckDB
    needs_events_shim: bool = False  # prepend µs-truncation CTE on DuckDB side
    note: str = ""

    @property
    def duckdb_sql(self) -> str:
        sql = self.duckdb if self.duckdb is not None else self.spark
        if self.needs_events_shim:
            sql = _with_events_shim(sql)
        return sql


# ``main.events`` (not bare ``events``): DuckDB treats a CTE named like the
# table it selects from as a circular reference unless schema-qualified.
_EVENTS_SHIM_CTE = (
    "events AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM main.events)"
)


def _with_events_shim(sql: str) -> str:
    """Prepend the DuckDB µs-truncation CTE, merging with an existing WITH."""
    stripped = sql.lstrip()
    if stripped.upper().startswith("WITH "):
        head, rest = stripped.split(" ", 1)
        return f"WITH {_EVENTS_SHIM_CTE}, {rest}"
    return f"WITH {_EVENTS_SHIM_CTE} {stripped}"


QUERIES: dict[str, QuerySpec] = {}


def _q(name: str, spark: str, duckdb: str | None = None,
       needs_events_shim: bool = False, note: str = "") -> None:
    QUERIES[name] = QuerySpec(name, spark, duckdb, needs_events_shim, note)


# --- Scans / projection / filter -----------------------------------------

_q("q01_scan_count", "SELECT COUNT(*) AS n FROM lineitem")

_q("q02_projection_expr", """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_quantity * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS eff_qty
FROM lineitem WHERE l_orderkey < 20 ORDER BY l_orderkey, l_linenumber
""", note="decimal math internal, DOUBLE out (driver stringify contract)")

_q("q03_filter_compound", """
SELECT o_orderkey FROM orders
WHERE (o_orderstatus = 'F' OR o_totalprice > 100000)
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND o_orderdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
ORDER BY o_orderkey
""")

_q("q04_filter_like_null", """
SELECT p_partkey, p_name FROM part
WHERE p_name LIKE '%ste%' AND p_brand IS NOT NULL ORDER BY p_partkey
""")

# --- Aggregation ----------------------------------------------------------

_q("q05_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc,
       COUNT(*) AS cnt
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""", note="TPC-H Q1 shape; flagship (SURVEY §7 P1)")

_q("q06_count_distinct", """
SELECT COUNT(DISTINCT l_suppkey) AS ns, COUNT(DISTINCT l_partkey) AS np FROM lineitem
""")

_q("q07_agg_filter_clause", """
SELECT o_orderstatus, COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_totalprice > 50000) AS big
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""")

_q("q08_rollup", """
SELECT n_regionkey, n_nationkey, COUNT(*) AS n FROM nation
GROUP BY ROLLUP(n_regionkey, n_nationkey)
ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST
""")

_q("q09_cube", """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""")

_q("q10_grouping_sets", """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
""")

_q("q11_maxby_median_stats", """
SELECT c_nationkey, max_by(c_name, c_acctbal) AS richest,
       CAST(CAST(median(c_acctbal) AS DECIMAL(18,4)) AS DOUBLE) AS med,
       CAST(CAST(stddev_samp(c_acctbal) AS DECIMAL(18,4)) AS DOUBLE) AS sd
FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 2 ORDER BY c_nationkey
""")

_q("q12_corr", """
SELECT CAST(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(10,6)) AS DOUBLE) AS c FROM lineitem
""")

# --- Joins ----------------------------------------------------------------

_q("q13_inner_equi_join", """
SELECT n_name, COUNT(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""")

_q("q14_multiway_star", """
SELECT r_name, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, o_orderpriority ORDER BY r_name, o_orderpriority
""")

_q("q15_left_outer", """
SELECT c_custkey, COALESCE(o.cnt, 0) AS cnt FROM customer LEFT JOIN
  (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
  ON c_custkey = o.o_custkey
ORDER BY c_custkey
""")

_q("q16_full_outer", """
SELECT COALESCE(a.k, b.k) AS k, a.n AS an, b.n AS bn FROM
  (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY c_nationkey) a
  FULL OUTER JOIN
  (SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY s_nationkey) b
  ON a.k = b.k
ORDER BY k, an NULLS FIRST, bn NULLS FIRST
""")

_q("q17_semi_exists", """
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
ORDER BY c_custkey
""")

_q("q18_anti_notexists", """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""")

_q("q19_theta_range_join", """
SELECT s_suppkey, COUNT(*) AS n FROM supplier
JOIN customer ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
GROUP BY s_suppkey ORDER BY s_suppkey
""")

_q("q20_cross_join", """
SELECT r1.r_name AS name1, r2.r_name AS name2 FROM region r1 CROSS JOIN region r2
WHERE r1.r_regionkey < r2.r_regionkey ORDER BY r1.r_name, r2.r_name
""")

_q("q21_scalar_subquery", """
SELECT o_orderkey FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM orders) ORDER BY o_orderkey
""")

_q("q22_in_subquery", """
SELECT p_partkey FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
ORDER BY p_partkey
""")

# --- Window functions -----------------------------------------------------

_q("q23_ranking", """
SELECT c_custkey, c_nationkey,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
       RANK() OVER (ORDER BY c_acctbal DESC) AS rk,
       DENSE_RANK() OVER (ORDER BY c_mktsegment) AS drk,
       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS nt
FROM customer ORDER BY c_custkey
""")

_q("q24_laglead", """
SELECT event_id,
       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_t,
       FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_id
FROM events ORDER BY event_id LIMIT 200
""", duckdb="""
SELECT event_id, LAG(event_type) OVER w AS prev_t, LEAD(event_type) OVER w AS next_t,
       FIRST_VALUE(event_id) OVER w AS first_id
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id LIMIT 200
""", needs_events_shim=True, note="DuckDB named WINDOW clause vs inline spec")

_q("q25_frame_running", """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
FROM orders ORDER BY o_custkey, o_orderkey LIMIT 300
""")

_q("q26_frame_sliding_avg", """
SELECT event_id,
       CAST(CAST(AVG(CAST(value AS DECIMAL(18,4))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS mavg
FROM events ORDER BY event_id LIMIT 300
""", needs_events_shim=True)

_q("q27_percent_cume", """
SELECT c_custkey,
       CAST(CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DECIMAL(10,6)) AS DOUBLE) AS pr,
       CAST(CAST(CUME_DIST()   OVER (ORDER BY c_acctbal, c_custkey) AS DECIMAL(10,6)) AS DOUBLE) AS cd
FROM customer ORDER BY c_custkey
""")

# --- Sort / limit / top-k -------------------------------------------------

_q("q28_sort_nulls_limit_offset", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey LIMIT 20 OFFSET 5
""")

_q("q29_topk_per_group", """
SELECT * FROM (
  SELECT c_nationkey, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn <= 3 ORDER BY c_nationkey, rn
""")

# --- Set operations -------------------------------------------------------

_q("q30_union_all_distinct", """
SELECT x FROM (SELECT c_nationkey AS x FROM customer
               UNION ALL SELECT s_nationkey FROM supplier) t
GROUP BY x ORDER BY x
""")

_q("q31_intersect", """
SELECT c_nationkey AS x FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY x
""")

_q("q32_except", """
SELECT c_nationkey AS x FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY x
""")

# --- Scalar functions -----------------------------------------------------

_q("q33_string_funcs", """
SELECT p_partkey, UPPER(p_brand) AS ub, LOWER(p_type) AS lt, SUBSTR(p_name,1,5) AS s5,
       LENGTH(p_name) AS ln, REPLACE(p_brand,'#','-') AS rep,
       TRIM(CONCAT('  ', p_name, ' ')) AS tr,
       LPAD(CAST(p_size AS STRING), 4, '0') AS pad,
       regexp_extract(p_type, '([a-z]+)$', 1) AS rex,
       regexp_replace(p_name, '[aeiou]', '_') AS rrep,
       POSITION('a' IN p_name) AS pos, levenshtein(p_brand, 'Brand#10') AS lev
FROM part WHERE p_partkey < 30 ORDER BY p_partkey
""", duckdb="""
SELECT p_partkey, UPPER(p_brand) AS ub, LOWER(p_type) AS lt, SUBSTR(p_name,1,5) AS s5,
       LENGTH(p_name) AS ln, REPLACE(p_brand,'#','-') AS rep,
       TRIM(CONCAT('  ', p_name, ' ')) AS tr,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS pad,
       regexp_extract(p_type, '([a-z]+)$', 1) AS rex,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS rrep,
       POSITION('a' IN p_name) AS pos, levenshtein(p_brand, 'Brand#10') AS lev
FROM part WHERE p_partkey < 30 ORDER BY p_partkey
""", note="DuckDB regexp_replace needs 'g' for replace-all (SURVEY §2.4.1)")

_q("q34_string_split",
   "SELECT doc_id, size(split(text,' ')) AS n_tokens FROM documents WHERE doc_id<50 ORDER BY doc_id",
   duckdb="SELECT doc_id, len(string_split(text,' ')) AS n_tokens FROM documents WHERE doc_id<50 ORDER BY doc_id")

_q("q35_date_funcs", """
SELECT event_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
       CAST(date_trunc('day', ts) AS DATE) AS d,
       year(ts) AS y, month(ts) AS m, dayofmonth(CAST(ts AS DATE)) AS dom, hour(ts) AS hr
FROM events WHERE event_id < 50 ORDER BY event_id
""", needs_events_shim=True)

_q("q36_date_arith", """
SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due,
       CAST(datediff(DATE '1998-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_left
FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey
""", duckdb="""
SELECT o_orderkey, CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_left
FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey
""", note="datediff arg order is REVERSED between engines (SURVEY §2.4.9)")

_q("q37_strftime",
   "SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM') AS ym FROM orders WHERE o_orderkey<30 ORDER BY o_orderkey",
   duckdb="SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym FROM orders WHERE o_orderkey<30 ORDER BY o_orderkey")

_q("q38_math", """
SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) AS a,
       CAST(CEIL(l_quantity) AS BIGINT) AS c, CAST(FLOOR(l_quantity) AS BIGINT) AS f,
       ROUND(l_extendedprice, 1) AS r, CAST(CAST(SQRT(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS sq,
       CAST(CAST(POWER(l_tax + 1, 2) AS DECIMAL(18,6)) AS DOUBLE) AS pw, MOD(l_orderkey, 7) AS md,
       GREATEST(l_tax, l_discount) AS g, LEAST(l_tax, l_discount) AS l,
       CAST(SIGN(l_discount - 0.04) AS INTEGER) AS sg
FROM lineitem WHERE l_orderkey < 15 ORDER BY l_orderkey, l_linenumber
""")

_q("q39_case_coalesce", """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 150000 THEN 'big'
            WHEN o_totalprice > 50000  THEN 'mid' ELSE 'small' END AS bucket,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
       IF(o_totalprice > 100000, 1, 0) AS flag
FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey
""")

# --- Array / map / JSON ---------------------------------------------------

_q("q40_array_ops", """
SELECT vec_id, size(embedding) AS dim, CAST(CAST(embedding[0] AS DECIMAL(12,6)) AS DOUBLE) AS e0,
       CAST(CAST(aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS DECIMAL(18,6)) AS DOUBLE) AS s
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
""", duckdb="""
SELECT vec_id, len(embedding) AS dim, CAST(CAST(embedding[1] AS DECIMAL(12,6)) AS DOUBLE) AS e0,
       CAST(CAST(list_aggregate(embedding, 'sum') AS DECIMAL(18,6)) AS DOUBLE) AS s
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
""", note="0-based vs 1-based indexing (SURVEY §2.4.8)")

_q("q41_unnest_explode", """
SELECT doc_id, tok, COUNT(*) AS n FROM
  (SELECT doc_id, explode(split(text,' ')) AS tok FROM documents WHERE doc_id<10) t
GROUP BY doc_id, tok ORDER BY doc_id, tok
""", duckdb="""
SELECT doc_id, tok, COUNT(*) AS n FROM
  (SELECT doc_id, UNNEST(string_split(text,' ')) AS tok FROM documents WHERE doc_id<10) t
GROUP BY doc_id, tok ORDER BY doc_id, tok
""")

# The driver's pandas canonicalizer cannot sort raw array cells (round-1
# q42 err), so the declared output is the '|'-joined string; the true
# array-valued op keeps a lenient pytest oracle (ARRAY_Q42 below).
_q("q42_array_agg_sorted",
   "SELECT n_regionkey, array_join(sort_array(collect_list(n_name)), '|') AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
   duckdb="SELECT n_regionkey, array_to_string(array_agg(n_name ORDER BY n_name), '|') AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
   note="A12 array_agg ordered; '|' join distinguishes from q44's ',' string_agg")

# True array output (A12) — compared by the value-normalized pytest oracle
# only (tests/oracle/test_array_outputs.py); never sent through the driver.
ARRAY_Q42 = QuerySpec(
    "array_q42",
    "SELECT n_regionkey, sort_array(collect_list(n_name)) AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    duckdb="SELECT n_regionkey, array_agg(n_name ORDER BY n_name) AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
)

_q("q43_json_extract",
   "SELECT event_id, CAST(get_json_object(props,'$.k') AS INT) AS k FROM events WHERE event_id<50 ORDER BY event_id",
   duckdb="SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events WHERE event_id<50 ORDER BY event_id")

_q("q44_string_agg",
   "SELECT n_regionkey, array_join(sort_array(collect_list(n_name)), ',') AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
   duckdb="SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")

# --- Streaming-shaped (batch-equivalent oracles) --------------------------

_q("q45_tumbling_window", """
SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
FROM events GROUP BY 1, 2 ORDER BY w, event_type
""", needs_events_shim=True)

_q("q46_sessionize", """
WITH g AS (SELECT user_id, ts, event_id,
             CASE WHEN CAST(ts AS DOUBLE) - CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
                       > 1800 THEN 1 ELSE 0 END AS brk FROM events),
     s AS (SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess FROM g)
SELECT user_id, sess, COUNT(*) AS n, MIN(ts) AS t0, MAX(ts) AS t1
FROM s GROUP BY user_id, sess ORDER BY user_id, sess
""", duckdb="""
WITH g AS (SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events),
     s AS (SELECT user_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM g)
SELECT user_id, sess, COUNT(*) AS n, MIN(ts) AS t0, MAX(ts) AS t1
FROM s GROUP BY user_id, sess ORDER BY user_id, sess
""", needs_events_shim=True,
    note="Spark ts-ts yields DayTimeInterval; epoch-seconds form is portable "
         "(SURVEY §2.4.7). DuckDB SUM(int) is HUGEINT (fetchdf float64, "
         "'3.0' != Spark '3') — sess CAST to BIGINT on the DuckDB side.")

# --- LLM-pipeline ---------------------------------------------------------

_q("q47_exact_dedup",
   "SELECT COUNT(*) AS total, COUNT(DISTINCT md5(text)) AS uniq FROM documents")

_q("q48_cosine_topk", """
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       CAST(CAST(aggregate(zip_with(e.embedding, probe.p, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
                      CAST(0 AS DOUBLE), (a,v) -> a+v)
            / (sqrt(aggregate(e.embedding, CAST(0 AS DOUBLE), (a,x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))
             * sqrt(aggregate(probe.p,     CAST(0 AS DOUBLE), (a,x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
            AS DECIMAL(12,6)) AS DOUBLE) AS sim
FROM embeddings e CROSS JOIN probe WHERE e.vec_id <> 0 ORDER BY sim DESC, e.vec_id LIMIT 5
""", duckdb="""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       CAST(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(probe.p AS DOUBLE[]))
            AS DECIMAL(12,6)) AS DOUBLE) AS sim
FROM embeddings e, probe WHERE e.vec_id <> 0 ORDER BY sim DESC, e.vec_id LIMIT 5
""", note="float32 math diverges in 6th decimal — DOUBLE-cast first, "
          "6-d.p. decimal snap, DOUBLE out (SURVEY §2.4.5 + §2.0 adds)")

_q("q49_text_stats", """
SELECT lang, COUNT(*) AS docs,
       CAST(CAST(AVG(CAST(n_chars AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS avg_chars,
       MIN(n_chars) AS mn, MAX(n_chars) AS mx
FROM documents GROUP BY lang ORDER BY lang
""")

_q("q50_asof_join", """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     s AS (SELECT * FROM events WHERE event_type = 'signup')
SELECT p.event_id, max_by(s.event_id, s.ts) AS signup_event
FROM p LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
GROUP BY p.event_id ORDER BY p.event_id
""", duckdb="""
SELECT p.event_id, s.event_id AS signup_event FROM
  (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id
""", needs_events_shim=True,
    note="DuckDB native ASOF vs join+max_by emulation (SURVEY §4.3.2)")

_q("q90_range_interval_frame", """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
       AS DOUBLE) AS rolling
FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey
""", note="time-based RANGE frame (30-day rolling sum) — peers share the "
          "frame, so the value is order-independent; identical text runs "
          "on both engines")

_q("q94_recursive_chain", """
WITH RECURSIVE
nxt AS (
  SELECT o1.o_orderkey AS k, o1.o_custkey AS cust, MIN(o2.o_orderkey) AS nk
  FROM orders o1 JOIN orders o2
    ON o1.o_custkey = o2.o_custkey AND o2.o_orderkey > o1.o_orderkey
  WHERE o1.o_custkey < 200 AND o2.o_custkey < 200
  GROUP BY o1.o_orderkey, o1.o_custkey),
firsts AS (
  SELECT o_custkey AS cust, MIN(o_orderkey) AS k
  FROM orders WHERE o_custkey < 200 GROUP BY o_custkey),
chain AS (
  SELECT cust, k, 1 AS pos FROM firsts
  UNION ALL
  SELECT c.cust, n.nk AS k, c.pos + 1 AS pos
  FROM chain c JOIN nxt n ON c.k = n.k AND c.cust = n.cust)
SELECT cust, k AS o_orderkey, pos FROM chain ORDER BY cust, pos
""", note="WITH RECURSIVE (Spark 4 native): per-customer order-chain walk "
          "over a successor relation — acyclic UNION ALL recursion, depth "
          "= max orders/customer (~25, under Spark's 100-level limit); "
          "IDENTICAL text runs on both engines. Cyclic closure stays on "
          "the operator path (duplicate_clusters) because Spark recursion "
          "does not yet support distinct UNION.")

_q("q98_map_ops", """
SELECT doc_id,
       element_at(m, 'chars') AS chars,
       array_join(map_keys(m2), ',') AS ks,
       aggregate(map_values(m2), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS vsum,
       CAST(size(map_filter(m, (k, v) -> v >= 100)) AS BIGINT) AS n_big
FROM (SELECT doc_id,
             map('chars', CAST(n_chars AS BIGINT), 'id', doc_id) AS m,
             map_concat(map('chars', CAST(n_chars AS BIGINT), 'id', doc_id),
                        map('one', CAST(1 AS BIGINT))) AS m2
      FROM documents)
ORDER BY doc_id
""", duckdb="""
SELECT doc_id,
       map_extract(m, 'chars')[1] AS chars,
       array_to_string(map_keys(m2), ',') AS ks,
       CAST(map_values(m2)[1] + map_values(m2)[2] + map_values(m2)[3]
            AS BIGINT) AS vsum,
       CAST(len(list_filter(map_values(m), x -> x >= 100)) AS BIGINT) AS n_big
FROM (SELECT doc_id,
             map(['chars', 'id'], [CAST(n_chars AS BIGINT), doc_id]) AS m,
             map_concat(map(['chars', 'id'], [CAST(n_chars AS BIGINT), doc_id]),
                        map(['one'], [CAST(1 AS BIGINT)])) AS m2
      FROM documents)
ORDER BY doc_id
""", note="N5 map ops end-to-end, TWO-SIDED (VERDICT r3 item 5): both "
          "engines build a real MAP and extract with map functions. "
          "DuckDB 1.0 extraction returns a one-element LIST, unwrapped "
          "with [1]; the rewriter maps map([k],[v])→map_from_arrays and "
          "map_extract(m,k)[1]→element_at(m,k), so the DuckDB text also "
          "roundtrips through to_spark_sql. Key order is insertion order "
          "on both engines.")

_q("q101_group_order_by_all", """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem WHERE l_orderkey < 5000
GROUP BY ALL ORDER BY ALL
""", note="DuckDB-popularized GROUP BY ALL / ORDER BY ALL ergonomics — "
          "IDENTICAL text runs on both engines (Spark 3.4+ supports both); "
          "ORDER BY ALL gives a total order so the hash oracle applies")

_q("q102_star_exclude", """
SELECT * EXCEPT (p_name, p_type) FROM part ORDER BY p_partkey
""", duckdb="""
SELECT * EXCLUDE (p_name, p_type) FROM part ORDER BY p_partkey
""", note="DuckDB * EXCLUDE → Spark * EXCEPT (dialect star-exclude "
          "rewrite); the roundtrip suite feeds the EXCLUDE text through "
          "the rewriter")

_q("q103_array_setops", """
WITH d AS (SELECT doc_id, split(text, ' ') AS t FROM documents
           WHERE size(split(text, ' ')) >= 24)
SELECT doc_id,
       array_join(array_sort(array_intersect(slice(t, 1, 12), slice(t, 13, 12))), ',') AS inter,
       size(array_distinct(t)) AS n_dist,
       array_position(t, 'the') AS pos_the
FROM d ORDER BY doc_id
""", duckdb="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
           WHERE len(string_split(text, ' ')) >= 24)
SELECT doc_id,
       COALESCE(array_to_string(list_sort(list_intersect(t[1:12], t[13:24])), ','), '') AS inter,
       len(list_distinct(t)) AS n_dist,
       list_position(t, 'the') AS pos_the
FROM d ORDER BY doc_id
""", note="array set operations + slicing + position: DuckDB list_* "
          "family and [a:b] slices compile via the dialect renames "
          "(list_position returns 0-for-missing on both engines, "
          "measured); sorted before join so the unordered intersect "
          "result is comparable")

_q("q104_percentile_cont", """
SELECT l_returnflag,
       array_join(transform(percentile(l_quantity, array(0.25D, 0.5D, 0.9D)),
                            x -> CAST(CAST(x AS DECIMAL(18,6)) AS STRING)), ',') AS q,
       CAST(CAST(percentile(l_extendedprice, 0.5D) AS DECIMAL(18,6)) AS DOUBLE) AS med_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""", duckdb="""
SELECT l_returnflag,
       array_to_string(list_transform(quantile_cont(l_quantity, [0.25, 0.5, 0.9]),
                                      x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), ',') AS q,
       CAST(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS med_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""", note="exact interpolated percentiles (quantile_cont family): Spark "
          "percentile == DuckDB quantile_cont, single- and multi-quantile "
          "forms; 6-d.p. decimal snap before the string/double boundary")

_q("q105_distinct_on", """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
  FROM events) WHERE rn = 1
ORDER BY user_id, ts DESC, event_id
""", duckdb="""
SELECT DISTINCT ON (user_id) user_id, event_id, ts
FROM events ORDER BY user_id, ts DESC, event_id
""", needs_events_shim=True,
    note="DISTINCT ON (latest event per user): DuckDB/Postgres form "
         "compiles to the row_number window (dialect distinct-on "
         "rewrite); tie-broken on event_id for determinism")

_q("q119_list_comprehension", """
SELECT doc_id,
       size(filter(split(text, ' '), w -> length(w) > 4)) AS n_long,
       array_join(transform(filter(split(text, ' '),
                                   w -> contains(w, 'q')),
                            w -> upper(w)), ',') AS qs
FROM documents WHERE doc_id < 200 ORDER BY doc_id
""", duckdb="""
SELECT doc_id,
       len([w FOR w IN string_split(text, ' ') IF strlen(w) > 4]) AS n_long,
       COALESCE(array_to_string([upper(w) FOR w IN string_split(text, ' ')
                                 IF contains(w, 'q')], ','), '') AS qs
FROM documents WHERE doc_id < 200 ORDER BY doc_id
""", note="DuckDB list comprehensions [expr FOR w IN lst IF pred] compile "
          "to transform(filter(...)) higher-order functions (dialect "
          "comprehension rewrite); pure JVM lambda evaluation")

_q("q132_struct_ops", """
SELECT o_orderkey,
       (named_struct('k', o_orderkey, 'p', o_totalprice)).p AS packed_p,
       (named_struct('a', o_orderkey,
                     'n', named_struct('c', o_orderkey + 1))).n.c AS nested_c
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
""", duckdb="""
SELECT o_orderkey,
       struct_extract(struct_pack(k := o_orderkey, p := o_totalprice),
                      'p') AS packed_p,
       ({'a': o_orderkey, 'n': {'c': o_orderkey + 1}}).n.c AS nested_c
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
""", note="struct/ROW operations: struct_pack(k := v) -> named_struct, "
          "struct_extract(s,'f') -> (s).`f`, brace struct literals and "
          "chained dot access — dialect items measured cross-engine; "
          "outputs unwrapped to scalars so the value hash is "
          "stringification-stable")

_q("q136_date_part_fields", """
SELECT (dayofweek(o_orderdate) - 1) AS dow,
       (weekday(o_orderdate) + 1) AS isodow,
       COUNT(*) AS n,
       COUNT_IF(date_part('doy', o_orderdate) <= 180) AS first_half
FROM orders GROUP BY 1, 2 ORDER BY dow
""", duckdb="""
SELECT date_part('dow', o_orderdate) AS dow,
       date_part('isodow', o_orderdate) AS isodow,
       COUNT(*) AS n,
       CAST(COUNT_IF(date_part('doy', o_orderdate) <= 180)
            AS BIGINT) AS first_half
FROM orders GROUP BY 1, 2 ORDER BY dow
""", note="date_part divergent-field rewrites: DuckDB dow (0..6 "
          "Sunday-based) -> dayofweek-1, isodow -> weekday+1; agreeing "
          "fields (doy) pass through verbatim — cross-engine weekday "
          "histogram over order dates")

_q("q91_lateral_join", """
SELECT c.c_custkey, t.n, t.maxprice
FROM customer c, LATERAL (
  SELECT COUNT(*) AS n, CAST(MAX(o_totalprice) AS DOUBLE) AS maxprice
  FROM orders o WHERE o.o_custkey = c.c_custkey
) t
WHERE c.c_custkey < 60 ORDER BY c.c_custkey
""", note="correlated LATERAL subquery (decorrelated by both optimizers "
          "into a join); identical text runs on both engines")
