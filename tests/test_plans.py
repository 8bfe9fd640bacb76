"""Plan-quality gates (SURVEY §4, §7 P6): the plans, not just the answers.

Each test pins a scale property: pushdown reaches the parquet scan,
dimension joins broadcast, top-k avoids a global sort, the asof union
strategy costs exactly one shuffle per side, no silent cartesian products.
At sf0.001 these run in seconds; the properties are scale-invariant."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from duckdb_read_spark.plans import (
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    has_cartesian,
    has_pushed_filter,
    physical_plan,
)
from duckdb_read_spark.queries import QUERIES


def test_q05_pushdown_and_partial_agg(engine):
    df = engine.sql(QUERIES["q05_pricing_summary"].spark)
    assert has_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    plan = physical_plan(df, "simple")
    # partial+final HashAggregate pair → map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert codegen_stage_count(df) >= 1


def test_q05_column_pruning(engine):
    df = engine.sql(QUERIES["q05_pricing_summary"].spark)
    plan = physical_plan(df)
    # the lineitem scan must read only the 6 needed columns, not all 16
    scan = next(s for s in plan.split("\n") if "ReadSchema" in s)
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_q14_star_join_broadcasts_dimensions(engine):
    df = engine.sql(QUERIES["q14_multiway_star"].spark)
    # customer, nation, region (and at this sf, orders) broadcast — the
    # fact table must never be the build side
    assert broadcast_join_count(df) >= 3
    assert not has_cartesian(df)


def test_q29_topk_single_window_shuffle(engine):
    df = engine.sql(QUERIES["q29_topk_per_group"].spark)
    assert exchange_count(df) <= 2  # window partition + final order


def test_q48_topk_no_global_sort(engine):
    df = engine.sql(QUERIES["q48_cosine_topk"].spark)
    assert "TakeOrderedAndProject" in physical_plan(df, "simple")


def test_asof_union_strategy_one_shuffle(engine):
    from duckdb_read_spark.operators import asof_join

    ev = engine.table("events")
    p = ev.filter(F.col("event_type") == "purchase")
    s = ev.filter(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    out = asof_join(p, s, on="ts", by="user_id", right_cols=["event_id"], strategy="union")
    # union + window = ONE hash shuffle on user_id; the range-join strategy
    # would add a join shuffle AND a re-aggregation shuffle
    assert exchange_count(out, executed=False) == 1
    assert not has_cartesian(out)


def test_asof_sql_lateral_decorrelates(engine):
    """The dialect's ASOF→LATERAL rewrite must decorrelate — no
    CartesianProduct, top-1 served by WindowGroupLimit (rank pushed into
    the shuffle, not a full per-group sort retained). Catalyst's
    decorrelation does include a broadcast range join over the DISTINCT
    outer timestamp domain — bounded by distinct left ts, not |l|x|r|,
    and acceptable for the SQL-parity surface; the 100 TB asof path is
    operators.asof_join(strategy='union') (SCALE.md D8)."""
    df = engine.sql(QUERIES["q50_asof_join"].duckdb, dialect="duckdb")
    plan = physical_plan(df, "simple")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    # the join back to the left side is a real equi-join, not a loop
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan) \
        and "LeftOuter" in plan
    # the only nested-loop is the broadcast DISTINCT-domain range join
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_jaccard_df_cap_filters_before_selfjoin(engine):
    """The DF cap must prune boilerplate shingles BEFORE the inverted-index
    self-join (that is the whole point): the capped shingle relation the
    join consumes carries the frequency filter, it is materialized ONCE
    per call (r12: checkpoint barrier — the before-plan replayed the
    scan→explode→window subtree once per consumer), and no cartesian
    appears in the pair plan."""
    from duckdb_read_spark.operators import ngram_jaccard_pairs
    from duckdb_read_spark.operators.dedup import _capped_shingles

    docs = engine.table("documents")
    capped = _capped_shingles(docs, "text", "doc_id", 3, 64)
    capped_plan = physical_plan(capped)
    # the window-count filter on document frequency feeds the join input
    assert "64" in capped_plan and capped_plan.count("Filter") >= 1
    out = ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=64)
    plan = physical_plan(out)
    assert not has_cartesian(out)
    # the join reads the materialized capped relation, not subtree replays
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    # ... and ONLY that: a replay of the shingle build would re-surface
    # the parquet scan or the window-cap in the pair plan (ADVICE r12 —
    # 'ExistingRDD appears' alone is satisfied by any checkpointed input)
    assert "Scan parquet" not in plan
    assert "Window" not in plan


def test_jaccard_df_cap_value_level_pin(spark):
    """ADVICE r12: a value-level pin that fails if the DF cap silently
    drops out of ngram_jaccard_pairs — on a planted corpus where ten
    docs share ONLY a boilerplate block, the capped tier must emit no
    boilerplate-only pairs (their shared shingles exceed the cap) while
    the uncapped tier emits all C(10,2), and a genuine near-dup pair
    sharing RARE shingles survives both tiers."""
    from duckdb_read_spark.operators import ngram_jaccard_pairs

    boiler = "standard footer text appearing in every single document here"
    rows = [(i, boiler + f" unique{i} tail{i} mark{i}") for i in range(10)]
    rows += [(100, "rare alpha beta gamma delta epsilon zeta eta theta"),
             (101, "rare alpha beta gamma delta epsilon zeta eta theta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(
        docs, n=3, threshold=0.3).collect()}
    capped = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(
        docs, n=3, threshold=0.3, max_shingle_df=4).collect()}
    boiler_pairs = {(a, b) for a in range(10) for b in range(10) if a < b}
    assert boiler_pairs <= uncapped
    assert not (boiler_pairs & capped), "cap dropped from the pair path"
    assert (100, 101) in uncapped and (100, 101) in capped


def test_merge_plan_no_cartesian(engine, tmp_path):
    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=engine.spark, warehouse_dir=str(tmp_path / "wh"))
    eng.sql("CREATE TABLE pm AS SELECT o_orderkey AS k, o_totalprice AS v "
            "FROM orders WHERE o_orderkey < 100")
    eng.sql("MERGE INTO pm USING (SELECT o_orderkey AS k, o_totalprice AS v "
            "FROM orders WHERE o_orderkey < 200) s ON pm.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *")
    # the merge already committed; gate the read-back plan plus a dry-run
    # of the same join shape
    df = eng.sql("SELECT pm.* FROM pm LEFT JOIN (SELECT o_orderkey AS k "
                 "FROM orders WHERE o_orderkey < 200) s ON pm.k = s.k")
    assert not has_cartesian(df)
    assert eng.sql("SELECT COUNT(*) AS n FROM pm").first()["n"] == \
        engine.sql("SELECT COUNT(DISTINCT o_orderkey) AS n FROM orders "
                   "WHERE o_orderkey < 200").first()["n"]


def test_bucketed_tables_join_without_shuffle(engine, tmp_path):
    """Two tables bucketed on the same key join with ZERO exchanges — the
    shuffle was paid once at write time (the durable co-location story)."""
    from duckdb_read_spark.sources.sinks import write_bucketed_table

    spark = engine.spark
    o = engine.sql("SELECT o_orderkey, o_totalprice FROM orders")
    li = engine.sql("SELECT l_orderkey, l_quantity FROM lineitem")
    write_bucketed_table(o, "b_orders", ["o_orderkey"], buckets=8,
                         sort_cols=["o_orderkey"], mode="overwrite",
                         path=str(tmp_path / "b_orders"))
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], buckets=8,
                         sort_cols=["l_orderkey"], mode="overwrite",
                         path=str(tmp_path / "b_lineitem"))
    try:
        joined = spark.sql(
            "SELECT /*+ MERGE(b_lineitem) */ b_orders.o_orderkey, l_quantity "
            "FROM b_orders JOIN b_lineitem ON o_orderkey = l_orderkey"
        )
        assert exchange_count(joined, executed=False) == 0
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_collect_matches_plain(engine):
    from duckdb_read_spark.operators.skew import salted_collect

    ev = engine.table("events")
    salted = salted_collect(ev, ["user_id"], "event_id", salt_buckets=8)
    plain = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("event_id")).alias("values"))
    )
    got = {tuple(r) for r in salted.select("user_id", F.col("values").cast("string")).collect()}
    want = {tuple(r) for r in plain.select("user_id", F.col("values").cast("string")).collect()}
    assert got == want


def test_broadcast_small_guard(engine):
    from duckdb_read_spark.operators.skew import broadcast_small

    import pytest

    broadcast_small(engine.table("region"))  # 5 rows — fine
    with pytest.raises(ValueError):
        broadcast_small(engine.table("lineitem"), max_rows=10)


def test_repartition_for_join_no_extra_shuffle(engine):
    from duckdb_read_spark.operators.skew import repartition_for_join

    c, o = repartition_for_join(
        engine.table("customer"), engine.table("orders").withColumnRenamed("o_custkey", "c_custkey"),
        on=["c_custkey"], partitions=8,
    )
    joined = c.join(o, "c_custkey")
    plan = physical_plan(joined, "simple")
    # exactly the two explicit repartition exchanges; the join itself adds none
    assert plan.count("Exchange hashpartitioning") == 2


def test_time_partitioned_registration_prunes(engine, tmp_path):
    """SCALE §3.4 closed at the source: register_parquet(time_partition=True)
    materializes the ns-ts table into a hive day-partitioned layout, and a
    literal ts range in SQL (a) gains an injected p_date predicate that
    Catalyst turns into partition pruning, and (b) pushes the ts range
    itself down to row-group stats — neither is possible through the
    expression-computed shim view."""
    import os

    from duckdb_read_spark import Engine

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    eng = Engine(spark=engine.spark, warehouse_dir=str(tmp_path))
    df = eng.register_parquet(
        "events_tp", os.path.join(sf_dir, "events.parquet"), time_partition=True)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["ts"] == "timestamp"  # a real column again, not an expression
    # visible partition column (hive style); Spark infers DATE for the
    # day-granularity format, string for hour/month
    assert types.get("p_date") in ("date", "string")

    pred = "ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'"
    out = eng.sql(f"SELECT count(*) AS n FROM events_tp WHERE {pred}")
    plan = physical_plan(out)
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "p_date" in part[1][:400]
    assert has_pushed_filter(out, "GreaterThanOrEqual(ts")
    # row-identical to the same predicate on the unpartitioned shim view
    base = engine.sql(f"SELECT count(*) AS n FROM events WHERE {pred}")
    assert out.collect() == base.collect()

    # BETWEEN and exact-day equality inject too, and literals inside
    # string context never mutate the result
    btw = eng.sql("SELECT count(*) AS n FROM events_tp "
                  "WHERE ts BETWEEN '2024-01-05 06:00:00' AND '2024-01-07 18:00:00'")
    btw_base = engine.sql("SELECT count(*) AS n FROM events "
                          "WHERE ts BETWEEN '2024-01-05 06:00:00' AND '2024-01-07 18:00:00'")
    assert btw.collect() == btw_base.collect()
    assert "p_date" in physical_plan(btw).split("PartitionFilters", 1)[1][:400]

    # a NOT-negated time predicate must stay correct: the injected
    # partition conjunct is parenthesized WITH the ts predicate, so the
    # NOT applies to both (review finding r5 — the bare form dropped
    # every early partition)
    neg = eng.sql("SELECT count(*) AS n FROM events_tp "
                  "WHERE NOT ts >= '2024-01-15 00:00:00'")
    neg_base = engine.sql("SELECT count(*) AS n FROM events "
                          "WHERE NOT ts >= '2024-01-15 00:00:00'")
    assert neg.collect() == neg_base.collect()
    assert neg.collect()[0].n > 0

    # re-registration reuses the existing materialization (no second write)
    import glob as _g
    before = set(_g.glob(os.path.join(str(tmp_path), "__tp__events_tp", "*", "*")))
    eng.register_parquet(
        "events_tp", os.path.join(sf_dir, "events.parquet"), time_partition=True)
    after = set(_g.glob(os.path.join(str(tmp_path), "__tp__events_tp", "*", "*")))
    assert before == after


def test_analyze_stats_flip_broadcast_choice(engine, spark, tmp_path):
    """ANALYZE + CBO stats (VERDICT r5 item 5): Spark's static size
    estimate for a scan is the on-disk byte count, which overshoots for
    small tables spread over many files (footer/dictionary overhead).
    With the session threshold between the two sizes, the dim joins as
    sort-merge; after ANALYZE records the actual serialized size, the
    re-registered view carries a broadcast hint and the SAME query plans
    as a broadcast join. A later commit makes the stats stale and the
    hint must disappear."""
    from duckdb_read_spark.engine import Engine
    from duckdb_read_spark.plans.inspect import physical_plan

    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    eng.register_fixture_dir("/root/testdata/sf0.001")
    # 20 rows over 20 files: ~20-40 KB on disk, ~500 B of actual data
    dim = (spark.range(0, 20).withColumnRenamed("id", "k")
           .withColumn("v", (F.col("k") % 5).cast("long"))
           .repartition(20))
    d = str(tmp_path / "dim20")
    eng.write_versioned(dim, d)
    eng.register_versioned("dim20", d)
    import glob
    import os

    disk = sum(os.path.getsize(p) for p in glob.glob(
        os.path.join(d, "data", "**", "*.parquet"), recursive=True))

    q = ("SELECT o.o_orderkey, d.v FROM orders o "
         "JOIN dim20 d ON o.o_orderkey % 20 = d.k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        thr = max(1024, disk // 4)   # between est (~1 KB) and disk size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
        before = physical_plan(eng.sql(q))
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before

        st = eng.sql("ANALYZE TABLE dim20").first()
        assert st["rows"] == 20 and st["est_bytes"] < thr < disk
        after = physical_plan(eng.sql(q))
        assert "BroadcastHashJoin" in after

        # any commit staleness-invalidates the stats -> hint gone
        eng.sql("INSERT INTO dim20 VALUES (99, 0)")
        stale = physical_plan(eng.sql(q))
        assert "SortMergeJoin" in stale and "BroadcastHashJoin" not in stale
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_analyze_statement_surface(engine, spark, tmp_path):
    import pytest

    from duckdb_read_spark import snapshots
    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    eng.sql("CREATE TABLE ta AS SELECT id AS k, CAST(id AS STRING) AS s "
            "FROM range(100)")
    out = eng.sql(
        "ANALYZE TABLE ta COMPUTE STATISTICS FOR COLUMNS k, s").first()
    assert out["rows"] == 100
    st = snapshots.read_stats(eng._versioned["ta"])
    assert st["version"] == 1 and st["rows"] == 100
    assert 95 <= st["columns"]["k"]["ndv"] <= 105   # HLL approx
    assert st["columns"]["s"]["avg_len"] is not None
    with pytest.raises(ValueError, match="unknown column"):
        eng.sql("ANALYZE ta COMPUTE STATISTICS FOR COLUMNS nope")
    with pytest.raises(ValueError, match="unknown versioned table"):
        eng.sql("ANALYZE no_such_table")


def test_semantic_dedup_pairs_plan_no_cartesian(engine, spark):
    """SemDeDup's within-cell pairing must be a hash-partitioned
    EQUI-join on the cell id (the n²/k bucketed shape) — a
    BroadcastNestedLoop/Cartesian here would be the all-pairs scan the
    operator exists to avoid."""
    from duckdb_read_spark.operators import semantic_neardup_pairs

    emb = engine.table("embeddings")
    pairs = semantic_neardup_pairs(emb, threshold=0.9, n_cells=4, iters=1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_bigram_reuses_docbg_exchange(engine, spark):
    """r7 q111 restructure: every stage reads the per-doc bigram-count
    relation, so AQE must REUSE its shuffle instead of re-running the
    scan+explode for the model build and the scoring join (the r6 plan
    computed the explode twice). Gate: at least one ReusedExchange in
    the adaptive final plan."""
    from duckdb_read_spark.operators.text import corpus_bigram_scores

    df = corpus_bigram_scores(engine.table("documents"))
    df.collect()  # AQE finalizes reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_multi_unnest_zip_no_cartesian(engine):
    """The multi-unnest ZIP rewrite must not cross-product: one
    explode over the index sequence, no CartesianProduct/BNLJ."""
    df = engine.sql(
        "SELECT unnest([n_nationkey, n_regionkey]) AS a, "
        "unnest([1, 2, 3]) AS b FROM nation", dialect="duckdb")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    # exactly one Generate node (the numbered formatted-plan entry)
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1


def test_positional_join_sql_no_cartesian_no_sort(engine):
    """The SQL POSITIONAL JOIN route joins on footer-derived positions:
    an equi-join (broadcastable), never a cartesian product or a
    global sort."""
    df = engine.sql(
        "SELECT r_name, n_name FROM region POSITIONAL JOIN nation",
        dialect="duckdb")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "GlobalSort" not in plan and "Sort [" not in plan


def test_lateral_unnest_single_generate(engine):
    """FROM-position lateral unnest compiles to one Generate (LATERAL
    VIEW explode), not a join."""
    df = engine.sql(
        "SELECT n_name, u FROM nation, unnest([n_nationkey, "
        "n_regionkey]) AS t(u)", dialect="duckdb")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "Generate" in plan and "Join" not in plan
