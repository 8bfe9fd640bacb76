"""Bounded/statistical tests for the non-hash-oracled operators
(SURVEY §2.3): approximate aggregates, sampling, map ops, any_value."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_bounded_error(engine):
    """A13: HLL estimate within its documented rsd bound (default 5%; allow
    3 sigma) of the exact distinct count."""
    exact = engine.sql("SELECT COUNT(DISTINCT l_suppkey) AS n FROM lineitem").first()["n"]
    approx = engine.sql(
        "SELECT approx_count_distinct(l_suppkey) AS n FROM lineitem"
    ).first()["n"]
    assert abs(approx - exact) <= max(3, 0.15 * exact)


def test_approx_percentile_brackets_exact_median(engine):
    exact = engine.sql("SELECT median(c_acctbal) AS m FROM customer").first()["m"]
    lo, hi = engine.sql(
        "SELECT approx_percentile(c_acctbal, 0.4) AS lo, approx_percentile(c_acctbal, 0.6) AS hi FROM customer"
    ).first()
    assert lo <= exact <= hi


def test_tablesample_fraction_bounds(engine):
    """Sampling: fraction is approximate (Bernoulli per row); bound loosely."""
    total = engine.table("lineitem").count()
    sampled = engine.sql("SELECT * FROM lineitem TABLESAMPLE (20 PERCENT)").count()
    assert 0.05 * total < sampled < 0.40 * total


def test_sample_seed_reproducible(engine):
    a = engine.table("orders").sample(fraction=0.3, seed=7).count()
    b = engine.table("orders").sample(fraction=0.3, seed=7).count()
    assert a == b


def test_map_ops_constructed_values(engine):
    """N5: no map column in fixtures — constructed-value semantics check."""
    row = engine.sql(
        """SELECT map('a', 1, 'b', 2) AS m,
                  map_keys(map('a', 1, 'b', 2)) AS ks,
                  element_at(map('a', 1, 'b', 2), 'b') AS vb,
                  map_values(map('a', 1, 'b', 2)) AS vs"""
    ).first()
    assert row["ks"] == ["a", "b"] and row["vb"] == 2 and row["vs"] == [1, 2]


def test_any_value_is_from_group(engine):
    rows = engine.sql(
        """SELECT c_nationkey, any_value(c_name) AS nm FROM customer
           GROUP BY c_nationkey"""
    ).collect()
    names = {r["c_nationkey"]: r["nm"] for r in rows}
    for nk, nm in list(names.items())[:5]:
        cnt = engine.sql(
            f"SELECT COUNT(*) AS n FROM customer WHERE c_nationkey = {nk} AND c_name = '{nm}'"
        ).first()["n"]
        assert cnt == 1
