"""Physical-plan inspection helpers.

``physical_plan`` renders the pre-execution plan; ``executed_plan`` runs the
query first so AQE's runtime re-planning (SMJ→BHJ conversion, partition
coalescing, skew-split) is visible — at 100 TB the AQE-final plan is the
one that matters.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def executed_plan(df: DataFrame) -> str:
    """Execute THIS DataFrame then render its AQE-final plan.

    Must collect ``df`` itself: a derived action like ``df.count()`` builds
    its own QueryExecution and would leave ``df``'s AdaptiveSparkPlan
    unfinalized (isFinalPlan=false). Use on test-scale data.
    """
    plan = physical_plan(df, "simple")
    if "isFinalPlan=false" in plan:
        df.collect()
        plan = physical_plan(df, "simple")
    # A finalized adaptive plan prints BOTH '== Final Plan ==' and
    # '== Initial Plan ==' — keep only the final section, else every
    # operator is counted twice.
    return plan.split("== Initial Plan ==")[0]


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if ``fragment`` appears inside a scan's PushedFilters list."""
    plan = physical_plan(df)
    return any(
        fragment in m
        for m in re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    )


def broadcast_join_count(df: DataFrame, executed: bool = True) -> int:
    plan = executed_plan(df) if executed else physical_plan(df, "simple")
    return plan.count("BroadcastHashJoin")


def exchange_count(df: DataFrame, executed: bool = True) -> int:
    """Shuffle exchanges in the (final) plan — the scale-limiting operator.

    Broadcast exchanges are excluded: they move only the small side.
    AQE query stages re-print their shuffle as ShuffleQueryStage; count
    distinct Exchange nodes by plan_id to avoid double counting.
    """
    plan = executed_plan(df) if executed else physical_plan(df, "simple")
    ids = set(re.findall(r"Exchange (?:hash|range|SinglePartition)[^\[]*\[plan_id=(\d+)\]", plan))
    # Fallback for plans where plan_id isn't printed.
    if not ids:
        return len(re.findall(r"\+- Exchange (?!.*Broadcast)", plan))
    return len(ids)


def has_cartesian(df: DataFrame) -> bool:
    plan = physical_plan(df, "simple")
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans. Under AQE codegen ids only exist
    in the final plan, so this executes the query (collect) first — use on
    test-scale data."""
    plan = physical_plan(df, "simple")
    if "AdaptiveSparkPlan" in plan and "isFinalPlan=false" in plan:
        df.collect()
        plan = physical_plan(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
