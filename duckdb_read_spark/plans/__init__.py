"""Plan inspection & quality gates (SURVEY §4, §7 P6).

The reference engine's optimize stage is opaque in the notes (named once,
/root/reference/duckdb:101); ours is Catalyst, and this module is how we
HOLD Catalyst to the plans we want: tests assert pushdown reached the scan,
dimension joins broadcast, top-k compiled to TakeOrderedAndProject, and no
operator silently became a cartesian product. A correct answer off a bad
plan is a 100 TB outage deferred.
"""

from .inspect import (
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    executed_plan,
    has_cartesian,
    has_pushed_filter,
    physical_plan,
)

__all__ = [
    "physical_plan",
    "executed_plan",
    "has_pushed_filter",
    "broadcast_join_count",
    "exchange_count",
    "has_cartesian",
    "codegen_stage_count",
]
