"""Physical-plan audit helpers.

The engine's 100 TB story lives in plan shapes — pushed filters,
broadcast joins, map-side partial aggregation, pruned columns. These
helpers make those properties assertable, so the plan contract is
pinned by tests (``tests/test_plans.py``) instead of hoped for.
"""

from inside_vectordb_spark.plans.audit import (
    assert_in_plan,
    assert_not_in_plan,
    count_in_plan,
    count_nodes,
    physical_plan,
    shuffled_payloads,
    work_counters,
)

__all__ = [
    "assert_in_plan",
    "assert_not_in_plan",
    "count_in_plan",
    "count_nodes",
    "physical_plan",
    "shuffled_payloads",
    "work_counters",
]
