"""Inspect executed physical plans as strings.

Usage pattern (tests and interactive tuning):

    plan = physical_plan(df)
    assert_in_plan(df, "PushedFilters: [IsNotNull(vec_id)")
    assert_in_plan(df, "BroadcastHashJoin")
    assert_not_in_plan(df, "CartesianProduct")
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-optimizer, pre-AQE-finalization) physical
    plan, as one string."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_in_plan(df: DataFrame, fragment: str) -> int:
    return physical_plan(df).count(fragment)


def assert_in_plan(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert fragment in plan, f"expected {fragment!r} in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert fragment not in plan, f"unexpected {fragment!r} in plan:\n{plan}"
