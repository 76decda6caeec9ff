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


def _walk(node):
    """Yield every physical-plan node reachable through children(),
    AQE initial plans, and subquery plans. Unlike the toString form,
    this never re-prints a cached relation's child plan per
    InMemoryTableScan reference — node-count assertions stay honest
    in the presence of persist()."""
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))
    # AQE root keeps the EnsureRequirements-expanded tree aside
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        yield from _walk(node.initialPlan())
    # scalar/DPP SUBQUERY plans are not children() — without this
    # a shuffle inside a subquery tree is invisible and the audit
    # reports "shuffle-free" for a plan that does shuffle wide
    # columns (review r7)
    try:
        sub = node.subqueries()
        for i in range(sub.size()):
            yield from _walk(sub.apply(i))
    except Exception:
        pass  # not every node type exposes subqueries()


def count_nodes(df: DataFrame, simple_name: str) -> int:
    """How many LIVE plan nodes of the given class (SimpleName, e.g.
    ``GenerateExec``, ``InMemoryTableScanExec``) the executed plan
    contains. A node inside a persisted relation's cached plan counts
    ZERO times here (it executes once, at materialization) even
    though ``physical_plan``'s string repeats it per reference — use
    this, not string counts, to pin compute-once contracts."""
    return sum(
        1
        for node in _walk(df._jdf.queryExecution().executedPlan())
        if node.getClass().getSimpleName() == simple_name
    )


def work_counters(df: DataFrame) -> dict:
    """Execute the DataFrame's OWN query execution once and aggregate
    deterministic work metrics from the executed plan: rows read from
    sources, bytes/records written to shuffles, and structural counts
    (exchanges, scans). Wall-clock varies ±30% between identical runs
    on a shared host (proven r4→r5); these counters don't — a real
    plan regression is detectable from ONE run (round-7 advisory #4).

    Implementation notes: a ``df.write`` action builds a NEW
    QueryExecution, so metrics must come from an action through the
    df's own plan (``toRdd().count()``). Post-execution AQE wraps
    stages in ``*QueryStageExec`` nodes whose plan is reachable via
    ``.plan()``, not ``children()``; nodes are deduped by plan id so
    a ReusedExchange never double-counts its original's metrics."""
    jqe = df._jdf.queryExecution()
    jqe.toRdd().count()

    def _walk_exec(node, seen):
        nid = node.id()
        if nid in seen:
            return
        seen.add(nid)
        yield node
        nm = node.getClass().getSimpleName()
        ch = node.children()
        for i in range(ch.size()):
            yield from _walk_exec(ch.apply(i), seen)
        if nm == "AdaptiveSparkPlanExec":
            yield from _walk_exec(node.executedPlan(), seen)
        elif nm.endswith("QueryStageExec"):
            yield from _walk_exec(node.plan(), seen)
        # scalar/DPP subquery plans are not children() — without this
        # an exchange inside a subquery is invisible to the work
        # counters, the same blind spot review r7 fixed in _walk
        # (advisory r9)
        try:
            sub = node.subqueries()
            for i in range(sub.size()):
                yield from _walk_exec(sub.apply(i), seen)
        except Exception:
            pass  # not every node type exposes subqueries()

    out = {
        "rows_read": 0,
        "cache_rows_read": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "exchanges": 0,
        "scans": 0,
    }
    for node in _walk_exec(jqe.executedPlan(), set()):
        nm = node.getClass().getSimpleName()
        mets = {}
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = kv._2().value()
        except Exception:
            continue
        if nm == "InMemoryTableScanExec":
            out["cache_rows_read"] += mets.get("numOutputRows", 0)
        elif nm.endswith("ScanExec"):
            out["scans"] += 1
            out["rows_read"] += mets.get("numOutputRows", 0)
        elif nm == "ShuffleExchangeExec":
            out["exchanges"] += 1
            out["shuffle_bytes"] += mets.get("shuffleBytesWritten", 0)
            out["shuffle_records"] += mets.get("shuffleRecordsWritten", 0)
    return out


def shuffled_payloads(df: DataFrame) -> list[tuple[str, list[str]]]:
    """For every shuffle exchange in the physical plan, the
    partitioning (as a string) and the column names that cross the
    wire. The 100 TB audit primitive: a wide column (e.g. full
    document text) in a hash-partitioned exchange is a network
    scale-killer even when the query is correct.

    RoundRobin repartitions are included — callers that only care
    about data-moving-at-scale exchanges can filter on
    ``part.startswith("hashpartitioning")`` (the round-robin splits
    here come from ``io.load_table``'s single-row-group testdata
    workaround, which never triggers on a real multi-split scan)."""

    out: list[tuple[str, list[str]]] = []
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        if node.getClass().getSimpleName() == "ShuffleExchangeExec":
            attrs = node.child().output()
            names = [attrs.apply(i).name() for i in range(attrs.size())]
            out.append((node.outputPartitioning().toString(), names))
    return out


def count_in_plan(df: DataFrame, fragment: str) -> int:
    return physical_plan(df).count(fragment)


def assert_in_plan(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert fragment in plan, f"expected {fragment!r} in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert fragment not in plan, f"unexpected {fragment!r} in plan:\n{plan}"
