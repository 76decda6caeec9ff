"""Deterministic range-bucketing for distributed global ranks /
prefix sums.

The obvious building block — ``repartitionByRange`` + ``spark_
partition_id()`` — is NOT safe for the two-action prefix-sum pattern
(collect per-partition counts, broadcast offsets, join back): Spark's
range partitioner draws a fresh reservoir sample per JOB, so the
partition a row lands in can differ between the driver-side counts
action and the final plan, silently corrupting the offsets. (Observed
directly: two ``groupBy(spark_partition_id()).count()`` runs over the
same ``repartitionByRange`` disagree on per-partition counts.)

This module makes the bucket id a DATA-DERIVED column instead of a
physical accident: quantile boundaries of the leading sort key are
collected ONCE and embedded as literals, so every action over the
returned plan assigns identical bucket ids. Downstream windows
partition by ``__pid`` (parallel, bounded), never by an empty spec.

Scale shape: one extra aggregation pass for the quantiles (a
``percentile_approx`` partial-agg, same cost class as the sampling
job ``repartitionByRange`` would run anyway), then one hash shuffle
on ``__pid``. Bucket-count skew from approximate quantiles only
affects balance, never correctness — ranks come from per-bucket
``row_number`` plus exact collected offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_range_ids(
    df: DataFrame,
    key: str,
    n_parts: int,
    ascending: bool = True,
    pid_col: str = "__pid",
) -> DataFrame:
    """Add ``pid_col``: a deterministic range-bucket id (0..n_parts-1)
    that is monotone in ``key`` (ascending or descending), computed
    from literal quantile boundaries so repeated actions agree.

    Ties on ``key`` at a boundary all land in the lower bucket id —
    callers break ties inside buckets with their own tie-break
    column, which is safe because equal keys are never split across
    buckets."""
    if n_parts < 2:
        return df.withColumn(pid_col, F.lit(0))
    probs = [i / n_parts for i in range(1, n_parts)]
    row = df.select(
        F.percentile_approx(F.col(key).cast("double"), probs, 10000).alias("b")
    ).collect()
    bounds = sorted(set(row[0]["b"] or [])) if row else []
    if not ascending:
        bounds = list(reversed(bounds))
    pid: Column = F.lit(0)
    for b in bounds:
        cmp = (F.col(key) > F.lit(b)) if ascending else (F.col(key) < F.lit(b))
        pid = pid + cmp.cast("int")
    return df.withColumn(pid_col, pid)
