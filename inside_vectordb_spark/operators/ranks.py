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
    buckets.

    NULL keys follow Spark's window null ordering for the requested
    direction: bucket 0 under ascending (ASC NULLS FIRST — every
    boundary comparison is NULL → counted as 0; without the coalesce
    a single NULL key produced a NULL bucket id that crashed the
    driver-side offset accumulation, review r7), and the LAST bucket
    under descending (DESC NULLS LAST — review r9-4: the coalesce
    alone put NULLs in bucket 0 NEXT TO THE TOP keys, so a NULL-key
    row consumed budget/rank ahead of every mid/low key instead of
    sorting last as the global descending contract requires)."""
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
        pid = pid + F.coalesce(cmp.cast("int"), F.lit(0))
    if not ascending:
        pid = F.when(F.col(key).isNull(), F.lit(len(bounds))).otherwise(pid)
    return df.withColumn(pid_col, pid)


def global_row_ranks(
    df: DataFrame,
    key: str,
    tie: str,
    n_parts: int | None = None,
    rank_col: str = "__rank",
) -> tuple[DataFrame, int]:
    """Exact global 1-based ranks of ``(key, tie)`` order WITHOUT a
    single-partition window: deterministic range buckets on the key,
    per-bucket ``row_number`` (parallel, bounded windows), per-bucket
    counts prefix-accumulated on the driver (one long per bucket) and
    broadcast back as offsets. Returns (df + rank_col, total_rows).

    This is the repo's standard distributed prefix-sum shape
    (``token_budget_select``, ``equi_depth_histogram``); factored
    here so every global-order operator shares one implementation."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = deterministic_range_ids(df, key, n_parts)
    counts = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    )
    offsets, total = [], 0
    for pid, c in counts:
        offsets.append((pid, total))
        total += c
    off = spark.createDataFrame(
        offsets or [(0, 0)],
        StructType(
            [StructField("__pid", LongType()), StructField("__off", LongType())]
        ),
    )
    w = Window.partitionBy("__pid").orderBy(F.asc(key), F.asc(tie))
    ranked = (
        ranged.withColumn("__lr", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )
    return ranked, total


def ntile_expr(rank_col: str, total: int, n: int) -> Column:
    """0-based ``ntile(n)`` bucket from a 1-based global rank with
    driver-known row count: the first ``total %% n`` buckets hold
    ``total // n + 1`` rows, the rest ``total // n`` — exactly SQL
    ntile semantics, with the N < n edge handled without a
    div-by-zero branch under ANSI mode."""
    q, r = divmod(total, n)
    cut = r * (q + 1)
    rank = F.col(rank_col)
    if q == 0:
        return rank - 1
    if r == 0:
        return F.floor((rank - 1) / F.lit(q))
    return F.when(
        rank <= cut, F.floor((rank - 1) / F.lit(q + 1))
    ).otherwise(F.lit(r) + F.floor((rank - cut - 1) / F.lit(q)))
