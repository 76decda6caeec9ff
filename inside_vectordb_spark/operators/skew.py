"""Skew mitigation: salted equi-join.

AQE's skew-join handles most runtime skew (enabled in
``session.get_spark``), but it only splits SHUFFLE partitions — a
single join key hot enough to dwarf one task (the classic
``user_id = null``-style heavy hitter, or one viral document id in a
candidate join) is still better handled structurally: salt the
skewed side into ``n_salts`` sub-keys and replicate the other side
once per salt, turning one giant task into ``n_salts`` even ones at
the cost of an ``n_salts``× blow-up of the SMALL side only.

The salt must be deterministic per ROW (not per key) so the same
key's rows spread across salts: we derive it from a caller-named
unique column (crc32 mod n) — reruns and retries get identical
plans, unlike ``rand()``-based salting which breaks task retry
idempotency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    row_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (hot keys, big) with ``small`` on ``key``,
    spreading each hot key over ``n_salts`` sub-partitions.

    ``row_col``: any column of ``skewed`` that varies per row (an id)
    — the deterministic salt source. Result columns = plain
    ``skewed.join(small, key, how)``.

    ``how`` is restricted to joins where replicating the small side
    ``n_salts``× cannot surface in the output: inner/left keep exactly
    the salted-side matches; semi/anti reduce to existence checks. A
    right or full outer join would emit every UNMATCHED small-side row
    ``n_salts`` times — reverse the operands instead."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equi_join: how={how!r} unsupported — the small side is "
            f"replicated {n_salts}x, so right/full outer joins would "
            f"duplicate unmatched small-side rows; use one of {sorted(allowed)}"
        )
    spark = skewed.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    salted = skewed.withColumn(
        # coalesce: crc32(NULL) is NULL and a NULL salt never equi-
        # matches, so a skewed row with a NULL row_col silently fell
        # out of the join the docstring declares equivalent to the
        # plain one (review r9-5); NULL-id rows all land in salt 0 —
        # correct, and skew from them is the caller's id-quality issue
        "__salt",
        F.coalesce(
            F.pmod(F.crc32(F.col(row_col).cast("string")), F.lit(n_salts)),
            F.lit(0),
        ).cast("int"),
    )
    replicated = small.crossJoin(F.broadcast(salts))
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")
