"""MERGE/upsert: apply a change batch (insert/update/delete) to a base
snapshot — the corpus-refresh operator every long-lived training-data
pipeline needs (the reference rebuilds its corpus subset from scratch
each run, ``000-get_data.py:374-411``; at 100 TB you apply deltas).

Semantics are ANSI ``MERGE INTO`` with a per-row op column:

- ``delete``: the key disappears from the snapshot;
- ``update``: the change row replaces the base row wholesale;
- ``insert``: the change row is appended (key not in base).

Physical shape — the point: the change batch is small relative to the
base by contract (it's a delta), so its KEY SET is broadcast and the
base side resolves survival with a broadcast LEFT ANTI join — **the
base never shuffles**; the only rows that move are the changes
themselves. This is the logical core of copy-on-write table formats
(Delta/Iceberg/Hudi MERGE): at scale the same plan runs per storage
partition and only partitions whose key-bucket intersects the change
set are rewritten (see ``touched_buckets``); untouched files are kept
byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (base columns + ``op_col`` ∈
    insert/update/delete) to ``base``; returns the merged snapshot
    with base's schema.

    One broadcast anti join + one union — no shuffle of the base.
    A key may appear at most once in ``changes`` (MERGE's standard
    cardinality precondition; violations would make the result
    order-dependent).
    """
    changed_keys = changes.select(key).distinct()
    survivors = base.join(F.broadcast(changed_keys), key, "left_anti")
    applied = changes.filter(F.col(op_col) != "delete").drop(op_col)
    return survivors.unionByName(applied.select(*base.columns))


def touched_buckets(
    changes: DataFrame,
    key: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Copy-on-write pruning manifest: the distinct hash-buckets of the
    change keys — the only storage buckets a bucketed base layout must
    rewrite for this merge. ``(bucket INT, n_changes BIGINT)``,
    bucket = pmod(hash(key), n_buckets) (Spark's bucketed-table hash).
    At 100 TB this is the difference between rewriting the whole table
    and rewriting |touched|/n_buckets of it."""
    return (
        changes.select(F.pmod(F.hash(F.col(key)), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_changes"))
    )
