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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import _meta_io as mio


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

    Op semantics: exactly ``'delete'`` deletes; ANY other value —
    including NULL or a case-drifted ``'UPDATE'`` from a malformed
    CDC feed — upserts the row. The guard must be null-safe: a plain
    ``op != 'delete'`` filter evaluates NULL ops to NULL and silently
    HARD-DELETES the row (its key is already anti-joined out of the
    base) — data loss where ANSI MERGE would apply the row.
    """
    changed_keys = changes.select(key).distinct()
    survivors = base.join(F.broadcast(changed_keys), key, "left_anti")
    is_delete = F.coalesce(F.col(op_col) == "delete", F.lit(False))
    applied = changes.filter(~is_delete).drop(op_col)
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


def snapshot_versions(path: str) -> list[int]:
    """Committed versions in the snapshot log (ascending)."""
    log = mio.read_json(mio.join(path, "_log.json"))
    if log is None:
        return []
    return sorted(int(v) for v in log["versions"])


def write_snapshot(df: DataFrame, path: str, version: int) -> None:
    """Commit ``df`` as snapshot ``version``: data under ``v=N``, then
    the log rewritten LAST — the write is visible only once the log
    commit lands, which is the minimal atomic-commit protocol every
    table format (Delta/Iceberg) builds on. The log rewrite itself is
    an atomic rename (``_meta_io.write_json``), so a crash or reader
    mid-commit sees the previous complete log, never a partial one.
    The read-modify-write of the version list runs under the snapshot
    commit lock — two unsynchronized committers would both read the
    same version list and one commit would vanish from the log
    (review r8)."""
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    with mio.commit_lock(path):
        versions = set(snapshot_versions(path)) | {version}
        mio.write_json(mio.join(path, "_log.json"), {"versions": sorted(versions)})


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time travel: read snapshot ``version`` (default: latest
    committed). Only the requested version's directory is listed —
    older snapshots cost nothing to retain until vacuumed."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in committed {versions}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def merge_into_snapshot(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str = "doc_id",
    op_col: str = "op",
) -> int:
    """MERGE against the latest snapshot, commit as the next version
    (copy-on-write): the previous version stays readable — time travel
    is free because nothing is updated in place. Returns the new
    version number.

    Single-writer contract: version selection is serialized by the
    snapshot commit lock — concurrent mergers otherwise both pick the
    same new version and interleave overwrites into one v=N directory
    (review r8). The (potentially long) merge computation itself runs
    inside the lock by design: a CoW merge reads the version it
    supersedes, so overlapping merges are inherently serial — this is
    Delta/Iceberg's optimistic-commit conflict rule degraded to
    pessimistic, which is correct at this log's granularity."""
    with mio.commit_lock(path, timeout_sec=300.0):
        versions = snapshot_versions(path)
        base = read_snapshot(spark, path)
        new_v = versions[-1] + 1
        merged = merge_upsert(base, changes, key=key, op_col=op_col)
        # inline commit (write_snapshot re-acquiring the lock would
        # deadlock a non-reentrant lock)
        merged.write.mode("overwrite").parquet(os.path.join(path, f"v={new_v}"))
        mio.write_json(
            mio.join(path, "_log.json"),
            {"versions": sorted(set(versions) | {new_v})},
        )
    return new_v


def vacuum_snapshots(path: str, keep_last: int = 1) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions (Delta ``VACUUM`` / Iceberg ``expire_snapshots``). The
    log is rewritten FIRST (atomic rename — a reader never resolves a
    version whose data is mid-delete, nor a truncated log), then the
    expired data directories go. Returns the removed versions."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    with mio.commit_lock(path):
        versions = snapshot_versions(path)
        expired = versions[:-keep_last]
        if not expired:
            return []
        mio.write_json(
            mio.join(path, "_log.json"), {"versions": versions[-keep_last:]}
        )
    for v in expired:
        mio.remove_tree(mio.join(path, f"v={v}"))
    return expired


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key: str = "doc_id",
    preimages: bool = False,
) -> DataFrame:
    """Change data feed (Delta CDF / Iceberg changelog analogue): the
    row-level delta between two committed versions — (op ∈ insert/
    update/delete, key, row columns), where delete rows carry the
    FROM-version values and insert/update rows the TO-version values.
    The inverse of ``merge_into_snapshot``: applying the diff to
    v_from reproduces v_to.

    With ``preimages=True`` each update emits TWO rows —
    ``update_preimage`` (FROM values) and ``update_postimage`` (TO
    values), Delta CDF's exact row vocabulary — which is what
    downstream incremental view maintenance needs: every additive
    aggregate refreshes from the feed alone as +postimage/-preimage.

    One full outer join keyed on ``key`` (both sides must be read —
    that's inherent to a diff); change detection compares the
    non-key columns as a struct over the UNION of both versions'
    columns (a side missing a column contributes typed NULLs), so
    schema evolution between the versions diffs correctly: a row
    whose only change is a newly added column IS an update, and a
    dropped column neither crashes the select nor hides changes
    (review r7 — the from-side column set alone did both). Struct
    comparison is null-safe (``eqNullSafe``) for the same reason: a
    NULL in any field must count as a difference from a value, not
    poison the comparison."""
    a = read_snapshot(spark, path, v_from)
    b = read_snapshot(spark, path, v_to)
    a_cols = [c for c in a.columns if c != key]
    b_cols = [c for c in b.columns if c != key]
    cols = a_cols + [c for c in b_cols if c not in a_cols]

    def _packed(df: DataFrame, have: list[str], other: DataFrame, alias: str):
        fields = [
            (F.col(c) if c in have else F.lit(None).cast(other.schema[c].dataType)).alias(c)
            for c in cols
        ]
        return df.select(F.col(key).alias("__k"), F.struct(*fields).alias(alias))

    fa = _packed(a, a_cols, b, "__a")
    fb = _packed(b, b_cols, a, "__b")
    j = fa.join(fb, "__k", "full_outer")
    changed = ~F.col("__a").eqNullSafe(F.col("__b"))
    if not preimages:
        op = (
            F.when(F.col("__a").isNull(), F.lit("insert"))
            .when(F.col("__b").isNull(), F.lit("delete"))
            .when(changed, F.lit("update"))
        )
        side = F.when(F.col("__b").isNull(), F.col("__a")).otherwise(F.col("__b"))
        return (
            j.withColumn("op", op)
            .filter(F.col("op").isNotNull())
            .select(
                "op",
                F.col("__k").alias(key),
                *[side[c].alias(c) for c in cols],
            )
        )
    # CDF form: one (op, image) pair per emitted row — updates fan out
    # to preimage + postimage via a 2-element array explode.
    pairs = (
        F.when(
            F.col("__a").isNull(),
            F.array(F.struct(F.lit("insert").alias("op"), F.col("__b").alias("img"))),
        )
        .when(
            F.col("__b").isNull(),
            F.array(F.struct(F.lit("delete").alias("op"), F.col("__a").alias("img"))),
        )
        .when(
            changed,
            F.array(
                F.struct(F.lit("update_preimage").alias("op"), F.col("__a").alias("img")),
                F.struct(F.lit("update_postimage").alias("op"), F.col("__b").alias("img")),
            ),
        )
        # no otherwise: unchanged rows yield NULL, which explode drops
    )
    exploded = (
        j.select(F.col("__k").alias(key), F.explode(pairs).alias("p"))
        .select(key, F.col("p.op").alias("op"), F.col("p.img").alias("__img"))
    )
    return exploded.select(
        "op", key, *[F.col("__img")[c].alias(c) for c in cols]
    )
