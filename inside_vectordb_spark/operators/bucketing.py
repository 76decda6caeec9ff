"""Bucketed tables: co-located joins without a runtime shuffle.

At 100 TB the dominant cost of repeated equi-joins (embeddings ⋈
assignments, results ⋈ qrels, candidate ⋈ corpus) is re-shuffling
the big side every query batch. Hive-style bucketing pre-shuffles
ONCE at write time: both sides bucketed by the join key into the
same bucket count join partition-to-partition — zero Exchange in the
plan (pinned by ``tests/test_bucketing.py``).

Bucketing requires the session catalog (``saveAsTable``), so these
helpers deal in table names, not paths; the warehouse directory is
the deployment's metastore concern.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 16,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as a parquet table bucketed (and optionally
    sorted) by the join key. Sorting within buckets additionally
    removes the Sort from sort-merge joins."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    spark = df.sparkSession
    if mode == "overwrite":
        # an in-memory catalog forgets tables between sessions while
        # their warehouse directories persist; clear both so overwrite
        # means overwrite
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # the managed location comes from the CATALOG's database
        # locationUri, not a hand-reconstructed <warehouse>/<db>.db
        # path (advice r10): the default database lives at the
        # warehouse ROOT (no default.db segment), unqualified names
        # belong to the CURRENT database (not necessarily default),
        # and a database created WITH LOCATION lives wherever it says.
        # The old reconstruction missed all three, so the stale-dir
        # cleanup this block exists for (an in-memory catalog forgets
        # tables between sessions while their warehouse dirs persist)
        # silently skipped them and saveAsTable failed on the
        # non-empty leftover dir (review r9-5 history).
        parts = [p.lower() for p in table.split(".")]
        db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase().lower()
        try:
            db_root = spark.catalog.getDatabase(db).locationUri.removeprefix(
                "file:"
            )
        except Exception:
            db_root = None  # unknown database: saveAsTable will fail
            # on its own terms; there is no managed dir to clean
        if db_root is not None:
            loc = os.path.join(db_root, parts[-1])
            if os.path.isdir(loc):
                shutil.rmtree(loc)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog scan — bucket metadata rides along, so joins/aggs on
    the bucket key skip their Exchange."""
    return spark.table(table)
