"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the config choices are the ones that
matter on a real multi-executor cluster too: AQE for runtime re-plan
(skew joins, shuffle coalescing), Arrow for pandas-UDF transfer, and a
shuffle-partition count sized to the test scale (tiny here; at 100 TB
you'd size partitions to ~128-256 MB post-shuffle and let AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "inside-vectordb-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    AQE stays on: at scale it coalesces small shuffle partitions,
    converts sort-merge to broadcast joins when runtime stats allow,
    and splits skewed partitions — all free wins for our plans.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        # (nanosAsLong is NOT set here: io.load_table and the stream
        # readers set it at runtime so the engine works under ANY
        # caller's session — a session-level copy was a second source
        # of truth that invited removing the runtime sets, review r7)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # The testdata lays each table out as ONE small parquet file;
        # the default 128 MB split size would put entire expensive
        # scans (shingling, UDF encode) on a single core. 4 MB splits
        # restore scan parallelism locally; at 100 TB inputs arrive as
        # many files/row-groups and this knob is irrelevant.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
