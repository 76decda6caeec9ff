"""Table loaders + canonical derived tables.

The driver's synthetic tables (TESTDATA.md) are Parquet; the reference
ingests JSONL/TSV/NPZ (SURVEY.md §2.1 S1-S8) — those readers live in
``sources/``. This module is the engine-facing catalog.

Derived tables: the testdata has no ``queries``/``qrels`` tables, so
the engine derives them deterministically from ``embeddings``
(FIXTURES.md §3-4). The SAME derivation is expressed in the DuckDB
oracle SQL (registry.py), so every IR-metric query stays fully
hash-matched.

Derivation contract (any scale factor):
- query vectors  = embeddings rows with ``vec_id < 20``
- qrels          = (q.vec_id, d.vec_id, relevance) for every query q
  and doc d where ``d.label = q.label`` and ``d.vec_id % 5 = 3`` and
  ``d.vec_id <> q.vec_id`` and ``q.vec_id % 7 <> 0``.
  relevance grade = ``1 + d.vec_id % 2`` (graded, like MS MARCO's
  0/1/2 — ``000-get_data.py:121-128``).
  Queries with ``vec_id % 7 = 0`` get NO qrels rows, exercising the
  reference's recall skip rule (``utils.py:37-38``) and MRR zero-fill
  (``utils.py:107-108``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

N_QUERY_VECTORS = 20


# Tables whose downstream work is CPU-heavy per row (shingling, UDF
# encode/GEMM): worth an explicit split when the source arrives as one
# unsplittable row group (the testdata writes single-row-group files,
# so file-split configs cannot create parallelism).
_SPLIT_TABLES = frozenset({"documents", "embeddings"})


def _tz_normalize(df: DataFrame, schema=None) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (session tz = UTC, so
    wall-clock values are preserved bit-for-bit).

    The driver's testdata writer has flipped between parquet
    TIMESTAMP(NANOS), TIMESTAMP(isAdjustedToUTC=true), and
    TIMESTAMP(isAdjustedToUTC=false) across regenerations; the last
    reads back as Spark TIMESTAMP_NTZ, which TIMESTAMP-only expressions
    (``unix_micros``, some streaming state ops) reject. Normalizing at
    the scan keeps every downstream plan and every DuckDB oracle (which
    sees plain TIMESTAMP either way) agnostic to the writer flavor. A
    per-column cast is a zero-cost projection — pushdown/pruning are
    unaffected."""
    if schema is not None:
        # dtype check from the (cached) schema object — ``df.dtypes``
        # triggers a py4j plan analysis per call (optimization r12)
        ntz = [
            f.name
            for f in schema.fields
            if f.dataType.simpleString() == "timestamp_ntz"
        ]
    else:
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# (path, mtime_ns, size) → inferred StructType. Schema inference reads
# parquet footers on the DRIVER at every ``spark.read.parquet`` —
# ~80 ms per call measured locally, paid once per table per QUERY
# CONSTRUCTION (optimization r12). The key carries the file
# metadata, so a rewritten table re-infers; the DATA is still scanned
# fresh by every query — only the footer metadata is reused, exactly
# what a table catalog provides at scale.
_SCHEMA_CACHE: dict = {}


def _path_stat(path: str) -> tuple:
    """(mtime_ns, total_size) over a file or a directory tree of part
    files — the schema-cache invalidation key. RECURSIVE (advice r12):
    a partitioned/nested layout must invalidate on a nested-file
    rewrite, or a stale schema (and worse, a stale index-validity
    fingerprint) survives the rewrite."""
    if os.path.isdir(path):
        mt = sz = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                st = os.stat(os.path.join(root, f))
                mt = max(mt, st.st_mtime_ns)
                sz += st.st_size
        return (mt, sz)
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


def _read_parquet(spark: SparkSession, path: str) -> tuple[DataFrame, object]:
    """Parquet reader with a metadata-keyed schema cache; returns
    (frame, schema). Keyed by PATH with the stat tuple stored in the
    value (advice r12): a rewritten table replaces its entry instead
    of accreting one per (mtime, size), so the cache is bounded by the
    number of live tables."""
    stat = _path_stat(path)
    hit = _SCHEMA_CACHE.get(path)
    if hit is not None and hit[0] == stat:
        schema = hit[1]
        return spark.read.schema(schema).parquet(path), schema
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = (stat, df.schema)
    return df, df.schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Column pruning + predicate pushdown come free as
    long as callers select/filter on this lazily (they do) — both are
    pushed through the repartition exchange below, so the split does
    not cost pushdown.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects by default (PARQUET_TYPE_ILLEGAL). We
    read it as a raw long (``nanosAsLong`` — set at runtime so it works
    under any caller's session) and floor-divide to microseconds, which
    is exactly DuckDB's nanos→TIMESTAMP truncation, keeping oracle
    parity. The conversion is a per-row projection — scan pruning and
    pushdown on the other columns are unaffected.

    ``documents``/``embeddings`` are repartitioned to the session's
    parallelism when the scan yields fewer SPLITS (single-row-group
    testdata): shingling/encoding/GEMM on one core of 32 is the local
    bottleneck otherwise. At 100 TB the scan has far more splits than
    cores and the branch never triggers. The split count is estimated
    from file bytes / ``maxPartitionBytes`` in pure Python
    (optimization r12) — the previous ``df.rdd.getNumPartitions()``
    probe materialized a Java RDD per call (~40 ms of driver latency,
    paid by almost every query construction).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df, schema = _read_parquet(spark, path)
        if any(f.name == "ts" and f.dataType.simpleString() == "bigint" for f in schema.fields):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _tz_normalize(df, schema)
    df, schema = _read_parquet(spark, path)
    df = _tz_normalize(df, schema)
    if name in _SPLIT_TABLES:
        par = spark.sparkContext.defaultParallelism
        try:
            max_split = int(
                spark.conf.get("spark.sql.files.maxPartitionBytes")
            )
        except Exception:
            max_split = 128 * 1024 * 1024
        est_splits = max(1, -(-_path_stat(path)[1] // max_split))
        if est_splits < par:
            df = df.repartition(par)
    # Source-identity tag for the index ensure paths (optimization
    # r12): the frame returned HERE is a bare scan of exactly this
    # file, so (path, mtime_ns, size) identifies its content for
    # validity checks. Any transformation returns a new DataFrame
    # object without the tag — derived/filtered frames never
    # impersonate the table.
    df._sg_source_stat = (os.path.realpath(path), *_path_stat(path))
    return df


def fast_count(df: DataFrame) -> int | None:
    """Exact row count from parquet FILE METADATA for a bare
    ``load_table`` frame (identified by its source tag); None for any
    derived frame — the caller then falls back to ``df.count()``. A
    count of an unfiltered table is answered by footers in ~5 ms
    where the Spark job costs ~0.3 s of scheduling (optimization
    r12); the value is identical by the parquet spec."""
    stat = getattr(df, "_sg_source_stat", None)
    if stat is None:
        return None
    import pyarrow.dataset as _pads

    path = stat[0]
    try:
        # Dataset discovery handles nested/partitioned layouts and
        # batches footer metadata reads (advice r12 — the previous
        # top-level-only os.listdir silently UNDERCOUNTED nested
        # layouts); count_rows() without a filter is answered from
        # row-group metadata, never a data scan.
        return int(_pads.dataset(path, format="parquet").count_rows())
    except Exception:
        return None


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query set: first N_QUERY_VECTORS embedding rows (the
    reference takes the first N corpus items / first N queries as its
    working set — ``002-brute_force_similarity.py:133-141``).
    Returns (query_id BIGINT, embedding ARRAY<FLOAT>, label INT)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < N_QUERY_VECTORS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.col("label"),
        )
    )


def qrels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived graded relevance judgments (see module docstring).
    Returns (query_id BIGINT, doc_id BIGINT, relevance INT)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter((F.col("vec_id") < N_QUERY_VECTORS) & (F.col("vec_id") % 7 != 0))
        .select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    )
    d = emb.filter(F.col("vec_id") % 5 == 3).select(
        F.col("vec_id").alias("doc_id"), F.col("label").alias("d_label")
    )
    return (
        F.broadcast(q)  # ≤20 rows at any scale — broadcast, never shuffle
        .join(d, F.col("q_label") == F.col("d_label"))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            (F.lit(1) + F.col("doc_id") % 2).cast("int").alias("relevance"),
        )
    )


# The qrels derivation as DuckDB-compatible ANSI SQL, parameterized
# nowhere — used verbatim inside oracle queries via a WITH clause.
QRELS_SQL = f"""
    SELECT q.vec_id AS query_id,
           d.vec_id AS doc_id,
           CAST(1 + d.vec_id % 2 AS INT) AS relevance
    FROM embeddings q
    JOIN embeddings d ON d.label = q.label
    WHERE q.vec_id < {N_QUERY_VECTORS}
      AND q.vec_id % 7 <> 0
      AND d.vec_id % 5 = 3
      AND d.vec_id <> q.vec_id
"""

QUERY_VECTORS_SQL = f"""
    SELECT vec_id AS query_id, embedding, label
    FROM embeddings
    WHERE vec_id < {N_QUERY_VECTORS}
"""
