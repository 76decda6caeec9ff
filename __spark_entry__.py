"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``inside_vectordb_spark/``; the registry
(``inside_vectordb_spark/registry``) is the single source of truth
for the query/oracle inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from inside_vectordb_spark.operators.topk import exact_cosine_topk
from inside_vectordb_spark.registry import ORACLES, QUERIES
from inside_vectordb_spark import io as eio


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact cosine top-10 similarity search over the
    sf0.001 embeddings (the reference's core operator,
    ``002-brute_force_similarity.py:170-228``, as one DataFrame plan)."""
    sf_dir = "/root/testdata/sf0.001"
    return exact_cosine_topk(
        eio.query_vectors(spark, sf_dir),
        eio.load_table(spark, sf_dir, "embeddings"),
        k=10,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query."""
    return dict(ORACLES)
