"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers here as a named query ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, a DuckDB oracle returning the
same rows/schema (CORRECTNESS gate, ``__spark_entry__.py``).

Conventions (FIXTURES.md §6):
- every float output rounded to 6 decimals on BOTH sides;
- deterministic tie-breaks everywhere (id ASC);
- INT vs BIGINT casts aligned between engines;
- array outputs serialized to strings for stable hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        # explicit raise, not assert (review r9-5): under python -O a
        # duplicate register() silently replaced the query while a
        # stale oracle for the OLD implementation could survive in
        # ORACLES — the gate would then compare the new query against
        # the wrong oracle instead of failing fast at import
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Submodules populate the registry on import.
from inside_vectordb_spark.registry import core  # noqa: E402,F401
from inside_vectordb_spark.registry import relational  # noqa: E402,F401
from inside_vectordb_spark.registry import pipeline  # noqa: E402,F401
from inside_vectordb_spark.registry import ann  # noqa: E402,F401
from inside_vectordb_spark.registry import embed  # noqa: E402,F401
from inside_vectordb_spark.registry import sources  # noqa: E402,F401
from inside_vectordb_spark.registry import compare  # noqa: E402,F401
from inside_vectordb_spark.registry import streaming  # noqa: E402,F401
from inside_vectordb_spark.registry import multimodal  # noqa: E402,F401
from inside_vectordb_spark.registry import analytics  # noqa: E402,F401
from inside_vectordb_spark.registry import traindata  # noqa: E402,F401
from inside_vectordb_spark.registry import pyfuncs  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
