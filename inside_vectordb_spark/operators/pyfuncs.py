"""The remaining Python-function execution surfaces: scalar
``pandas_udf``, grouped-aggregate ``pandas_udf``, and the Spark-4
Python UDTF — completing the engine's UDF taxonomy next to the
grouped-map (``operators/grouped.py``), flat-map (``mapInPandas``
throughout), and stateful-streaming (``streaming/stateful.py``)
members (reference's only UDF-shaped operator is F4 batch encode,
``002:74-118``; everything here is beyond-reference API surface).

Each function exists as the SLOW-PATH twin of a Catalyst expression
that computes the same thing — the point is to pin the execution
surface (Arrow batch transfer, schema contracts, grouped-agg
semantics) with a full value-hash oracle, not to put Python in any
hot path. Scale notes per member:

- scalar pandas_udf: Arrow-vectorized, narrow (no shuffle); batch
  size bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
- grouped-agg pandas_udf: runs map-side partial? NO — grouped-agg
  ships each group's column to one executor (full shuffle of the
  aggregated column, no partial aggregation). That is exactly why
  the Catalyst twin wins at scale and why the docstring of the
  registered query says so out loud.
- UDTF: row-at-a-time lateral generator; use only where the
  row-expansion logic genuinely needs imperative Python.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def _l2_norm_pandas(v: pd.Series) -> pd.Series:
    """Sequential-order L2 norm per row. sum(x*x) is accumulated in
    list order (math.fsum would round differently from the engines'
    naive sequential sum; a BLAS dot may reorder) so the 6-dp rounded
    value matches Catalyst's aggregate() fold and DuckDB's
    list_dot_product bit-for-bit."""

    def norm(arr) -> float:
        acc = 0.0
        for x in arr:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    return v.map(norm)


def embedding_norms_pandas(emb: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """(vec_id, l2_norm): scalar pandas_udf surface, rounded 6 dp."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(_l2_norm_pandas(F.col(vec_col).cast("array<double>")), 6).alias(
            "l2_norm"
        ),
    )


@pandas_udf(DoubleType())
def _mean_norm_grouped(v: pd.Series) -> float:
    """GROUPED_AGG pandas_udf: mean of per-row sequential L2 norms
    within the group (whole group's column arrives as one Series)."""
    acc = 0.0
    n = 0
    for arr in v:
        s = 0.0
        for x in arr:
            s += float(x) * float(x)
        acc += math.sqrt(s)
        n += 1
    return acc / n if n else float("nan")


@pandas_udf("long")
def _count_grouped(v: pd.Series) -> int:
    """Companion grouped-agg count: Spark disallows mixing a
    grouped-agg pandas UDF with non-pandas aggregates in one agg(),
    so the count rides the same execution surface."""
    return len(v)


def label_mean_norm_pandas(emb: DataFrame, label_col: str = "label",
                           vec_col: str = "embedding") -> DataFrame:
    """(label, mean_norm, n_vectors): grouped-aggregate pandas_udf
    surface. NOTE the scale contract stated in the module docstring:
    grouped-agg pandas UDFs get NO map-side partial aggregation — the
    whole group's column crosses the shuffle."""
    return (
        emb.groupBy(F.col(label_col).alias("label"))
        .agg(
            F.round(
                _mean_norm_grouped(F.col(vec_col).cast("array<double>")), 6
            ).alias("mean_norm"),
            _count_grouped(F.col(label_col)).alias("n_vectors"),
        )
        .orderBy("label")
    )


@udtf(returnType="chunk_idx: int, chunk_text: string, n_words: int")
class _ChunkUDTF:
    """Python UDTF (Spark 4 lateral generator): split a document into
    fixed-width word chunks. The imperative twin of the Catalyst
    slice-based ``doc_chunks``; emits one row per chunk."""

    def eval(self, text: str, width: int):
        words = [w for w in (text or "").strip().split() if w]
        for i in range(0, len(words), width):
            chunk = words[i : i + width]
            yield i // width, " ".join(chunk), len(chunk)


def doc_chunks_udtf(spark, docs: DataFrame, width: int = 32) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_words) via the UDTF lateral
    join surface. Scale note: UDTFs execute row-at-a-time in Python —
    the Catalyst ``doc_chunks`` (slice/transform expressions) is the
    production path; this pins the API surface with the same oracle
    shape.

    The view and UDTF names are per-call unique (review r9-5): fixed
    session-global names let a second caller's
    ``createOrReplaceTempView`` between this call's registration and
    its ``spark.sql`` re-point the lateral join at the OTHER caller's
    documents, and silently clobbered any user object of the same
    name. The lazy plan resolves the view at sql() time, which is why
    the race window was real; unique names close it. Both temporaries
    are dropped once the returned plan is resolved (the plan holds
    its own references) — without the function drop, repeated calls
    grew the session function registry unboundedly (advice r10).
    The resolve-then-drop step relies on classic PySpark's EAGER
    analysis at sql() time; under Spark Connect (lazy analysis) the
    drops would have to move to after the first action instead."""
    import uuid

    tag = uuid.uuid4().hex[:12]
    fn_name = f"word_chunks_{tag}"
    view = f"__udtf_docs_{tag}"
    spark.udtf.register(fn_name, _ChunkUDTF)
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM {view} d,
             LATERAL {fn_name}(d.text, {int(width)}) c
        """
    )
    spark.catalog.dropTempView(view)
    spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fn_name}")
    return out
