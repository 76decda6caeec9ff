"""Python-function execution surfaces (operators/pyfuncs.py): scalar
pandas_udf, grouped-aggregate pandas_udf, and the Spark-4 Python
UDTF, each with a full DuckDB oracle — the taxonomy-completing
members next to grouped-map/flat-map/stateful (already registered
elsewhere). Each docstring states why the Catalyst twin is the
production path at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.registry import register


@register(
    "embedding_norms_pandas_udf",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6)
               AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR pandas_udf surface: per-row L2 norm computed in Python
    over Arrow batches, hash-matched against the engines' sequential
    sums (the UDF accumulates in list order for exactly that reason).
    Narrow plan — no shuffle; the Catalyst
    ``sqrt(aggregate(...))`` expression is the production twin
    (functions/vector.py:l2_norm), this pins the Arrow-batch
    execution surface itself."""
    from inside_vectordb_spark.operators.pyfuncs import embedding_norms_pandas

    return embedding_norms_pandas(eio.load_table(spark, sf_dir, "embeddings"))


@register(
    "label_mean_norm_pandas_udf",
    oracle="""
    SELECT label,
           round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6)
               AS mean_norm,
           count(*) AS n_vectors
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def label_mean_norm_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED-AGGREGATE pandas_udf surface: per-label mean embedding
    norm where the whole group's column arrives as one pandas Series.
    The scale contract this query exists to document: grouped-agg
    pandas UDFs get NO map-side partial aggregation — every group's
    full column crosses the shuffle — so the Catalyst
    ``avg(sqrt(aggregate(...)))`` twin (which partial-aggregates) is
    the production path; this pins the semantics and the Arrow group
    transfer with a value hash."""
    from inside_vectordb_spark.operators.pyfuncs import label_mean_norm_pandas

    return label_mean_norm_pandas(eio.load_table(spark, sf_dir, "embeddings"))


@register(
    "doc_chunks_udtf",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+'),
                         t -> t <> '') AS t
      FROM documents WHERE doc_id < 40),
    chunks AS (
      SELECT doc_id,
             CAST(i AS INT) AS chunk_idx,
             array_to_string(t[(i*32+1):(i*32+32)], ' ') AS chunk_text,
             CAST(least(32, len(t) - i*32) AS INT) AS n_words
      FROM toks
      CROSS JOIN UNNEST(range(0, CAST(ceil(len(t) / 32.0) AS INT))) AS u(i))
    SELECT doc_id, chunk_idx, chunk_text, n_words FROM chunks
    """,
)
def doc_chunks_udtf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 lateral generator): fixed-width
    non-overlapping word chunking as a table function, LATERAL-joined
    per document. Bounded to a 40-doc slice on purpose: UDTFs run
    row-at-a-time in Python, and the registered query's job is to pin
    the UDTF execution surface (registration, lateral join, schema
    contract) — the Catalyst slice/transform ``doc_chunks`` is the
    corpus-scale path."""
    from inside_vectordb_spark.operators.pyfuncs import doc_chunks_udtf

    docs = eio.load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return doc_chunks_udtf(spark, docs, width=32)
