"""Source/sink round-trip queries (S3-S8 verification).

Each query WRITES a selection through a reference file format and
reads it back; the oracle is the original selection, so a green row
proves lossless round-trip through that format (schema handling,
escaping, casts) — not just that the writer didn't crash.

Artifacts land under ``.artifacts/roundtrip/`` inside the repo
(mode=overwrite, fixed paths → no unbounded growth). The read-back
DataFrame stays valid for the caller's later collect because the
files persist until the next overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark import sources as src
from inside_vectordb_spark.functions.vector import l2_norm
from inside_vectordb_spark.registry import register

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".artifacts")


def _rt_path(name: str, sf_dir: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/")) or "default"
    return os.path.join(_ART, "roundtrip", f"{name}_{sf}")


@register(
    "jsonl_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S6: documents → BEIR corpus JSONL → read back. The free
    ``metadata`` map carries the non-BEIR columns (the reference's
    metadata dict is exactly this escape hatch, ``000:400``)."""
    docs = (
        eio.load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.lit("").alias("title"),
            "text",
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("metadata"),
        )
    )
    path = _rt_path("corpus_jsonl", sf_dir)
    src.write_corpus_jsonl(docs, path)
    back = src.read_corpus_jsonl(spark, path)
    return back.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "text",
        F.col("metadata")["lang"].alias("lang"),
        F.col("metadata")["source"].alias("source"),
    )


@register("qrels_tsv_roundtrip", oracle=eio.QRELS_SQL)
def qrels_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: derived qrels → BEIR TSV (header, tab, int score) → read
    back through the TSV parser (``002:80-111`` semantics)."""
    path = _rt_path("qrels_tsv", sf_dir)
    src.write_qrels_tsv(eio.qrels(spark, sf_dir), path)
    back = src.read_qrels_tsv(spark, path)
    return back.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("relevance").cast("int").alias("relevance"),
    )


@register(
    "embeddings_parquet_roundtrip",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS norm
    FROM embeddings WHERE vec_id % 4 = 1
    """,
)
def embeddings_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+S8: embeddings → zstd parquet → read back; the norm check
    proves float32 vectors survive bit-exactly (parquet is lossless;
    the rounded norm is the hash-stable witness)."""
    emb = eio.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 1)
    path = _rt_path("embeddings_parquet", sf_dir)
    src.write_embeddings_parquet(emb, path)
    back = src.read_embeddings_parquet(spark, path)
    return back.select(
        "vec_id", "label", F.round(l2_norm("embedding"), 6).alias("norm")
    )
