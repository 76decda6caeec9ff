"""File-format sources/sinks for the reference's landed data.

Formats (all with EXPLICIT schemas — inference is nondeterministic
and re-scans the data):

- BEIR corpus JSONL (S3/S6): one ``{"_id","title","text","metadata"}``
  object per line — ``000-get_data.py:394-402`` writer,
  ``001-get_embeddings.py:98-106`` reader.
- queries JSONL (S4): ``{"_id","text"}`` per line —
  ``001-get_embeddings.py:112-117``.
- qrels TSV (S5): ``query-id\\tcorpus-id\\tscore`` with a header row —
  ``002-brute_force_similarity.py:80-111``.
- embeddings parquet (S7/S8): the columnar analogue of the
  reference's compressed NPZ (`001:252-275`): explicit join key
  instead of positional alignment, zstd column compression instead
  of ``savez_compressed``.

Scale notes: every reader is a plain distributed scan (splittable
files → per-file/per-block tasks; pushdown + pruning apply to the
parquet path). Writers partition by the DataFrame's partitioning —
callers control file counts with ``repartition``/``coalesce``; none
of these collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("_id", StringType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

QUERIES_SCHEMA = StructType(
    [
        StructField("_id", StringType()),
        StructField("text", StringType()),
    ]
)

# BEIR TSV header names contain '-', kept verbatim (`002:96-103`).
QRELS_SCHEMA = StructType(
    [
        StructField("query-id", StringType()),
        StructField("corpus-id", StringType()),
        StructField("score", IntegerType()),
    ]
)


def load_beir_data(
    spark: SparkSession, root: str, split: str = "dev"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S2: the composite BEIR loader (``000-get_data.py:91-107``) —
    one call returning (corpus, queries, qrels) from the standard
    BEIR layout ``{root}/corpus.jsonl``, ``{root}/queries.jsonl``,
    ``{root}/qrels/{split}.tsv``."""
    import os

    return (
        read_corpus_jsonl(spark, os.path.join(root, "corpus.jsonl")),
        read_queries_jsonl(spark, os.path.join(root, "queries.jsonl")),
        read_qrels_tsv(spark, os.path.join(root, "qrels", f"{split}.tsv")),
    )


def read_corpus_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: corpus JSONL → (doc_id, title, text, metadata)."""
    return (
        spark.read.schema(CORPUS_SCHEMA)
        .json(path)
        .select(
            F.col("_id").alias("doc_id"),
            "title",
            "text",
            "metadata",
        )
    )


def read_queries_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S4: queries JSONL → (query_id, text)."""
    return (
        spark.read.schema(QUERIES_SCHEMA)
        .json(path)
        .select(F.col("_id").alias("query_id"), "text")
    )


def read_qrels_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S5: qrels TSV (header, tab-separated, int-cast score) →
    (query_id, doc_id, relevance) — the relational form the reference
    itself converges to (``000-get_data.py:238-255``)."""
    return (
        spark.read.schema(QRELS_SCHEMA)
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
        .select(
            F.col("`query-id`").alias("query_id"),
            F.col("`corpus-id`").alias("doc_id"),
            F.col("score").alias("relevance"),
        )
    )


def write_corpus_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: land a corpus in BEIR JSONL shape. Expects columns
    (doc_id, title, text, metadata) — the inverse of
    ``read_corpus_jsonl``."""
    (
        df.select(
            F.col("doc_id").cast("string").alias("_id"),
            "title",
            "text",
            "metadata",
        ).write.mode(mode).json(path)
    )


def write_queries_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4 inverse: (query_id, text) → queries JSONL
    (``{"_id","text"}`` per line, ``001-get_embeddings.py:112-117``
    shape) — the missing half that makes ``load_beir_data`` (S2)
    round-trippable end to end."""
    (
        df.select(
            F.col("query_id").cast("string").alias("_id"),
            "text",
        ).write.mode(mode).json(path)
    )


def write_qrels_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 inverse: (query_id, doc_id, relevance) → BEIR TSV."""
    (
        df.select(
            F.col("query_id").cast("string").alias("query-id"),
            F.col("doc_id").cast("string").alias("corpus-id"),
            F.col("relevance").cast("int").alias("score"),
        )
        .write.mode(mode)
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def write_embeddings_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: columnar embeddings sink — (id, embedding ARRAY<FLOAT>, ...)
    with zstd compression (the NPZ ``savez_compressed`` analogue,
    ``001-get_embeddings.py:252-275``; the reference claims 50-70%
    space — zstd on float columns lands in the same range)."""
    df.write.mode(mode).option("compression", "zstd").parquet(path)


def read_embeddings_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S8: embeddings scan (`002:60-67` analogue)."""
    return spark.read.parquet(path)


def write_table_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar sink through Spark's second built-in columnar format
    (ORC, zstd): same compressed-at-rest role as S7's parquet —
    interchange with ORC-based warehouses. Timestamps are stored at
    nanosecond precision, so the round-trip is lossless."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


def read_table_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan twin of S8 — vectorized reader, predicate pushdown
    and column pruning as with parquet."""
    return spark.read.orc(path)
