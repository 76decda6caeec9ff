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
from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.registry import register

_ART = mio.artifacts_root()


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
    "beir_roundtrip",
    oracle=f"""
    WITH qr AS ({eio.QRELS_SQL})
    SELECT 'corpus' AS rel, doc_id AS id1, CAST(-1 AS BIGINT) AS id2,
           text AS val
    FROM documents WHERE doc_id % 10 = 5
    UNION ALL
    SELECT 'queries' AS rel, doc_id AS id1, CAST(-1 AS BIGINT) AS id2,
           text AS val
    FROM documents WHERE doc_id % 17 = 3
    UNION ALL
    SELECT 'qrels' AS rel, query_id AS id1, doc_id AS id2,
           CAST(relevance AS VARCHAR) AS val
    FROM qr
    """,
)
def beir_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 end to end: land a full BEIR layout (corpus JSONL + queries
    JSONL + qrels/dev.tsv) and read it back through the composite
    ``load_beir_data`` loader (``000-get_data.py:91-107``). The result
    unions a tagged projection of all three relations, so a green row
    proves the whole layout — paths, schemas, escaping, casts —
    round-trips losslessly in one driver check. ``-1`` stands in for
    NULL in ``id2`` to keep both engines' pandas dtypes integral
    (hash-stable)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 == 5).select(
        "doc_id",
        F.lit("").alias("title"),
        "text",
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("metadata"),
    )
    queries_df = docs.filter(F.col("doc_id") % 17 == 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    root = _rt_path("beir", sf_dir)
    src.write_corpus_jsonl(corpus, os.path.join(root, "corpus.jsonl"))
    src.write_queries_jsonl(queries_df, os.path.join(root, "queries.jsonl"))
    src.write_qrels_tsv(eio.qrels(spark, sf_dir), os.path.join(root, "qrels", "dev.tsv"))
    c_back, q_back, r_back = src.load_beir_data(spark, root, split="dev")
    neg1 = F.lit(-1).cast("bigint")
    return (
        c_back.select(
            F.lit("corpus").alias("rel"),
            F.col("doc_id").cast("bigint").alias("id1"),
            neg1.alias("id2"),
            F.col("text").alias("val"),
        )
        .unionAll(
            q_back.select(
                F.lit("queries").alias("rel"),
                F.col("query_id").cast("bigint").alias("id1"),
                neg1.alias("id2"),
                F.col("text").alias("val"),
            )
        )
        .unionAll(
            r_back.select(
                F.lit("qrels").alias("rel"),
                F.col("query_id").cast("bigint").alias("id1"),
                F.col("doc_id").cast("bigint").alias("id2"),
                F.col("relevance").cast("string").alias("val"),
            )
        )
    )


@register(
    "orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           round(o_totalprice, 6) AS total_price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders selection → zstd ORC → read back: proves the engine's
    second built-in columnar format (warehouse interchange) preserves
    bigint / varchar / double / timestamp losslessly. The timestamp is
    re-projected as a formatted string for hash-stable comparison."""
    sel = eio.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 0
    )
    path = _rt_path("orders_orc", sf_dir)
    src.write_table_orc(sel, path)
    back = src.read_table_orc(spark, path)
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 6).alias("total_price"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
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


@register(
    "partitioned_layout_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE lang = 'en'
    """,
)
def partitioned_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout: documents written
    ``PARTITIONED BY (lang)`` (the 100 TB landing-zone practice —
    directory-level pruning beats row-group stats because unmatched
    partitions are never even listed), then read back with a
    partition filter. ``tests/test_plans.py`` pins that the filter
    lands in PartitionFilters (zero data files read for other
    langs); the oracle is the plain predicate on the original table."""
    docs = eio.load_table(spark, sf_dir, "documents")
    path = _rt_path("partitioned_docs", sf_dir)
    (
        docs.write.mode("overwrite")
        .partitionBy("lang")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.select("doc_id", "lang", "source", "n_chars")


@register(
    "zorder_layout_roundtrip",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM events
    WHERE user_id BETWEEN 40 AND 60
      AND extract(hour FROM ts) BETWEEN 9 AND 17
    GROUP BY 1
    """,
)
def zorder_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustered layout: events rewritten along the
    Z-curve of (user_id, hour-of-day), then queried back with a 2-D
    predicate. A single-column sort tightens min-max stats for one
    column only; the interleaved key makes BOTH columns' file/row-group
    ranges narrow, so either predicate skips most data — Delta/Iceberg
    ``ZORDER BY`` semantics on plain parquet.
    ``tests/test_sources.py`` asserts the skipping property itself
    (per-file value spreads shrink vs the unclustered layout); the
    oracle is the same predicate on the raw table (layout is
    semantics-free)."""
    from inside_vectordb_spark.operators.layout import zorder_write

    ev = eio.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", F.hour("ts").alias("hod")
    )
    path = _rt_path("zorder_events", sf_dir)
    zorder_write(ev, path, "user_id", "hod", n_files=8)
    back = spark.read.parquet(path).filter(
        F.col("user_id").between(40, 60) & F.col("hod").between(9, 17)
    )
    return back.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@register(
    "compaction_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    """,
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (Delta OPTIMIZE analogue): documents are
    deliberately fragmented into 64 tiny parquet files, then compacted
    into ~8 MB target files via scan bin-packing — NO shuffle in the
    rewrite plan (operators/layout.py:compact_small_files). The oracle
    is the original table (compaction is semantics-free);
    tests/test_sources.py pins the file-count collapse itself."""
    from inside_vectordb_spark.operators.layout import compact_small_files

    docs = eio.load_table(spark, sf_dir, "documents")
    frag = _rt_path("frag_docs", sf_dir)
    compacted = _rt_path("compact_docs", sf_dir)
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    compact_small_files(spark, frag, compacted, target_file_bytes=8 << 20)
    return spark.read.parquet(compacted).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "schema_evolution_roundtrip",
    oracle="""
    SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1
    """,
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a landing zone: batch 1 lands with the
    original (doc_id, lang) schema, batch 2 lands with an ADDED
    n_chars column into the same directory; ``mergeSchema`` read
    reconciles — old rows surface NULL for the new column, no rewrite
    of historical files (the add-column path every lakehouse format
    guarantees is metadata-only). The oracle states exactly that
    reconciliation."""
    docs = eio.load_table(spark, sf_dir, "documents")
    path = _rt_path("schema_evo", sf_dir)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "append"
    ).parquet(path)
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    ).write.mode("append").parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "bucketed_join_roundtrip",
    oracle="""
    SELECT d.lang, e.label, count(*) AS n
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-bucketed join: both tables land bucketed by the join key
    (the write-once pre-shuffle), then join + aggregate with ZERO
    runtime Exchange on the join (tests/test_bucketing.py pins the
    plan; at 100 TB this converts every repeated equi-join from a
    full-table shuffle into partition-to-partition streaming). The
    oracle is the plain declarative join — bucketing must be
    semantics-free."""
    from inside_vectordb_spark.operators.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    docs = eio.load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = eio.load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    sf = (os.path.basename(sf_dir.rstrip("/")) or "default").replace(".", "_")
    t_docs, t_emb = f"rt_docs_{sf}", f"rt_emb_{sf}"
    write_bucketed(
        docs.withColumnRenamed("doc_id", "vec_id"), t_docs, "vec_id", n_buckets=8
    )
    write_bucketed(emb, t_emb, "vec_id", n_buckets=8)
    return (
        read_bucketed(spark, t_docs)
        .join(read_bucketed(spark, t_emb), "vec_id")
        .groupBy("lang", "label")
        .agg(F.count("*").alias("n"))
    )


@register(
    "jsonl_pyds_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def jsonl_pyds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 PYTHON DataSource surface (S3 via the plug-in API):
    documents → BEIR corpus JSONL (native writer) → read back through
    the registered custom ``jsonl_corpus`` Python data source
    (``sources/pyds.py`` — schema declaration, one InputPartition per
    file, per-task streaming parse). Shares the round-trip oracle
    discipline: a green hash proves the custom source reproduces the
    original selection losslessly. The JVM-native JSONL reader
    (``jsonl_roundtrip``) stays the production path; this pins the
    extension point a format Spark lacks would actually use."""
    from inside_vectordb_spark.sources.pyds import register_jsonl_corpus_source

    docs = (
        eio.load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.lit("").alias("title"),
            "text",
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("metadata"),
        )
    )
    path = _rt_path("corpus_jsonl_pyds", sf_dir)
    src.write_corpus_jsonl(docs, path)
    register_jsonl_corpus_source(spark)
    back = spark.read.format("jsonl_corpus").load(path)
    # the source yields `_id` as STRING (BEIR-faithful: real corpus
    # ids are often non-numeric); this fixture's ids are numeric, so
    # the cast back to the documents key type is exact
    return back.select(
        F.col("_id").cast("long").alias("doc_id"),
        "text",
        F.col("metadata")["lang"].alias("lang"),
        F.col("metadata")["source"].alias("source"),
    )
