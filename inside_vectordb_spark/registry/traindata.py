"""Training-data preparation registry: span dedup, exact-n-gram
decontamination, splits, weighted sampling, batch packing, k-means.

Every query has a full DuckDB oracle: all randomness is md5
arithmetic, all float outputs are rounded to 6 decimals on both
sides, and k-means runs in fixed-point so both engines agree
bit-for-bit (operators/traindata.py docstrings carry the plan-shape
notes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators import traindata as td
from inside_vectordb_spark.registry import register

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

# ---------------------------------------------------------------------------
# Span-level dedup (C4/Lee-et-al. shape; spans = 10-word windows)
# ---------------------------------------------------------------------------


@register(
    "span_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE {_TOKS} END AS t
      FROM documents),
    carr AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(t) / 10.0) AS INT)),
                i -> array_to_string(t[(i*10+1):(i*10+10)], ' ')) AS chunks
      FROM toks),
    occ AS (
      SELECT doc_id,
             generate_subscripts(chunks, 1) - 1 AS pos,
             unnest(chunks) AS chunk
      FROM carr),
    ranked AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, pos) AS rn
      FROM occ),
    reb AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
             string_agg(chunk, ' ' ORDER BY pos) AS text_clean
      FROM ranked WHERE rn = 1 GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_chunks
            FROM occ GROUP BY doc_id)
    SELECT t.doc_id, t.n_chunks,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.text_clean, '') AS text_clean
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
)
def span_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global span-level exact dedup: 10-word spans kept only at their
    first corpus occurrence, documents rebuilt from survivors — the
    C4 line-dedup shape for line-less text."""
    return td.span_dedup(eio.load_table(spark, sf_dir, "documents"), width=10)


# ---------------------------------------------------------------------------
# Exact n-gram decontamination (GPT-3 appendix-C rule; 4-grams here)
# ---------------------------------------------------------------------------


@register(
    "decontamination_ngram",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len({_TOKS}) - 3, 0) + 1),
          i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1],
                         {_TOKS}[i+2], {_TOKS}[i+3]))) AS grams
      FROM documents),
    ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
    tre AS (SELECT doc_id, CAST(len(grams) AS INT) AS n_grams,
                   unnest(grams) AS gram
            FROM g WHERE doc_id % 97 <> 0)
    SELECT t.doc_id, t.n_grams, CAST(count(*) AS INT) AS n_colliding
    FROM tre t JOIN ev USING (gram) GROUP BY 1, 2
    """,
)
def decontamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-overlap decontamination: flag any training doc sharing a
    word 4-gram with the held-out slice (doc_id % 97 == 0, the same
    benchmark stand-in as `decontamination`) — the any-collision rule,
    stricter than the 5% ratio gate."""
    docs = eio.load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return td.ngram_decontaminate(train, bench, n=4)


# ---------------------------------------------------------------------------
# Deterministic split / weighted sample / batch packing
# ---------------------------------------------------------------------------


@register(
    "dataset_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                      1, 8))::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                      1, 8))::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 hash-bucketed train/val/test assignment — a pure
    function of doc_id, so stable under reruns and corpus growth."""
    return td.dataset_split(eio.load_table(spark, sf_dir, "documents"))


@register(
    "weighted_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
             round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':aes'),
                        1, 8))::BIGINT % 1000000 + 1) / 1000001.0)
                   / CAST(n_chars AS DOUBLE), 6) AS key
      FROM documents)
    SELECT doc_id, weight, key FROM r ORDER BY key DESC, doc_id LIMIT 50
    """,
)
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sample without replacement:
    top-50 by ln(u)/weight exponential keys, weight = n_chars.
    Catalyst plans the top-k as TakeOrderedAndProject (per-partition
    heaps, no global sort)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    return td.weighted_sample(docs, F.col("n_chars"), k=50)


@register(
    "length_bucketed_batches",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len({_TOKS}) END AS n_tokens
      FROM documents),
    b2 AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                  CAST(length(bin(greatest(n_tokens, 1))) AS INT) AS bucket
           FROM base),
    rb AS (SELECT *,
                  CAST((row_number() OVER (PARTITION BY bucket
                                           ORDER BY doc_id) - 1) // 32 AS INT)
                      AS batch_id
           FROM b2)
    SELECT bucket, batch_id, CAST(count(*) AS INT) AS n_docs,
           min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
           round(1.0 - sum(n_tokens) / CAST(count(*) * max(n_tokens) AS DOUBLE),
                 6) AS padding_frac
    FROM rb GROUP BY 1, 2
    """,
)
def length_bucketed_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment (pad-to-longest waste audit):
    ⌊log2⌋ token buckets, 32-doc batches in doc_id order."""
    return td.length_bucketed_batches(
        eio.load_table(spark, sf_dir, "documents"), batch_size=32
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd k-means (fixed-point; k=8, 2 iterations, dim=64)
# ---------------------------------------------------------------------------

_KM_DIST = "round(list_sum(list_transform(range(1, 65), i -> (e.v[i] - c.c[i]) ^ 2)), 6)"

_KM_ORACLE = f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000, 0)) AS v
      FROM embeddings),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
             v AS c
      FROM e ORDER BY vec_id LIMIT 8),
    d1 AS (
      SELECT e.vec_id, c.cluster, e.v, {_KM_DIST} AS dist
      FROM e CROSS JOIN c0 c),
    a1 AS (
      SELECT vec_id, cluster, v FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cluster) AS rn FROM d1)
      WHERE rn = 1),
    x1 AS (SELECT cluster, generate_subscripts(v, 1) AS pos, unnest(v) AS val
           FROM a1),
    c1 AS (SELECT cluster, pos, round(avg(val), 6) AS val
           FROM x1 GROUP BY 1, 2),
    c1l AS (SELECT cluster, list(val ORDER BY pos) AS c FROM c1 GROUP BY cluster),
    d2 AS (
      SELECT e.vec_id, c.cluster, e.v, {_KM_DIST} AS dist
      FROM e CROSS JOIN c1l c),
    a2 AS (
      SELECT vec_id, cluster, v FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cluster) AS rn FROM d2)
      WHERE rn = 1),
    x2 AS (SELECT cluster, generate_subscripts(v, 1) AS pos, unnest(v) AS val
           FROM a2),
    c2 AS (SELECT cluster, pos, round(avg(val), 6) AS val
           FROM x2 GROUP BY 1, 2),
    sz AS (SELECT cluster, CAST(count(*) AS INT) AS size FROM a2
           GROUP BY cluster)
    SELECT c2.cluster, CAST(c2.pos - 1 AS INT) AS pos,
           round(c2.val, 6) AS centroid, sz.size
    FROM c2 JOIN sz USING (cluster)
"""


@register("kmeans_lloyd", oracle=_KM_ORACLE)
def kmeans_lloyd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distributed Lloyd iterations over the embeddings (k=8,
    fixed-point quantization ×1000, init = 8 lowest vec_ids): domain
    clustering for mixture weighting. Centroids broadcast into the
    assignment join; updates are map-side partial sums — the MLlib
    KMeans distribution shape, stated declaratively and verified
    against an unrolled-CTE DuckDB twin."""
    return td.kmeans_lloyd(
        eio.load_table(spark, sf_dir, "embeddings"), k=8, iters=2
    )
