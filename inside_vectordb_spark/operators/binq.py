"""Binary quantization ANN: 1 bit per dimension, Hamming-distance
candidate generation, exact cosine rerank.

The fourth compression tier beside IVF (partition pruning), PQ
(subspace codes) and SQ8 (int8): each dimension keeps only the sign
relative to its corpus mean, packed 32 bits to a BIGINT word — a
64-d embedding becomes TWO longs (32× less I/O than float64 math
width; the representation behind FAISS's IndexBinaryFlat and the
recent RaBitQ-style "binary first-pass" rankers).

Everything is Catalyst integer arithmetic: pack = Σ bit·2^(pos mod 32)
(one posexplode + groupBy), distance = Σ over words of
``bit_count(a XOR b)`` — whole-stage codegen, no UDF, and EXACT
integers end-to-end, so the whole pipeline (means → bits → packed
words → Hamming top-candidates → cosine rerank) is restated
bit-for-bit in DuckDB SQL: a full value-hash oracle over an ANN tier.

Scale shape: the packed-words relation is the index (2 longs per
vector — persistable exactly like the SQ codes table); queries
broadcast into it, Hamming partial-sums combine map-side per
(query, doc), and only k·refine candidates per query reach the
raw-vector rerank join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.vector import as_double_array

WORD_BITS = 32  # bits packed per BIGINT word (no sign-bit overflow)


def _packed_words(
    df: DataFrame, means: DataFrame, id_out: str, id_col: str, vec_col: str
) -> DataFrame:
    """(id, half, word): sign bits vs per-dim mean, packed 32/word.
    bit·2^(pos mod 32) stays exact in the double→bigint cast because
    2^31 < 2^52."""
    pv = df.select(
        F.col(id_col).alias(id_out),
        F.posexplode(as_double_array(vec_col)).alias("pos", "val"),
    )
    bit = (F.col("val") > F.col("mu")).cast("bigint")
    term = bit * F.pow(F.lit(2.0), (F.col("pos") % WORD_BITS)).cast("bigint")
    return (
        # broadcast by construction: ``means`` is exactly ``dim`` rows
        # (≤ a few thousand), but the aggregate output has no size
        # stats at planning, so without the hint the corpus-rows × dim
        # exploded relation hash-partitions onto at most ``dim`` keys
        # — the skew shape the repo audits against — and only AQE
        # might rescue it at runtime (review r9-5; matches the qw
        # broadcast below)
        pv.join(F.broadcast(means), "pos")
        .select(
            id_out,
            (F.col("pos") / WORD_BITS).cast("int").alias("half"),
            term.alias("term"),
        )
        .groupBy(id_out, "half")
        .agg(F.sum("term").alias("word"))
    )


def ann_binary_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    refine: int = 5,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Binary-quantized search: Hamming top ``k·refine`` candidates
    (ties: doc_id ASC), exact cosine rerank to top-k."""
    from inside_vectordb_spark.operators.ann import _rerank_candidates

    means = (
        corpus.select(F.posexplode(as_double_array(corpus_vec)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("mu"))
    )
    cw = _packed_words(corpus, means, "doc_id", corpus_id, corpus_vec)
    qw = _packed_words(queries, means, "query_id", query_id, query_vec).select(
        "query_id", "half", F.col("word").alias("__qword")
    )
    ham = (
        cw.join(F.broadcast(qw), "half")
        .select(
            "query_id",
            "doc_id",
            F.bit_count(F.col("word").bitwiseXOR(F.col("__qword"))).alias("__h"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__h").alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("doc_id"))
    cand = (
        ham.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * refine)
        .select("query_id", "doc_id")
    )
    return _rerank_candidates(
        cand, queries, corpus, query_id, query_vec, corpus_id, corpus_vec, k, round_to
    )


def binary_oracle_sql(n_queries: int, k: int, refine: int) -> str:
    """DuckDB twin of the full chain — means, packed words, Hamming
    via bit_count(xor), candidate window, exact cosine rerank."""
    return f"""
    WITH pv AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    means AS (SELECT pos, avg(val) AS mu FROM pv GROUP BY pos),
    words AS (
      -- pos // {WORD_BITS}: integer floor division. CAST(pos/{WORD_BITS} AS INT)
      -- would be float division + round-half-to-even in DuckDB
      -- (CAST(48/32 AS INT) = 2), diverging from Spark's truncating
      -- (pos/{WORD_BITS}).cast('int') for any dim > 80 (review r7)
      SELECT pv.vec_id, CAST(pv.pos // {WORD_BITS} AS INT) AS half,
             CAST(sum(CASE WHEN pv.val > m.mu THEN
               CAST(power(2, pv.pos % {WORD_BITS}) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS word
      FROM pv JOIN means m USING (pos)
      GROUP BY 1, 2),
    qw AS (SELECT vec_id AS query_id, half, word FROM words
           WHERE vec_id < {n_queries}),
    ham AS (
      SELECT q.query_id, c.vec_id AS doc_id,
             CAST(sum(bit_count(xor(q.word, c.word))) AS BIGINT) AS hamming
      FROM qw q JOIN words c USING (half)
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY hamming ASC, doc_id ASC) AS r
        FROM ham) WHERE r <= {k * refine}),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {n_queries}),
    scored AS (
      SELECT c.query_id, c.doc_id,
             list_dot_product(q.qe, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))) AS score
      FROM cand c
      JOIN qv q USING (query_id)
      JOIN embeddings e ON e.vec_id = c.doc_id),
    ranked AS (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM scored)
    SELECT query_id, doc_id, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """
