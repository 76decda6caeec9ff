"""Scalar quantization (SQ8): int8 vector compression + ANN search.

The third compression tier next to IVF (partition pruning) and PQ
(subspace codes): each dimension is affinely mapped to an 8-bit code
using corpus-wide per-dimension min/max — 4× less I/O than float32
(32× less than the float64 math width) with far higher fidelity than
PQ. FAISS ships the same idea as ``IndexScalarQuantizer(QT_8bit)``;
the reference's FAISS study (``004-faiss_demo.py:84-156``) stops at
HNSWFlat, so this is the scale path it would reach for next.

Unlike PQ's ADC (a Python/Arrow kernel), every SQ step — train,
encode, decode, approximate scoring — is plain Catalyst arithmetic
(``zip_with``/``aggregate`` over array columns, whole-stage codegen),
which makes this the ONLY ANN tier whose entire pipeline is
restatable in DuckDB SQL: ``ann_sq_topk`` carries a FULL value-hash
oracle, not a rows-only check.

Determinism contract with the oracle: both engines compute
``code = least(255, floor(((v - mn) / span) * 256))`` and
``v̂ = mn + (code + 0.5) * span / 256`` in DOUBLE with the same
operation order, and cosine as ``dot/(|a|·|b|)`` with strict
sequential folds — the same bit-stability bet every exact-search
oracle in this repo already makes (registry/core.py ``_COS``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.vector import (
    as_double_array,
    cosine_similarity,
)


def sq_train(
    corpus: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, span) over the corpus — one posexplode +
    groupBy(pos) aggregation (map-side partial min/max, d rows out),
    collected to the driver (d is small; 2·d doubles)."""
    rows = (
        corpus.select(F.posexplode(as_double_array(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")  # same message as kmeans_centroids
    dim = max(r["pos"] for r in rows) + 1
    mins = np.zeros(dim, dtype=np.float64)
    spans = np.zeros(dim, dtype=np.float64)
    for r in rows:
        mins[r["pos"]] = r["mn"]
        spans[r["pos"]] = r["mx"] - r["mn"]
    return mins, spans


def _lit_array(vals: np.ndarray) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq_encode_col(vec: Column | str, mins: np.ndarray, spans: np.ndarray) -> Column:
    """array<float> → array<int> codes in [0, 255], pure Catalyst.
    A zero-span (constant) dimension encodes to 0."""
    shifted = F.zip_with(as_double_array(vec), _lit_array(mins), lambda x, m: x - m)
    return F.zip_with(
        shifted,
        _lit_array(spans),
        lambda t, s: F.when(s == 0.0, F.lit(0))
        .otherwise(F.least(F.lit(255.0), F.floor((t / s) * 256.0)))
        .cast("int"),
    )


def sq_decode_col(codes: Column | str, mins: np.ndarray, spans: np.ndarray) -> Column:
    """codes → reconstructed array<double>: bucket midpoint
    ``mn + (code + 0.5) * span / 256`` (a zero-span dim reconstructs
    its min exactly... plus span·0.5/256 = 0, i.e. the constant)."""
    c = F.col(codes) if isinstance(codes, str) else codes
    scaled = F.zip_with(
        c, _lit_array(spans), lambda code, s: (code.cast("double") + 0.5) * s / 256.0
    )
    return F.zip_with(scaled, _lit_array(mins), lambda t, m: m + t)


def ann_sq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    refine: int = 5,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
    stats: tuple[np.ndarray, np.ndarray] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """SQ8 search: approximate cosine over decoded int8 codes (the
    full scan reads 1 byte/dim instead of 4 — the I/O win), keep
    ``k·refine`` candidates per query, exact-rerank on raw vectors.

    ``stats``/``codes`` let the persisted-index path inject stored
    artifacts (see operators/ann_index.py:build_sq_index); by default
    both derive from ``corpus``. Scale shape: queries broadcast into
    the codes scan (no corpus shuffle for scoring); only candidate
    (query, doc) pairs reach the rerank join.
    """
    from inside_vectordb_spark.operators.ann import _rerank_candidates

    # stored codes only decode against the min/span stats that
    # produced them: codes WITHOUT stats would silently train fresh
    # stats from the current corpus and decode foreign codes into
    # noise (review r9-4). Stats WITHOUT codes stays legal — frozen
    # stats with a fresh encode is self-consistent (the delete-twin
    # test's frozen-at-build semantics).
    if codes is not None and stats is None:
        raise ValueError(
            "stored codes require the stats that encoded them — "
            "pass codes and stats together; codes decoded with "
            "freshly trained stats produce meaningless scores"
        )
    mins, spans = stats if stats is not None else sq_train(corpus, corpus_vec)
    if codes is None:
        codes = corpus.select(
            F.col(corpus_id).alias("doc_id"),
            sq_encode_col(corpus_vec, mins, spans).alias("codes"),
        )
    dec = codes.select("doc_id", sq_decode_col("codes", mins, spans).alias("__dv"))
    q = queries.select(
        F.col(query_id).alias("query_id"), as_double_array(query_vec).alias("__qv")
    )
    approx = F.broadcast(q).crossJoin(dec).select(
        "query_id", "doc_id", cosine_similarity("__qv", "__dv").alias("__ascore")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__ascore"), F.asc("doc_id"))
    cand = (
        approx.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * refine)
        .select("query_id", "doc_id")
    )
    return _rerank_candidates(
        cand, queries, corpus, query_id, query_vec, corpus_id, corpus_vec, k, round_to
    )


def sq_oracle_sql(
    n_queries: int, k: int, refine: int, exclude_ids: tuple[int, ...] = ()
) -> str:
    """The full SQ8 chain restated for DuckDB: per-dim stats →
    codes → decoded vectors → approximate cosine → top ``k·refine``
    candidates → exact cosine rerank → top-k. Operation order matches
    the Spark expressions bit-for-bit (see module docstring).

    ``exclude_ids`` restates index tombstones (delete_from_sq_index):
    excluded from the decoded-codes scan — and therefore from both
    candidate generation and rerank — while stats still train on the
    FULL corpus, exactly as the persisted index does (stats are frozen
    at build time; deletes never retrain)."""
    excl = (
        f"WHERE pv.vec_id NOT IN ({', '.join(str(i) for i in exclude_ids)})"
        if exclude_ids
        else ""
    )
    return f"""
    WITH pv AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    stats AS (
      SELECT pos, min(val) AS mn, max(val) - min(val) AS span
      FROM pv GROUP BY pos
    ),
    dec AS (
      SELECT pv.vec_id,
             list(s.mn + ((CASE WHEN s.span = 0 THEN 0
                           ELSE least(255, floor(((pv.val - s.mn) / s.span) * 256.0))
                           END) + 0.5) * s.span / 256.0 ORDER BY pv.pos) AS dv
      FROM pv JOIN stats s USING (pos)
      {excl}
      GROUP BY pv.vec_id
    ),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {n_queries}),
    approx AS (
      SELECT q.query_id, d.vec_id AS doc_id,
             list_dot_product(q.qe, d.dv)
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(d.dv, d.dv))) AS ascore
      FROM qv q CROSS JOIN dec d
    ),
    cand AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ascore DESC, doc_id ASC) AS r
        FROM approx
      ) WHERE r <= {k * refine}
    ),
    scored AS (
      SELECT c.query_id, c.doc_id,
             list_dot_product(q.qe, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))) AS score
      FROM cand c
      JOIN qv q USING (query_id)
      JOIN embeddings e ON e.vec_id = c.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, doc_id, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= {k}
    """
