"""Maximal-marginal-relevance (MMR) diversified re-ranking.

Carbonell & Goldstein (1998): from a candidate pool ranked by
relevance, greedily select k results maximizing
``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` — relevance traded
against redundancy. The reference's pipeline stops at plain top-k
(``002-brute_force_similarity.py:170-228``); MMR is the standard
next stage whenever near-duplicate corpora (this repo's dedup tier
exists precisely because training corpora are full of them) would
otherwise fill the whole result list with copies.

Execution shape: candidate generation is the existing distributed
exact/ANN top-N; the greedy selection is inherently sequential in k
but embarrassingly parallel across queries → one
``applyInPandas`` over query groups, each group a tiny (N·d) matrix.
At 100 TB the candidate join is the only shuffle (keyed by doc_id,
N·Q rows); the per-query O(k·N·d) greedy loop never sees the corpus.

Oracle: the greedy recursion is restated as a DuckDB RECURSIVE CTE —
the working row per query carries the selected-id list as state, one
selection per recursion step (see ``mmr_oracle_sql``). Both engines
break score ties by ascending doc_id.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from inside_vectordb_spark.operators.topk import exact_cosine_topk

_MMR_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("mmr_score", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Diversify ``candidates`` (query_id, doc_id, score) down to k
    per query. ``score`` is the relevance arm; the redundancy arm is
    cosine between candidate embeddings, computed inside the group
    kernel on unit-normalized vectors."""
    # candidates are Q·N rows (post-top-k) but sit behind a window, so
    # Catalyst has no small-size estimate — broadcast them explicitly
    # or this plans as a sort-merge join that shuffles the ENTIRE
    # embedding corpus by doc_id (review r7; cross_encoder_rerank
    # already used this shape)
    cand = corpus.select(
        F.col(corpus_id).alias("doc_id"), F.col(corpus_vec).alias("__cv")
    ).join(F.broadcast(candidates), "doc_id").select(
        "query_id", "doc_id", "score", "__cv"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        qid = int(pdf["query_id"].iloc[0])
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        rel = pdf["score"].to_numpy(dtype=np.float64)
        mat = np.vstack(pdf["__cv"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        mat = mat / nrm
        sims = mat @ mat.T
        n = len(ids)
        take = min(k, n)
        picked = np.zeros(n, dtype=bool)
        out_ids, out_scores = [], []
        max_sim = np.full(n, -np.inf)
        for step in range(take):
            if step == 0:
                objective = rel.copy()
            else:
                objective = lam * rel - (1.0 - lam) * max_sim
            objective[picked] = -np.inf
            best = int(np.argmax(objective))  # ids sorted asc ⇒ first max = min doc_id
            picked[best] = True
            out_ids.append(ids[best])
            out_scores.append(objective[best])
            max_sim = np.maximum(max_sim, sims[:, best])
        return pd.DataFrame(
            {
                "query_id": np.full(take, qid, dtype=np.int64),
                "doc_id": np.array(out_ids, dtype=np.int64),
                "mmr_score": np.array(out_scores, dtype=np.float64),
                "rank": np.arange(1, take + 1, dtype=np.int32),
            }
        )

    out = cand.groupBy("query_id").applyInPandas(greedy, schema=_MMR_SCHEMA)
    if round_to is not None:
        out = out.withColumn("mmr_score", F.round("mmr_score", round_to))
    return out


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.7,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """End-to-end: exact top-``n_candidates`` relevance retrieval →
    MMR selection of k diverse results per query."""
    cand = exact_cosine_topk(
        queries,
        corpus,
        k=n_candidates,
        query_id=query_id,
        query_vec=query_vec,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        round_to=None,
    ).select("query_id", "doc_id", "score")
    return mmr_rerank(
        cand,
        corpus,
        k=k,
        lam=lam,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        round_to=round_to,
    )


def mmr_oracle_sql(n_queries: int, k: int, n_candidates: int, lam: float) -> str:
    """The greedy MMR recursion as a DuckDB RECURSIVE CTE: one row
    per (query, step); each row's ``selected`` list is the recursion
    state; step t+1 scores every unselected candidate with a
    correlated max-sim subquery over the candidate-pair cosine table
    and keeps the argmax (ties → min doc_id)."""
    return f"""
    WITH RECURSIVE qv AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < {n_queries}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS doc_id,
             list_dot_product(q.qe, CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])))) AS rel
      FROM qv q CROSS JOIN embeddings c
    ),
    cand AS (
      SELECT query_id, doc_id, rel FROM (
        SELECT query_id, doc_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, doc_id ASC) AS r
        FROM scored
      ) WHERE r <= {n_candidates}
    ),
    sims AS (
      SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
             list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                              CAST(eb.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(ea.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]),
                                          CAST(eb.embedding AS DOUBLE[])))) AS s
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id
      JOIN embeddings ea ON ea.vec_id = a.doc_id
      JOIN embeddings eb ON eb.vec_id = b.doc_id
    ),
    mmr AS (
      SELECT query_id, doc_id, rel AS mmr_score, 1 AS rank,
             [doc_id] AS selected
      FROM (
        SELECT query_id, doc_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, doc_id ASC) AS r
        FROM cand
      ) WHERE r = 1
      UNION ALL
      SELECT query_id, doc_id, mmr_score, rank, selected FROM (
        SELECT inner_q.*,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY mmr_score DESC, doc_id ASC) AS rn
        FROM (
          SELECT m.query_id, c.doc_id,
                 {lam} * c.rel - {1.0 - lam} * (
                   SELECT max(s.s) FROM sims s
                   WHERE s.query_id = m.query_id AND s.db = c.doc_id
                     AND list_contains(m.selected, s.da)
                 ) AS mmr_score,
                 m.rank + 1 AS rank,
                 list_append(m.selected, c.doc_id) AS selected
          FROM mmr m
          JOIN cand c ON c.query_id = m.query_id
                     AND NOT list_contains(m.selected, c.doc_id)
          WHERE m.rank < {k}
        ) inner_q
      ) WHERE rn = 1
    )
    SELECT query_id, doc_id, round(mmr_score, 6) AS mmr_score,
           CAST(rank AS INT) AS rank
    FROM mmr
    """
