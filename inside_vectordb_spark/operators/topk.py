"""Exact cosine top-k similarity search (the flagship operator).

Reference semantics: ``002-brute_force_similarity.py:170-228`` — for
each query, cosine against every corpus vector, full sort descending,
keep top-k. That loop is O(Q·N) python-sequential; here it is one
declarative plan (or one GEMM kernel) over all queries at once — the
fix for the reference's missed optimization O11 (SURVEY.md §4).

Two physical strategies, same semantics:

1. ``exact_cosine_topk`` — pure DataFrame: broadcast the (small) query
   side, crossJoin against the corpus, score with native Catalyst
   vector expressions, rank with a window. Fully oracle-checkable.
   At scale: the corpus side never shuffles for scoring (broadcast
   nested loop join streams it), and the window's shuffle moves only
   Q·N score rows — but Q·N rows is the real cost, so use strategy 2
   when Q·N is large.

2. ``exact_cosine_topk_gemm`` — Arrow-batched ``mapInPandas``: the
   query matrix is broadcast to executors as one NumPy array; each
   corpus partition does ONE BLAS GEMM (Q×d · d×B) and emits only its
   per-partition top-k per query (k·Q rows per partition, not B·Q);
   a final window reduces partials to the global top-k. This is the
   100 TB path: corpus never shuffles, network traffic is
   O(partitions·Q·k), and the kernel is vectorized end-to-end.

Tie-breaking is declared deterministic: (score DESC, id ASC) —
FIXTURES.md §6; the reference's argsort tie order is unspecified.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from inside_vectordb_spark.functions.vector import dot_product, l2_normalize


def exact_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Declarative exact search: normalize once, dot-product score
    (the reference's O6 trick, ``004-faiss_demo.py:184-196``),
    window top-k.

    Returns (query_id, doc_id, score, rank) with rank 1..k per query.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        l2_normalize(query_vec).alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        l2_normalize(corpus_vec).alias("__cv"),
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "doc_id",
        dot_product("__qv", "__cv").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out.select("query_id", "doc_id", "score", "rank")


_PARTIAL_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def exact_cosine_topk_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """GEMM-batched exact search (scale path, SURVEY.md §7 risk 1).

    Queries are collected to the driver (they are the small side by
    contract — hundreds/thousands of rows) and shipped via an
    explicit ``sc.broadcast``: one torrent transfer per executor,
    cached across tasks — closure capture would re-pickle the Q×d
    matrix into every task binary instead. Each corpus partition
    computes scores with one matmul and argpartition-selects its
    local top-k (the reference's missed O10: heap/partition selection
    instead of full argsort).
    """
    qrows = (
        queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("v"))
        .collect()
    )
    # edge parity with the declarative sibling (review r9): k ≤ 0 and
    # an empty query set both return an EMPTY frame there (the join/
    # window emit nothing); the GEMM path crashed executor-side
    # (argpartition kth=-1, then min() over a zero-size axis)
    if k <= 0 or not qrows:
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            LongType,
            StructField,
            StructType,
        )

        return queries.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", LongType()),
                    StructField("doc_id", LongType()),
                    StructField("score", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )
    qids_l = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat_l = np.array([r["v"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat_l, axis=1, keepdims=True)
    qn[qn == 0.0] = 1.0
    qmat_l /= qn
    bc = queries.sparkSession.sparkContext.broadcast((qids_l, qmat_l))

    c = corpus.select(F.col(corpus_id).alias("doc_id"), F.col(corpus_vec).alias("v"))

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, qmat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["v"].to_numpy()), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0
            mat /= nrm
            sims = qmat @ mat.T  # (Q, B) — one GEMM per Arrow batch
            kk = min(k, sims.shape[1])
            # argpartition: O(B) selection, not O(B log B) sort
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            # Tie-aware repair: argpartition keeps an ARBITRARY member
            # of score-tied candidates at the kk boundary, which could
            # drop a tied doc with a lower id before the global
            # (score DESC, doc_id ASC) window sees it. For the (rare)
            # rows where ties cross the boundary, re-select the local
            # top-kk under the declared total order.
            nq = sims.shape[0]
            sel_scores = sims[np.arange(nq)[:, None], part]
            kth = sel_scores.min(axis=1)
            n_at_kth_total = (sims == kth[:, None]).sum(axis=1)
            n_at_kth_sel = (sel_scores == kth[:, None]).sum(axis=1)
            for i in np.nonzero(n_at_kth_total > n_at_kth_sel)[0]:
                cand = np.nonzero(sims[i] >= kth[i])[0]
                order = np.lexsort((ids[cand], -sims[i, cand]))
                part[i] = cand[order[:kk]]
            rows = np.repeat(np.arange(sims.shape[0]), kk)
            cols = part.ravel()
            yield pd.DataFrame(
                {
                    "query_id": qids[rows],
                    "doc_id": ids[cols],
                    "score": sims[rows, cols],
                }
            )

    partials = c.mapInPandas(score_partition, schema=_PARTIAL_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out.select("query_id", "doc_id", "score", "rank")


def ranked_result_lists(topk: DataFrame) -> DataFrame:
    """T2: per-query ordered result list — ``(query_id, doc_ids ARRAY)``
    with doc ids in rank order (``002:200-228`` result dict shape)."""
    return (
        topk.groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "doc_id"))),
                lambda s: s["doc_id"],
            ).alias("doc_ids")
        )
    )


def cosine_range_search(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Radius query: every (query, doc) pair with cosine ≥ threshold
    (FAISS ``Index.range_search`` analogue — the reference's FAISS
    study ``004-faiss_demo.py`` exercises only ``search(k)``; radius
    retrieval is the other half of that API every vector store ships).

    Unlike top-k there is NO window/shuffle at all: the plan is
    broadcast(queries) ⨝ corpus → filter — a single map-side stage
    over the corpus scan, so at 100 TB the corpus streams through
    codegen once and only matching pairs leave the executor. The
    membership predicate is evaluated on the ROUNDED score so both
    engines agree at the radius boundary (FIXTURES.md §6 determinism
    convention).

    Returns (query_id, doc_id, score) — set semantics, no rank.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        l2_normalize(query_vec).alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        l2_normalize(corpus_vec).alias("__cv"),
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "doc_id",
            F.round(dot_product("__qv", "__cv"), round_to).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def filtered_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    filter_col: str = "label",
    round_to: int | None = 6,
) -> DataFrame:
    """Attribute-filtered exact search: per query, rank only the corpus
    rows sharing the query's ``filter_col`` value (the "filtered vector
    search" every production vector store exposes — metadata predicate
    ∧ nearest-neighbor; the reference's corpus has no metadata beyond
    an empty dict, ``000-get_data.py:400``, so this generalizes its J5
    flagship to the predicated form).

    Physical shape — the point of the operator: the per-query predicate
    turns J5's broadcast nested loop (every query × every doc) into a
    broadcast HASH join on ``filter_col``. The corpus never shuffles,
    each corpus row is scored only against the queries that can accept
    it, and candidate generation is O(matching pairs), not O(Q·N).
    Self-matches are excluded (a query vector drawn from the corpus
    must not retrieve itself — ``003-hnswlib_demo.py`` k+1 trick).

    Returns (query_id, doc_id, score, rank), rank 1..k per query.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(filter_col).alias("__qf"),
        l2_normalize(query_vec).alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        F.col(filter_col).alias("__cf"),
        l2_normalize(corpus_vec).alias("__cv"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("__qf") == F.col("__cf"))
        .filter(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            dot_product("__qv", "__cv").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out.select("query_id", "doc_id", "score", "rank")
