"""Cross-encoder reranking — the second stage of every production
retrieval stack: a cheap first-stage retriever (BM25 / dense ANN)
over-fetches candidates, then a pairwise model scores each
(query, document) PAIR jointly and re-orders the short list.

The reference stops at single-stage retrieval (cosine/HNSW/FAISS
top-k, ``002``-``004``); this adds the stage its pipeline would grow
next. Scale shape — the point of the operator: the candidate set is
tiny (queries × depth), so it rides a BROADCAST into the document
scan; raw document text is read once, only for candidate doc ids
(predicate pushdown on the semi-joined keys), and the pair scorer is
one Arrow-batched ``mapInPandas`` stage — the same physical shape as
``operators/embed.py:encode_documents``.

Scorer tiers, mirroring the repo's encoder convention:
- ``jaccard`` (default): deterministic token-set Jaccard — a real
  lexical relevance signal, restatable in DuckDB SQL, so the
  registered query carries a FULL value-hash oracle;
- ``cross-encoder``: import-gated sentence-transformers
  ``CrossEncoder.predict`` (absent in this container — the branch is
  exercised wherever torch exists, the plumbing is identical).
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

_PAIR_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("ce_score", DoubleType()),
    ]
)

_CE_MODEL_CACHE: dict = {}


def _jaccard_scores(qs: pd.Series, ds: pd.Series) -> np.ndarray:
    out = np.zeros(len(qs), dtype=np.float64)
    for i, (q, d) in enumerate(zip(qs.fillna(""), ds.fillna(""))):
        qt = set(str(q).lower().split())
        dt = set(str(d).lower().split())
        u = qt | dt
        out[i] = len(qt & dt) / len(u) if u else 0.0
    return out


def _cross_encoder_scorer(model_name: str):  # pragma: no cover - needs torch
    def score(qs: pd.Series, ds: pd.Series) -> np.ndarray:
        from sentence_transformers import CrossEncoder

        if model_name not in _CE_MODEL_CACHE:
            _CE_MODEL_CACHE[model_name] = CrossEncoder(model_name)
        model = _CE_MODEL_CACHE[model_name]
        pairs = list(zip(qs.fillna("").tolist(), ds.fillna("").tolist()))
        return np.asarray(model.predict(pairs), dtype=np.float64)

    return score


def cross_encoder_rerank(
    candidates: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    query_text: str = "qtext",
    doc_id: str = "doc_id",
    doc_text: str = "text",
    scorer: str = "jaccard",
    model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
    round_to: int | None = 6,
) -> DataFrame:
    """Rerank ``candidates`` (query_id, doc_id) with a pairwise scorer
    over the joined texts; returns (query_id, doc_id, ce_score, rank),
    rank 1..k per query, ties broken by doc_id ASC."""
    if scorer == "jaccard":
        score_fn = _jaccard_scores
    elif scorer == "cross-encoder":
        score_fn = _cross_encoder_scorer(model_name)
    else:
        raise ValueError(f"unknown scorer: {scorer!r}")

    cand_q = candidates.select(
        F.col(query_id).alias("query_id"), F.col(doc_id).alias("doc_id")
    ).join(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_text).alias("__qt")
        ),
        "query_id",
    )
    pairs = docs.select(
        F.col(doc_id).alias("doc_id"), F.col(doc_text).alias("__dt")
    ).join(F.broadcast(cand_q), "doc_id")

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "ce_score": score_fn(pdf["__qt"], pdf["__dt"]),
                }
            )

    scored = pairs.mapInPandas(score_batches, schema=_PAIR_SCHEMA)
    if round_to is not None:
        scored = scored.withColumn("ce_score", F.round("ce_score", round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("ce_score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "ce_score", "rank")
    )
