"""MRL + SQ8 composition (operators/mrl.py: ann_mrl_sq_topk*)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

import inside_vectordb_spark.io as eio
from inside_vectordb_spark.operators.mrl import (
    ann_mrl_sq_topk,
    ann_mrl_sq_topk_indexed,
    ann_mrl_topk,
    build_mrl_sq_index,
    ensure_mrl_sq_index,
)
from tests.conftest import SF_DIR


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_indexed_matches_fresh(spark, tmp_path):
    art = str(tmp_path / "mrl_sq")
    corpus = eio.load_table(spark, SF_DIR, "embeddings")
    q = eio.query_vectors(spark, SF_DIR)
    build_mrl_sq_index(corpus, art, prefix_dim=32)
    stored = _frame(ann_mrl_sq_topk_indexed(q, corpus, art, k=10))
    fresh = _frame(ann_mrl_sq_topk(q, corpus, k=10, prefix_dim=32))
    pd.testing.assert_frame_equal(stored, fresh)


def test_ensure_reuses_artifact(spark, tmp_path):
    art = str(tmp_path / "mrl_sq2")
    corpus = eio.load_table(spark, SF_DIR, "embeddings")
    ensure_mrl_sq_index(corpus, art, prefix_dim=32)
    m1 = os.path.getmtime(os.path.join(art, "meta.json"))
    ensure_mrl_sq_index(corpus, art, prefix_dim=32)
    assert os.path.getmtime(os.path.join(art, "meta.json")) == m1
    # changed corpus -> rebuild
    ensure_mrl_sq_index(corpus.filter(F.col("vec_id") % 2 == 0), art,
                        prefix_dim=32)
    assert os.path.getmtime(os.path.join(art, "meta.json")) > m1


def test_quantized_funnel_recall_close_to_unquantized(spark):
    """The full-width rerank absorbs most of the int8 error: top-10
    overlap with the UNquantized MRL funnel stays high."""
    corpus = eio.load_table(spark, SF_DIR, "embeddings")
    q = eio.query_vectors(spark, SF_DIR)
    a = _frame(ann_mrl_sq_topk(q, corpus, k=10, prefix_dim=32))
    b = _frame(ann_mrl_topk(q, corpus, k=10, prefix_dim=32))
    hits = 0.0
    n_q = b["query_id"].nunique()
    for qid, g in b.groupby("query_id"):
        truth = set(g["doc_id"])
        hits += len(truth & set(a[a["query_id"] == qid]["doc_id"])) / len(truth)
    assert hits / n_q >= 0.9, hits / n_q
