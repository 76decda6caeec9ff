"""Cross-encoder rerank: hand-computed scores + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from inside_vectordb_spark.operators.rerank import cross_encoder_rerank
from inside_vectordb_spark.plans import assert_in_plan, assert_not_in_plan
from inside_vectordb_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_rerank_hand_computed(spark):
    queries = spark.createDataFrame(
        [(1, "red fish blue fish")], "query_id long, qtext string"
    )
    docs = spark.createDataFrame(
        [
            (10, "red fish"),            # {red,fish} ∩ {red,fish,blue} = 2; ∪ = 3
            (11, "blue whale swims far"),  # ∩ = 1 (blue); ∪ = 6
            (12, "green grass"),          # ∩ = 0
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], "query_id long, doc_id long"
    )
    rows = {
        r.doc_id: r
        for r in cross_encoder_rerank(cand, queries, docs, k=3).collect()
    }
    assert rows[10].ce_score == round(2 / 3, 6) and rows[10].rank == 1
    assert rows[11].ce_score == round(1 / 6, 6) and rows[11].rank == 2
    assert rows[12].ce_score == 0.0 and rows[12].rank == 3


def test_rerank_empty_texts(spark):
    queries = spark.createDataFrame([(1, "")], "query_id long, qtext string")
    docs = spark.createDataFrame([(10, "")], "doc_id long, text string")
    cand = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    r = cross_encoder_rerank(cand, queries, docs, k=1).head()
    assert r.ce_score == 0.0


def test_rerank_plan_broadcasts_candidates(spark):
    """Candidates broadcast into the doc scan — the doc side never
    shuffles for the pair join, and the scorer is one Arrow stage."""
    df = QUERIES["rerank_cross_encoder"](spark, SF_DIR)
    assert_in_plan(df, "BroadcastHashJoin")
    assert_in_plan(df, "MapInPandas")
    assert_not_in_plan(df, "SortMergeJoin")
    assert_not_in_plan(df, "CartesianProduct")
