"""RRF fusion: hand-computed scores, single-arm docs, input guards."""

from __future__ import annotations

import pytest

from inside_vectordb_spark.operators.hybrid import rrf_fuse


@pytest.fixture(scope="module")
def runs(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id: long, doc_id: long, rank: int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id: long, doc_id: long, rank: int",
    )
    return a, b


def test_rrf_hand_computed(spark, runs):
    a, b = runs
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], k=10).collect()}
    exp = {
        10: round(1 / 61, 6),
        11: round(1 / 62 + 1 / 61, 6),
        12: round(1 / 63, 6),
        13: round(1 / 62, 6),
    }
    assert got == exp


def test_rrf_ranking_and_k(spark, runs):
    a, b = runs
    rows = sorted(rrf_fuse([a, b], k=2).collect(), key=lambda r: r.rank)
    # doc 11 appears in both arms -> highest fused score; doc 10
    # (rank 1 in arm a) beats doc 13 (rank 2 in arm b).
    assert [(r.doc_id, r.rank) for r in rows] == [(11, 1), (10, 2)]


def test_rrf_single_run_is_rank_monotone(spark, runs):
    a, _ = runs
    rows = sorted(rrf_fuse([a], k=10).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in rows] == [10, 11, 12]


def test_rrf_empty_runs_raises():
    with pytest.raises(ValueError, match="no runs"):
        rrf_fuse([])
