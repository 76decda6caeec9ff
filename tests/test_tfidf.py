"""TF-IDF cosine scorer: hand-computed values, cosine bounds, and the
ranking contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from inside_vectordb_spark.operators.tfidf import tfidf_scores, tfidf_topk


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_hand_computed(spark):
    """3-doc corpus, 1 query — every weight checked against a
    by-hand sklearn-smooth-idf computation."""
    docs = _mk(spark, ["cat sat", "cat cat dog", "bird"])
    q = spark.createDataFrame([(0, "cat bird")], "query_id long, qtext string")
    got = {
        (r["query_id"], r["doc_id"]): r["tfidf"]
        for r in tfidf_scores(docs, q).collect()
    }
    n = 3
    idf = lambda df: math.log((1 + n) / (1 + df)) + 1
    i_cat, i_sat, i_dog, i_bird = idf(2), idf(1), idf(1), idf(1)
    # query "cat bird": wq = 1*idf each; qnorm over both terms
    qn = math.hypot(i_cat, i_bird)
    # doc 0 "cat sat": wd(cat)=i_cat, wd(sat)=i_sat
    d0 = math.hypot(i_cat, i_sat)
    want0 = (i_cat / qn) * (i_cat / d0)
    # doc 1 "cat cat dog": wd(cat)=(1+ln2)*i_cat, wd(dog)=i_dog
    w1c = (1 + math.log(2)) * i_cat
    d1 = math.hypot(w1c, i_dog)
    want1 = (i_cat / qn) * (w1c / d1)
    # doc 2 "bird": wd=i_bird, norm=i_bird → doc-side unit vector
    want2 = i_bird / qn
    assert abs(got[(0, 0)] - round(want0, 6)) < 1e-9
    assert abs(got[(0, 1)] - round(want1, 6)) < 1e-9
    assert abs(got[(0, 2)] - round(want2, 6)) < 1e-9
    assert set(got) == {(0, 0), (0, 1), (0, 2)}


def test_tfidf_cosine_bounds_and_identity(spark):
    """Scores are true cosines: bounded by 1, and a query identical
    to a document's full text scores exactly 1 against it."""
    docs = _mk(spark, ["alpha beta gamma", "delta epsilon", "alpha beta"])
    q = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "unseen words only")],
        "query_id long, qtext string",
    )
    rows = tfidf_scores(docs, q).collect()
    assert all(r["tfidf"] <= 1.0 + 1e-9 for r in rows)
    exact = {r["doc_id"]: r["tfidf"] for r in rows if r["query_id"] == 0}
    assert exact[0] == 1.0
    # a query of entirely unseen terms matches nothing
    assert not [r for r in rows if r["query_id"] == 1]


def test_tfidf_topk_contract(spark):
    """Ranking contract: dense ranks 1..k, rounded-score descending,
    doc_id tie-break ascending."""
    docs = _mk(spark, ["x y", "x y", "x z", "w"])
    q = spark.createDataFrame([(9, "x y")], "query_id long, qtext string")
    out = tfidf_topk(docs, q, k=3).orderBy("rank").collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # tie 0/1 on doc_id
    scores = [r["tfidf"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert out[0]["tfidf"] == out[1]["tfidf"] == 1.0
