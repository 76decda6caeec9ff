"""BM25 operator: hand-computed scores, retrieval sanity, tie-breaks.

Cross-engine arithmetic parity for the registered query is covered by
tests/test_parity.py::test_oracle_parity[bm25_topk].
"""

from __future__ import annotations

import math

import pytest

from inside_vectordb_spark.operators.bm25 import BM25_B, BM25_K1, bm25_scores, bm25_topk

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "cherry cherry cherry durian"),
    (3, "unrelated words only here"),
]


def _expected_bm25(query_terms: list[str]) -> dict[int, float]:
    texts = {i: t.lower().split() for i, t in DOCS}
    n = len(texts)
    avgdl = sum(len(t) for t in texts.values()) / n
    out: dict[int, float] = {}
    for doc_id, toks in texts.items():
        score = 0.0
        for term in set(query_terms):
            tf = toks.count(term)
            if tf == 0:
                continue
            df = sum(1 for t in texts.values() if term in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(toks) / avgdl)
            )
        if score > 0:
            out[doc_id] = round(score, 6)
    return out


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    queries = spark.createDataFrame(
        [(100, "apple cherry"), (101, "banana")], "query_id: long, qtext: string"
    )
    return docs, queries


def test_scores_match_hand_computation(tiny):
    docs, queries = tiny
    got = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_scores(docs, queries).collect()
    }
    for qid, terms in [(100, ["apple", "cherry"]), (101, ["banana"])]:
        exp = _expected_bm25(terms)
        for doc_id, score in exp.items():
            assert got[(qid, doc_id)] == pytest.approx(score, abs=2e-6)
        assert {d for (q, d) in got if q == qid} == set(exp)


def test_topk_ranks_descending_with_id_tiebreak(tiny):
    docs, queries = tiny
    rows = bm25_topk(docs, queries, k=3).collect()
    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.bm25, -a.doc_id) >= (b.bm25, -b.doc_id)
            if a.bm25 == b.bm25:
                assert a.doc_id < b.doc_id


def test_term_multiplicity_in_query_does_not_double_count(spark):
    docs = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    q1 = spark.createDataFrame([(1, "cherry")], "query_id: long, qtext: string")
    q2 = spark.createDataFrame(
        [(1, "cherry cherry")], "query_id: long, qtext: string"
    )
    s1 = {r.doc_id: r.bm25 for r in bm25_scores(docs, q1).collect()}
    s2 = {r.doc_id: r.bm25 for r in bm25_scores(docs, q2).collect()}
    assert s1 == s2


def test_case_folding(spark):
    docs = spark.createDataFrame([(0, "Apple APPLE")], "doc_id: long, text: string")
    q = spark.createDataFrame([(1, "aPpLe")], "query_id: long, qtext: string")
    rows = bm25_scores(docs, q).collect()
    assert len(rows) == 1 and rows[0].doc_id == 0


def test_bm25_indexed_matches_fresh(spark, tmp_path):
    """Stored-index search returns exactly the fresh-path results,
    reuses the artifact on re-ensure, and rebuilds when the corpus
    changes."""
    import os

    from pyspark.sql import functions as F

    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.bm25 import bm25_topk
    from inside_vectordb_spark.operators.lexical_index import (
        bm25_topk_indexed,
        ensure_lexical_index,
    )
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    toks = F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    fresh = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    path = str(tmp_path / "lex")
    ensure_lexical_index(docs, path)
    stored = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_topk_indexed(spark, queries, path, k=10).collect()
    }
    assert stored == fresh
    # cache hit: meta untouched on re-ensure with the same corpus
    mtime = os.path.getmtime(os.path.join(path, "meta.json"))
    ensure_lexical_index(docs, path)
    assert os.path.getmtime(os.path.join(path, "meta.json")) == mtime
    # changed corpus → rebuild
    ensure_lexical_index(docs.filter("doc_id < 40"), path)
    assert os.path.getmtime(os.path.join(path, "meta.json")) > mtime


def test_lexical_upsert_matches_full_build(spark, tmp_path):
    """Incremental maintenance: base-build + delta-upsert answers
    exactly like an index built from the full corpus (integer
    relations additive; stats recombined), the merged fingerprint
    makes ensure treat the maintained index as current, and the
    stale tfidf norms are invalidated then lazily rebuilt."""
    import os

    from pyspark.sql import functions as F

    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.lexical_index import (
        bm25_topk_indexed,
        build_lexical_index,
        ensure_lexical_index,
        tfidf_topk_indexed,
        upsert_lexical_index,
    )
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    toks = F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    full = str(tmp_path / "full")
    build_lexical_index(docs, full)
    want_bm = {
        tuple(r) for r in bm25_topk_indexed(spark, queries, full, k=10).collect()
    }
    want_tf = {
        tuple(r) for r in tfidf_topk_indexed(spark, queries, full, k=10).collect()
    }

    inc = str(tmp_path / "inc")
    build_lexical_index(docs.filter("doc_id % 3 != 0"), inc)
    # materialize the norms so the upsert's invalidation is observable
    import json

    tfidf_topk_indexed(spark, queries, inc, k=10).collect()
    rel_before = json.load(open(os.path.join(inc, "meta.json")))["docnorm_rel"]
    assert os.path.isdir(os.path.join(inc, rel_before))
    upsert_lexical_index(docs.filter("doc_id % 3 = 0"), inc)
    meta_after = json.load(open(os.path.join(inc, "meta.json")))
    # invalidated by REPOINTING meta at the next generation; the old
    # dir gets ONE-COMMIT GRACE (review r8: in-flight readers on the
    # previous meta keep their files until the NEXT commit), so it
    # still exists now and is gc'd by the following commit
    assert meta_after["docnorm_rel"] != rel_before
    assert os.path.isdir(os.path.join(inc, rel_before))
    assert not os.path.isdir(os.path.join(inc, meta_after["docnorm_rel"]))
    got_bm = {
        tuple(r) for r in bm25_topk_indexed(spark, queries, inc, k=10).collect()
    }
    assert got_bm == want_bm
    got_tf = {
        tuple(r) for r in tfidf_topk_indexed(spark, queries, inc, k=10).collect()
    }
    assert got_tf == want_tf  # norms rebuilt against the merged dictionary
    # maintained index recognized as current for the full corpus
    mtime = os.path.getmtime(os.path.join(inc, "meta.json"))
    ensure_lexical_index(docs, inc)
    assert os.path.getmtime(os.path.join(inc, "meta.json")) == mtime


def test_lexical_upsert_rejects_replayed_delta(spark, tmp_path):
    """Review r7: the disjoint-delta contract is ENFORCED like every
    other upsert in the repo — a replayed delta would append
    duplicate postings and double-count df/n_docs, silently doubling
    affected BM25 weights."""
    import pytest

    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.lexical_index import (
        build_lexical_index,
        upsert_lexical_index,
    )
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "idx")
    build_lexical_index(docs.filter("doc_id % 3 != 0"), path)
    delta = docs.filter("doc_id % 3 = 0")
    upsert_lexical_index(delta, path)
    with pytest.raises(ValueError, match="append-only"):
        upsert_lexical_index(delta, path)  # replay must fail loudly


def test_tfidf_norms_build_commits_via_meta_pointer(spark, tmp_path):
    """Review r7: a killed norms build must leave serving on the
    intact committed generation — the build writes a FRESH dir and
    repoints docnorm_rel atomically, never into the live dir."""
    import json
    import os

    from pyspark.sql import functions as F

    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.lexical_index import (
        build_lexical_index,
        tfidf_topk_indexed,
    )
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    toks = F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    path = str(tmp_path / "idx")
    build_lexical_index(docs, path)
    want = {tuple(r) for r in tfidf_topk_indexed(spark, queries, path, k=10).collect()}
    meta = json.load(open(os.path.join(path, "meta.json")))
    rel = meta["docnorm_rel"]
    assert rel.startswith("docnorm_g") and os.path.isdir(os.path.join(path, rel))
    # simulate a KILLED rebuild: a torn partial dir at the NEXT
    # generation name, meta still pointing at the committed one
    torn = os.path.join(path, f"docnorm_g{meta['docnorm_gen'] + 1}")
    os.makedirs(torn)
    open(os.path.join(torn, "part-00000.parquet"), "wb").write(b"torn")
    got = {tuple(r) for r in tfidf_topk_indexed(spark, queries, path, k=10).collect()}
    assert got == want  # serving never looked at the torn dir


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback
# ---------------------------------------------------------------------------


def test_rm3_retrieves_expansion_only_docs(spark):
    """The signature RM3 behavior: a doc sharing NO term with the
    original query becomes retrievable through expansion terms mined
    from the feedback docs; a doc sharing nothing with either stays
    out."""
    from inside_vectordb_spark.operators.rm3 import (
        bm25_rm3_topk,
        rm3_expansion_terms,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry date"),  # feedback hit
            (1, "apple banana cherry fig"),  # feedback hit
            (2, "cherry date fig plum"),  # expansion-only reachable
            (3, "totally unrelated words here"),  # unreachable
        ],
        "doc_id: long, text: string",
    )
    queries = spark.createDataFrame(
        [(100, "apple banana")], "query_id: long, qtext: string"
    )
    exp = rm3_expansion_terms(docs, queries, fb_docs=2, fb_terms=3).collect()
    exp_terms = {r["term"] for r in exp}
    assert exp_terms <= {"cherry", "date", "fig"}
    assert "cherry" in exp_terms  # in both feedback docs → top weight
    assert all(r["rw"] > 0 for r in exp)

    out = bm25_rm3_topk(docs, queries, k=10, fb_docs=2, fb_terms=3).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert 2 in by_doc and by_doc[2]["rm3"] > 0
    assert 3 not in by_doc
    # original-term docs still dominate: alpha weight keeps them first
    assert by_doc[0]["rank"] < by_doc[2]["rank"]
    assert by_doc[1]["rank"] < by_doc[2]["rank"]


def test_rm3_degrades_to_weighted_bm25_without_feedback(spark):
    """A query matching nothing gets no feedback docs and no
    expansion terms — RM3 must return exactly the alpha-scaled BM25
    result (here: empty, since nothing matches at all)."""
    from inside_vectordb_spark.operators.rm3 import bm25_rm3_topk

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id: long, text: string"
    )
    queries = spark.createDataFrame(
        [(100, "zzz qqq")], "query_id: long, qtext: string"
    )
    assert bm25_rm3_topk(docs, queries, k=5).count() == 0


def test_lexical_rebuild_is_atomic_and_invalidates_norms(spark, tmp_path):
    """A rebuild over a CHANGED corpus must (a) never write into the
    directories the live meta names (crash-before-commit leaves the
    old index servable), (b) repoint docnorm so stale norms can't be
    served against the new dictionary (review r6s2: the old in-place
    overwrite + surviving docnorm made tfidf silently drop every doc
    added since the previous corpus), and (c) serve results identical
    to a from-scratch index of the new corpus."""
    import json
    import os

    from pyspark.sql import functions as F

    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.lexical_index import (
        build_lexical_index,
        tfidf_topk_indexed,
    )
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    toks = F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    path = str(tmp_path / "idx")
    build_lexical_index(docs.filter("doc_id % 3 != 0"), path)
    tfidf_topk_indexed(spark, queries, path, k=10).collect()  # norms gen 1
    meta1 = json.load(open(os.path.join(path, "meta.json")))
    assert os.path.isdir(os.path.join(path, meta1["docnorm_rel"]))

    build_lexical_index(docs, path)  # rebuild on the FULL corpus
    meta2 = json.load(open(os.path.join(path, "meta.json")))
    # fresh generation names — nothing the old meta pointed at was
    # written in place, and the old generation is gc'd post-commit
    assert meta2["postings_rels"] != meta1["postings_rels"]
    assert meta2["df_rel"] != meta1["df_rel"]
    assert meta2["docnorm_rel"] != meta1["docnorm_rel"]
    # superseded generation keeps ONE-COMMIT GRACE (review r8) — the
    # gen-1 dirs survive this rebuild for in-flight readers...
    for rel in (
        meta1["postings_rels"][0],
        meta1["df_rel"],
        meta1["docnorm_rel"],
    ):
        assert os.path.isdir(os.path.join(path, rel)), rel
    # ...and are gc'd by the NEXT commit
    build_lexical_index(docs, path)
    for rel in (
        meta1["postings_rels"][0],
        meta1["df_rel"],
        meta1["docnorm_rel"],
    ):
        assert not os.path.isdir(os.path.join(path, rel)), rel
    # and the rebuilt index answers exactly like a from-scratch one
    fresh = str(tmp_path / "fresh")
    build_lexical_index(docs, fresh)
    got = {tuple(r) for r in tfidf_topk_indexed(spark, queries, path, k=10).collect()}
    want = {tuple(r) for r in tfidf_topk_indexed(spark, queries, fresh, k=10).collect()}
    assert got == want and len(got) > 0
