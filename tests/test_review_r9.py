"""Regression pins for the round-9 review batch (operators/topk.py,
embed.py, compare.py, functions/, registry/core.py, registry/embed.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import inside_vectordb_spark.io as eio
from inside_vectordb_spark.functions.text import word_ngram_stream
from inside_vectordb_spark.operators.compare import summary_text
from inside_vectordb_spark.operators.embed import _hash_tokenize, hash_embed_texts
from inside_vectordb_spark.operators.topk import (
    exact_cosine_topk,
    exact_cosine_topk_gemm,
)
from tests.conftest import SF_DIR


def test_summary_text_tie_breaks_alphabetically_first():
    """KEY FINDING must agree with summary_extrema's (value DESC,
    method ASC) window when recalls tie."""
    rows = [
        {"method": "gemm", "recall_at_10": 1.0, "precision_at_10": 0.5,
         "mrr": 0.9, "recall_retention": None},
        {"method": "exact", "recall_at_10": 1.0, "precision_at_10": 0.5,
         "mrr": 0.9, "recall_retention": None},
    ]
    assert "(exact)" in summary_text(rows)


def test_summary_text_empty_rows_raises_cleanly():
    with pytest.raises(ValueError, match="no comparison rows"):
        summary_text([])


def test_gemm_edge_parity_with_declarative(spark):
    q = eio.query_vectors(spark, SF_DIR).limit(3)
    c = eio.load_table(spark, SF_DIR, "embeddings")
    # k=0: both strategies return an empty frame (the GEMM path used
    # to crash executor-side in argpartition)
    assert exact_cosine_topk(q, c, k=0).count() == 0
    assert exact_cosine_topk_gemm(q, c, k=0).count() == 0
    # empty query set: both empty
    empty_q = q.filter(F.lit(False))
    assert exact_cosine_topk(empty_q, c, k=5).count() == 0
    assert exact_cosine_topk_gemm(empty_q, c, k=5).count() == 0


def test_word_ngram_stream_drops_n1_phantom(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "text": ["a b", "   ", ""]})
    )
    out = word_ngram_stream(docs, "id", "text", 1, distinct=False).toPandas()
    # whitespace-only and empty docs emit NO gram rows (the phantom ''
    # token used to leak through the n=1 path)
    assert sorted(out["gram"]) == ["a", "b"]
    # and n=1 with_count counts real tokens
    out2 = word_ngram_stream(docs, "id", "text", 1, with_count=True).toPandas()
    assert set(out2["n_grams"]) == {2}


def test_hash_tokenize_matches_re2_semantics():
    # RE2's \s is [\t\n\f\r ] — vertical tab and NBSP are TOKEN
    # characters, unlike Python str.split()
    assert _hash_tokenize("a\x0bb") == ["a\x0bb"]
    assert _hash_tokenize("a\xa0b") == ["a\xa0b"]
    assert _hash_tokenize("\ta b\n") == ["a", "b"]
    assert _hash_tokenize("") == []
    assert _hash_tokenize(None) == []


def test_hash_embed_memo_identical_output():
    texts = pd.Series(["the cat the cat the", "cat the", ""])
    mat, counts = hash_embed_texts(texts, dim=16)
    assert counts.tolist() == [5, 2, 0]
    # memoized rows are consistent: same tokens → proportional counts
    assert np.array_equal(mat[0], mat[1] + mat[1] + (mat[0] - 2 * mat[1]))
    assert mat[2].sum() == 0


def test_rebuild_if_stale_recipe_gate(tmp_path):
    """Review r9-3: the shared staleness gate rebuilds when ANY
    recipe key changes (the hnsw lifecycle's hand-rolled check
    compared none of its build knobs — a retune silently served the
    stale graph on a rows-only tier), and records the recipe only
    AFTER a successful rebuild so a crash reads as stale."""
    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.registry.ann import _rebuild_if_stale

    art = str(tmp_path / "art")
    calls = []

    def rebuild(meta=None):
        calls.append(1)
        mio.write_json(mio.join(art, "meta.json"), meta or {"kind": "t"})

    _rebuild_if_stale(art, {"m": 16, "deleted": [5, 7]}, rebuild)
    assert len(calls) == 1
    # same recipe → cached
    _rebuild_if_stale(art, {"m": 16, "deleted": [5, 7]}, rebuild)
    assert len(calls) == 1
    # tuple-vs-list normalization: (5, 7) == [5, 7] after round-trip
    _rebuild_if_stale(art, {"m": 16, "deleted": (5, 7)}, rebuild)
    assert len(calls) == 1
    # any knob change → rebuild
    _rebuild_if_stale(art, {"m": 32, "deleted": [5, 7]}, rebuild)
    assert len(calls) == 2
    # delete-set change → rebuild
    _rebuild_if_stale(art, {"m": 32, "deleted": [5, 7, 11]}, rebuild)
    assert len(calls) == 3
    # meta_stale predicate forces a rebuild even with a current recipe
    _rebuild_if_stale(
        art, {"m": 32, "deleted": [5, 7, 11]}, rebuild,
        meta_stale=lambda m: True,
    )
    assert len(calls) == 4
    # a rebuild that fails must NOT record the recipe

    def failing():
        calls.append(1)
        raise RuntimeError("boom")

    try:
        _rebuild_if_stale(art, {"m": 64}, failing)
    except RuntimeError:
        pass
    assert len(calls) == 5
    # next call with the same recipe sees stale (no sidecar) and retries
    _rebuild_if_stale(art, {"m": 64}, rebuild)
    assert len(calls) == 6
