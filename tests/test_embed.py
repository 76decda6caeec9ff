"""F4 encoder unit tests: batch plumbing, alignment, gating.

The cross-engine math itself is covered by the parity suite
(``text_embeddings`` / ``text_search_e2e`` oracles); these tests pin
the Python-side contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from inside_vectordb_spark.operators.embed import (
    DEFAULT_DIM,
    encode_documents,
    hash_embed_texts,
)


def test_hash_embed_empty_and_null():
    mat, counts = hash_embed_texts(pd.Series(["", "   ", None, "one two"]))
    assert mat.shape == (4, DEFAULT_DIM)
    assert counts.tolist()[:3] == [0, 0, 0]
    assert not mat[:3].any(), "empty/null text must encode to the zero vector"
    assert counts[3] == 2
    assert np.abs(mat[3]).sum() == 2, "each token contributes exactly ±1"


def test_hash_embed_deterministic():
    s = pd.Series(["the quick brown fox", "jumps over"])
    a, _ = hash_embed_texts(s)
    b, _ = hash_embed_texts(s)
    np.testing.assert_array_equal(a, b)


def test_encode_documents_alignment(spark):
    """Ids must stay aligned with their embeddings across Arrow
    batches (the reference's implicit positional contract, made
    explicit here)."""
    pdf = pd.DataFrame(
        {"doc_id": np.arange(10, dtype=np.int64), "text": [f"tok{i} tok{i}" for i in range(10)]}
    )
    out = encode_documents(spark.createDataFrame(pdf)).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == list(range(10))
    expected, _ = hash_embed_texts(pdf["text"])
    for r in out:
        np.testing.assert_array_equal(
            np.array(r["embedding"], dtype=np.int64), expected[r["doc_id"]]
        )
        assert r["n_tokens"] == 2


def test_sentence_transformers_gated():
    with pytest.raises((NotImplementedError, ValueError)):
        # container has no torch: the model path must fail loudly at
        # construction time, not inside an executor task
        from inside_vectordb_spark.operators.embed import _sentence_transformer_encoder

        _sentence_transformer_encoder("sentence-transformers/all-MiniLM-L6-v2")


def test_unknown_encoder_rejected(spark):
    pdf = pd.DataFrame({"doc_id": [1], "text": ["a"]})
    with pytest.raises(ValueError, match="unknown encoder"):
        encode_documents(spark.createDataFrame(pdf), encoder="word2vec")


def _install_fake_sentence_transformers(monkeypatch, load_counter):
    """Register a sentence-transformers stand-in in sys.modules. The
    fake model class is defined HERE (function scope) so cloudpickle
    serializes it by value into the mapInPandas closure — executor
    workers run the real model branch without the package installed."""
    import sys
    import types

    class FakeSentenceTransformer:
        def __init__(self, name):
            load_counter.append(name)
            self.name = name

        def encode(self, texts, show_progress_bar=False):
            # deterministic 2-d "embedding": (n_tokens, n_chars)
            return np.array(
                [[float(len(t.split())), float(len(t))] for t in texts],
                dtype=np.float64,
            )

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeSentenceTransformer
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)
    return FakeSentenceTransformer


def test_sentence_transformers_branch_end_to_end(spark, monkeypatch):
    """VERDICT r2 item 7: run the REAL-model branch (F4, reference
    ``001-get_embeddings.py:149-245``) end-to-end through mapInPandas
    with a deterministic model double — batching, alignment, and
    n_tokens fall out of the model path, not the hash path."""
    from inside_vectordb_spark.operators import embed as embed_mod

    loads: list[str] = []
    _install_fake_sentence_transformers(monkeypatch, loads)
    monkeypatch.setattr(embed_mod, "_ST_MODEL_CACHE", {})

    texts = ["one", "two tokens", "three token text", ""]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": texts}
    )
    out = (
        encode_documents(
            spark.createDataFrame(pdf), encoder="sentence-transformers",
            model_name="fake/model",
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]
    for r, t in zip(out, texts):
        assert r["embedding"] == [float(len(t.split())), float(len(t))]
        assert r["n_tokens"] == len(t.split())


def test_sentence_transformers_model_loads_once(monkeypatch):
    """The per-process singleton: two encode calls construct the model
    exactly once (the reference loads once, encodes many)."""
    from inside_vectordb_spark.operators import embed as embed_mod

    loads: list[str] = []
    _install_fake_sentence_transformers(monkeypatch, loads)
    monkeypatch.setattr(embed_mod, "_ST_MODEL_CACHE", {})

    enc = embed_mod._sentence_transformer_encoder("fake/model")
    enc(pd.Series(["a b", "c"]))
    enc(pd.Series(["d e f"]))
    assert loads == ["fake/model"]
