"""Embedding generation (F4) — the pipeline's front door.

Reference semantics: ``001-get_embeddings.py:149-245`` — load a
sentence-transformer once per process, encode the corpus in batches
of ``BATCH_SIZE`` (``001:22``), emit a dense float matrix aligned
with the id list. Here that becomes an Arrow-batched ``mapInPandas``
map: no shuffle, model cached per executor process, one encode call
per Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``
plays the reference's BATCH_SIZE role).

Two encoders behind one plumbing:

- ``hash`` (default, hermetic): the deterministic hashing-trick
  projection SURVEY.md §7 Phase 4 prescribes. Each token t maps to
  bucket ``h(t) % dim`` with sign ``±1`` from the next hash bit, and
  the embedding is the signed token-count vector. The hash is the
  engine's portable 60-bit md5 prefix (``operators/dedup.py:
  _hex15_to_long``), so the WHOLE encoder is re-expressible in
  DuckDB SQL — the registered ``text_embeddings`` query is fully
  hash-matched, which makes the mapInPandas plumbing itself
  oracle-verified (batching, alignment, empty-text handling).
  Components are exact integers → no float tolerance needed.

- ``sentence-transformers`` (optional): the reference's real model
  path. Import-gated — this container has no torch, so requesting it
  raises with a clear message; on a real cluster the lazy
  per-executor singleton pattern below is exactly how the model
  would load (once per python worker, NOT per batch/row).

Scale notes (100 TB): encoding is embarrassingly parallel — a narrow
map over document partitions, no shuffle, output written straight to
parquet (S7). Arrow batch size bounds executor memory at
O(batch × dim). GPU executors slot in by swapping the encoder fn.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DEFAULT_DIM = 64  # matches the driver testdata embedding dimension


def _token_hash(tok: str) -> int:
    """Portable 60-bit hash: first 15 hex chars of md5(utf-8 bytes).
    Identical to Spark ``conv(substring(md5(t),1,15),16,10)`` and
    DuckDB ``('0x' || substr(md5(t),1,15))::BIGINT`` — the same trick
    the simhash operator hash-matches with (``operators/dedup.py``)."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)


import re

# THE whitespace class for the hash-encoder chain, spelled explicitly
# so Python and the DuckDB oracle split identically: RE2's \s is
# [\t\n\f\r ] (NO vertical tab, NO Unicode spaces), Python str.split()
# splits on ALL Unicode whitespace, Java's \s adds \x0B — three
# different answers for 'a\x0bb' (review r9; same divergence class
# functions/text.py:normalize_text documents and avoids the same way).
_WS_RE = re.compile(r"[ \t\n\f\r]+")


def _hash_tokenize(text) -> list[str]:
    if not isinstance(text, str):
        return []
    return [t for t in _WS_RE.split(text) if t]


def hash_embed_texts(texts: pd.Series, dim: int = DEFAULT_DIM) -> tuple[np.ndarray, np.ndarray]:
    """Hashing-trick encoder for one batch: returns (B, dim) int64
    signed token-count matrix + (B,) token counts. Tokenization is
    ``_hash_tokenize`` — the explicit whitespace class both engines
    share. Token → (bucket, sign) is memoized per batch: natural-
    language token frequency is Zipfian, so the same tokens repeat
    thousands of times per batch and the md5 was the dominant
    Python-side cost (review r9)."""
    mat = np.zeros((len(texts), dim), dtype=np.int64)
    counts = np.zeros(len(texts), dtype=np.int32)
    memo: dict[str, tuple[int, int]] = {}
    for i, text in enumerate(texts):
        toks = _hash_tokenize(text)
        counts[i] = len(toks)
        for tok in toks:
            bs = memo.get(tok)
            if bs is None:
                h = _token_hash(tok)
                bs = (h % dim, 1 if (h // dim) % 2 == 0 else -1)
                memo[tok] = bs
            mat[i, bs[0]] += bs[1]
    return mat, counts


_ST_MODEL_CACHE: dict[str, object] = {}


def _sentence_transformer_encoder(model_name: str) -> Callable[[pd.Series], np.ndarray]:
    """Lazy per-process model singleton (reference pattern:
    ``001-get_embeddings.py:149-171`` loads once, encodes many)."""
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore
    except ImportError as exc:  # pragma: no cover - container has no torch
        raise NotImplementedError(
            "sentence-transformers is not installed in this environment; "
            "use encoder='hash' (deterministic fallback) or run on a "
            "cluster image with torch + sentence-transformers"
        ) from exc

    def encode(texts: pd.Series) -> np.ndarray:  # pragma: no cover
        model = _ST_MODEL_CACHE.get(model_name)
        if model is None:
            model = SentenceTransformer(model_name)
            _ST_MODEL_CACHE[model_name] = model
        return np.asarray(
            model.encode(list(texts.fillna("")), show_progress_bar=False),
            dtype=np.float64,
        )

    return encode


def encode_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    encoder: str = "hash",
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
) -> DataFrame:
    """F4: batch-encode a text column into a dense embedding column.

    Returns ``(doc_id LONG, embedding ARRAY<DOUBLE>, n_tokens INT)``.
    One Arrow-batched python stage, no shuffle; the plan stays a
    narrow map over the document scan (text + id are the only columns
    read — column pruning reaches the parquet scan).
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
            StructField("n_tokens", IntegerType()),
        ]
    )

    if encoder == "hash":
        model_encode = None
    elif encoder == "sentence-transformers":
        model_encode = _sentence_transformer_encoder(model_name)
    else:
        raise ValueError(f"unknown encoder: {encoder!r}")

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if model_encode is None:
                mat, counts = hash_embed_texts(pdf["text"], dim)
                emb = [row.astype(np.float64).tolist() for row in mat]
            else:  # pragma: no cover - model path needs torch
                m = model_encode(pdf["text"])
                emb = [row.tolist() for row in m]
                counts = pdf["text"].map(lambda t: len(_hash_tokenize(t))).to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "embedding": emb,
                    "n_tokens": counts.astype(np.int32),
                }
            )

    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .mapInPandas(encode_batches, schema=schema)
    )
