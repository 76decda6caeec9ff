"""similarity_join — the one-call entry point for vector search.

The engine exposes each retrieval tier as its own operator (exact
brute force, persisted sign-LSH, deterministic IVF); a vector-DB user
doesn't pick a tier per call — they ask for "top-k neighbors, maybe
filtered" and the store routes by corpus size (the reference's own
method choice: brute force for small corpora, hnswlib/FAISS once the
corpus outgrows it — ``README.md:174-193``, 002 vs 003/004). This
facade encodes that routing as ONE dispatching function over the
already-proven operators; every branch returns the same
(query_id, doc_id, score, rank) contract with the engine-wide
rounded-6dp score and (score DESC, id ASC) tie-break.

Routing rule (``method="auto"``):

- ``n <= exact_cutoff``  → exact: the O(Q·N) broadcast nested loop is
  the FASTEST plan while the corpus fits a scan-and-score pass
  (reference 002); with a predicate, the broadcast HASH join twin.
- ``n <= ivf_cutoff``    → persisted sign-LSH index (bucket-pruned
  candidate scan, exact rerank; predicate composes with the index as
  a rerank post-filter) — reference 003's hnswlib role.
- larger                 → deterministic IVF (bounded quantizer,
  probe pruning) — reference 004's FAISS role.

``corpus_size`` short-circuits the count when the caller already
knows it (a real store reads it from table stats; Spark exposes it
via the catalog at zero cost — we never force a count on a path the
caller pre-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from inside_vectordb_spark import _meta_io as mio

EXACT_CUTOFF = 100_000
IVF_CUTOFF = 50_000_000


def similarity_join(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    *,
    method: str = "auto",
    filter_col: str | None = None,
    corpus_size: int | None = None,
    exact_cutoff: int = EXACT_CUTOFF,
    ivf_cutoff: int = IVF_CUTOFF,
    index_path: str | None = None,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Top-k cosine similarity join, routed by corpus size (or forced
    via ``method`` in {"exact", "signlsh", "ivf_det"}). Returns
    (query_id, doc_id, score, rank).

    ``filter_col``: optional metadata predicate — rank only corpus
    rows whose value equals the query's (all three routes: the exact
    route hash-joins on the predicate; the ANN routes post-filter
    the rerank join, the strategy real vector stores use when the
    filter is not bucket-aligned)."""
    if method == "auto":
        n = corpus_size if corpus_size is not None else corpus.count()
        if n <= exact_cutoff:
            method = "exact"
        elif n <= ivf_cutoff:
            method = "signlsh"
        else:
            method = "ivf_det"

    if method == "exact":
        from inside_vectordb_spark.operators.topk import (
            exact_cosine_topk,
            filtered_cosine_topk,
        )

        if filter_col is not None:
            return filtered_cosine_topk(
                queries,
                corpus,
                k=k,
                query_id=query_id_col,
                query_vec=vec_col,
                corpus_id=id_col,
                corpus_vec=vec_col,
                filter_col=filter_col,
            )
        return exact_cosine_topk(
            queries,
            corpus,
            k=k,
            query_id=query_id_col,
            query_vec=vec_col,
            corpus_id=id_col,
            corpus_vec=vec_col,
        )

    if method == "signlsh":
        from inside_vectordb_spark.operators.ann_sign import ann_sign_topk_indexed

        if index_path is None:
            # key the default artifact dir by the CORPUS identity, not
            # one fixed location (review r9-4): two corpora alternating
            # through the facade at a shared path each see a
            # fingerprint mismatch and silently pay a full index
            # rebuild per call. The fingerprint is the same cheap
            # (count, id-range) aggregate ensure_sign_index computes
            # anyway; hashing it keys the dir without a registry-style
            # sf_dir. Callers serving a registry-built index pass
            # index_path explicitly (as registry/embed.py does).
            import hashlib as _hl
            import json as _json

            from inside_vectordb_spark.operators.ann_index import (
                _corpus_fingerprint,
            )

            fp = _corpus_fingerprint(corpus, id_col)
            key = _hl.md5(
                _json.dumps(fp, sort_keys=True).encode()
            ).hexdigest()[:16]
            index_path = mio.join(
                mio.artifacts_root(), "similarity_join", f"sign_{key}"
            )
        path = index_path
        return ann_sign_topk_indexed(
            spark,
            queries,
            corpus,
            path,
            k=k,
            query_id_col=query_id_col,
            id_col=id_col,
            vec_col=vec_col,
            filter_col=filter_col,
        )

    if method == "ivf_det":
        from inside_vectordb_spark.operators.ann_sign import ann_ivf_det_topk

        return ann_ivf_det_topk(
            spark,
            queries,
            corpus,
            k=k,
            n_probe=n_probe,
            query_id_col=query_id_col,
            id_col=id_col,
            vec_col=vec_col,
            filter_col=filter_col,
        )

    raise ValueError(f"unknown method: {method!r}")
