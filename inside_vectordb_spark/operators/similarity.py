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

``method="hnsw"`` routes the persisted vendored-HNSW graph tier
(``operators/hnsw_index.py`` — the closest analogue to the
reference's actual hnswlib index, ``003:313-343``) explicitly. It is
not part of the auto ladder: graph builds are insertion-order
dependent, so auto stays on the hash-verifiable routes and callers
opt into the graph tier by name, exactly as the reference opts into
hnswlib by running 003.

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


def _corpus_keyed_path(corpus: DataFrame, id_col: str, vec_col: str, kind: str) -> str:
    """Default artifact dir keyed by the CORPUS identity, not one
    fixed location (review r9-4): two corpora alternating through the
    facade at a shared path each see a fingerprint mismatch and
    silently pay a full index rebuild per call. The key folds a cheap
    CONTENT signal (6dp sum of each vector's first component) into the
    (count, id-range) census the ensure_* fingerprint uses (advice
    r10): two corpora with the same id census but different vectors —
    e.g. re-encoded embeddings at unchanged ids — land in distinct
    dirs instead of colliding onto one whose census-only ensure check
    would silently serve the stale index. One bounded 1-row aggregate;
    keyed dirs accumulate one small index per distinct corpus (no
    eviction — callers with churning corpora should pass index_path
    and own its lifecycle)."""
    import hashlib as _hl
    import json as _json

    from pyspark.sql import functions as F

    # the content signals are INTEGER sums (quantized to 1e-3 per
    # vector before summing): float summation order varies with
    # partition scheduling, so a double-sum key could flip between
    # runs of the same corpus and re-trigger the rebuild thrash this
    # keying exists to prevent; integer addition is order-independent.
    # Three independent signals (advice r11: first-component-only let
    # corpora differing beyond dim 1 collide onto one dir and serve a
    # stale index): first component, last component, and the squared
    # L2 norm, which folds EVERY dimension into the key.
    sq_norm = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    row = corpus.select(
        F.count(F.col(id_col)).alias("n"),
        F.min(F.col(id_col)).alias("lo"),
        F.max(F.col(id_col)).alias("hi"),
        F.sum(
            (F.element_at(F.col(vec_col), 1) * 1000).cast("long")
        ).alias("c1"),
        F.sum(
            (F.element_at(F.col(vec_col), -1) * 1000).cast("long")
        ).alias("cz"),
        F.sum((sq_norm * 1000).cast("long")).alias("nrm"),
    ).first()
    key = _hl.md5(
        _json.dumps(
            [
                row["n"],
                str(row["lo"]),
                str(row["hi"]),
                str(row["c1"]),
                str(row["cz"]),
                str(row["nrm"]),
            ]
        ).encode()
    ).hexdigest()[:16]
    return mio.join(mio.artifacts_root(), "similarity_join", f"{kind}_{key}")


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
    dim: int | None = None,
    ef_search: int = 128,
) -> DataFrame:
    """Top-k cosine similarity join, routed by corpus size (or forced
    via ``method`` in {"exact", "signlsh", "ivf_det", "hnsw"}).
    Returns (query_id, doc_id, score, rank).
    ``dim``/``ef_search`` apply to the hnsw route only (``dim`` is
    inferred from the corpus with a 1-row aggregate when omitted).

    ``filter_col``: optional metadata predicate — rank only corpus
    rows whose value EQUALS the query's, self-matches excluded; one
    contract on ALL FOUR routes (advice r11 — the graph route
    previously read it as a global boolean predicate, silently
    diverging from the other three). The exact route hash-joins on
    the predicate; signlsh/ivf_det post-filter the rerank join; the
    hnsw route runs ONE grouped filter-during-search pass (the
    per-value allow masks are hnswlib's filter-function, cut inside
    each task — selective predicates keep graph recall at a
    V-independent cost). Callers who want a raw global allow-list on
    the graph tier call ``ann_hnsw_topk_indexed(filter_df=...)``
    directly."""
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
            index_path = _corpus_keyed_path(corpus, id_col, vec_col, "sign")
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

    if method == "hnsw":
        from pyspark.sql import functions as F

        from inside_vectordb_spark.operators.hnsw_index import (
            ann_hnsw_topk_indexed,
            ensure_hnsw_index,
        )

        if index_path is None:
            index_path = _corpus_keyed_path(corpus, id_col, vec_col, "hnsw")
        if dim is None:
            dim = int(
                corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
            )
        ensure_hnsw_index(
            corpus, index_path, dim=dim, id_col=id_col, vec_col=vec_col
        )
        if filter_col is None:
            return ann_hnsw_topk_indexed(
                spark,
                queries,
                index_path,
                k=k,
                ef_search=ef_search,
                query_id=query_id_col,
                query_vec=vec_col,
            )
        # Per-query equality (advice r11; SINGLE-PASS since r12): the
        # (id, value) mapping rides each partition scan broadcast-side
        # and the per-value allow masks are cut INSIDE the task, so
        # the whole predicated batch costs one graph scan + one kernel
        # reconstruct per partition regardless of how many distinct
        # values it carries (the first cut looped one full search per
        # value — V graph scans). Disallowed nodes route the beam but
        # never surface (hnswlib filter-function semantics);
        # NULL-valued queries match nothing (SQL equality).
        # Self-exclusion matches signlsh: over-fetch by one, drop
        # self, re-rank in the original (score DESC, doc_id ASC)
        # order.
        from pyspark.sql import Window

        if (
            queries.filter(F.col(filter_col).isNotNull()).limit(1).count()
            == 0
        ):
            raise ValueError(
                f"filter_col={filter_col!r}: no non-NULL query filter values"
            )
        fetched = ann_hnsw_topk_indexed(
            spark,
            queries,
            index_path,
            k=k + 1,
            ef_search=ef_search,
            query_id=query_id_col,
            query_vec=vec_col,
            query_filter_col=filter_col,
            corpus_filter_df=corpus.select(
                F.col(id_col).alias("vec_id"), F.col(filter_col)
            ),
        )
        w = Window.partitionBy("query_id").orderBy("rank")
        return (
            fetched.filter(F.col("query_id") != F.col("doc_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
        )

    raise ValueError(f"unknown method: {method!r}")
