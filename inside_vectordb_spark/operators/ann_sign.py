"""Deterministic sign-LSH (random-hyperplane) ANN with a FULL DuckDB
oracle — the engine's hash-verifiable LSH tier.

The np.random hyperplane tier (``operators/ann.py``) matches the
reference's stochastic index builds (``003-hnswlib_demo.py:174-230``)
but has no SQL twin, so its driver row is rows-only. This variant
derives the hyperplanes from md5 parity bits instead: every sign is a
portable constant, the bucket computation is a plain Catalyst
expression, and the whole index → probe → rerank pipeline restates in
DuckDB SQL. Sign-random hyperplanes (components ±1) are the classic
Charikar construction — for cosine LSH the component distribution
only needs symmetry, so ±1 planes carry the same collision-probability
guarantee (P[same bit] = 1 − θ/π) as Gaussian ones.

``bits`` and ``dim`` are BUILD PARAMETERS (recorded in the index
meta.json and mirrored into the generated oracle SQL), not module
constants: the bucket count 2^bits is the candidate-set knob — at a
100× corpus the same module builds a 2^10- or 2^14-bucket index by
passing ``bits`` instead of editing source. ``SIGN_BITS``/``SIGN_DIM``
remain as the defaults the registered sf-scale queries use.

Scale shape (same as the stochastic tier): the corpus is scanned once
to bucket (narrow projection, no shuffle); the index is parquet
partitioned by bucket, so probing prunes unread partitions; the
candidate join is bucket-keyed; exact cosine rerank touches only
candidates.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.functions.vector import cosine_similarity

SIGN_BITS = 6  # default: 64 buckets; ~N/64 candidates per query
SIGN_DIM = 64


def _sign(bit: int, j: int) -> int:
    h = hashlib.md5(f"sign:{bit}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


@lru_cache(maxsize=32)
def sign_planes(bits: int = SIGN_BITS, dim: int = SIGN_DIM) -> tuple[tuple[int, ...], ...]:
    """±1 hyperplane components for a (bits, dim) index build — pure
    functions of (bit, j), so any two processes (Spark executors, the
    DuckDB oracle generator, a future rebuild) derive identical planes
    without shipping an artifact."""
    if bits < 2:
        raise ValueError(
            f"sign_planes: bits must be >= 2 (got {bits}) — the probe "
            "argmin needs at least one comparable pair of planes, and "
            "a 1-bit index degenerates to two buckets of half the "
            "corpus each"
        )
    return tuple(tuple(_sign(b, j) for j in range(dim)) for b in range(bits))


# Default planes shared by the registered sf-scale queries and their
# generated oracle SQL.
SIGN_PLANES: tuple[tuple[int, ...], ...] = sign_planes(SIGN_BITS, SIGN_DIM)


def spark_plane_dot_sql(vec_expr: str, signs) -> str:
    """The plane dot in Spark SQL: a left-associated literal sum over
    0-indexed elements — the identical operand sequence to the
    ``aggregate(zip_with(...))`` fold it replaces (fold: ((0.0 + x₀s₀)
    + x₁s₁) + …; literal sum: ((x₀s₀ + x₁s₁) + x₂s₂) + … — the same
    double-rounding chain, since 0.0 + x is exact), and to the DuckDB
    twin ``plane_dot_sql`` (1-indexed there). One parsed string per
    plane replaces ~70 py4j round trips, and the flat arithmetic
    whole-stage-codegens where the interpreted higher-order-function
    fold did not (optimization r12, guide §4.1 'prefer built-in
    expressions')."""
    return " + ".join(
        f"CAST({vec_expr}[{j}] AS DOUBLE) * ({float(s)})"
        for j, s in enumerate(signs)
    )


def spark_bucket_sql(vec_expr: str, planes=None) -> str:
    """Spark-SQL twin of ``bucket_sql`` (0-indexed arrays)."""
    planes = SIGN_PLANES if planes is None else planes
    bits = [
        f"(CASE WHEN ({spark_plane_dot_sql(vec_expr, signs)}) >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, signs in enumerate(planes)
    ]
    return "CAST((" + " + ".join(bits) + ") AS INT)"


def sign_bucket(vec_col: Column | str, planes=None) -> Column:
    """Bucket id = the sign-bit signature of the vector against the
    hyperplanes — pure Catalyst (one left-assoc dot per plane,
    identical order to the SQL twin's left-assoc sum)."""
    planes = SIGN_PLANES if planes is None else planes
    from ..functions.vector import _simple

    # Only a simple identifier may be interpolated into the parsed-SQL
    # fast path (advice r12); anything else goes through the Column
    # builder, which handles any name.
    if _simple(vec_col):
        return F.expr(spark_bucket_sql(vec_col, planes))
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    total = None
    for b, signs in enumerate(planes):
        sarr = F.array(*[F.lit(float(s)) for s in signs])
        dot = F.aggregate(
            F.zip_with(v, sarr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        total = bit if total is None else total + bit
    return total.cast("int")


def plane_dot_sql(vec_expr: str, signs) -> str:
    """The plane dot as a left-associated literal sum — the same
    fold order as ``sign_bucket``'s aggregate, so signs agree
    bitwise."""
    return " + ".join(
        f"{vec_expr}[{j + 1}] * ({float(s)})" for j, s in enumerate(signs)
    )


def bucket_sql(vec_expr: str, planes=None) -> str:
    planes = SIGN_PLANES if planes is None else planes
    bits = [
        f"(CASE WHEN ({plane_dot_sql(vec_expr, signs)}) >= 0 THEN {1 << b} ELSE 0 END)"
        for b, signs in enumerate(planes)
    ]
    return "(" + " + ".join(bits) + ")"


def ensure_sign_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_BITS,
    dim: int = SIGN_DIM,
) -> str:
    """Build (or reuse) the persisted sign-LSH index: (id, bucket)
    parquet partitioned by bucket, plus meta.json carrying the build
    params (``bits``/``dim`` — the bucket-count knob) and a corpus
    fingerprint (count + id range) so a changed corpus OR changed
    params at the same path trigger a rebuild."""
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint

    want = {
        "kind": "sign_lsh",
        "bits": bits,
        "dim": dim,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    # subset compare: lifecycle bookkeeping (n_deleted) must not
    # invalidate the cache — only changed params/corpus do
    meta = mio.read_json(mio.join(path, "meta.json"))
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return path
    from inside_vectordb_spark.operators.ann_index import _begin_rebuild

    # invalidate the completeness marker BEFORE touching any data dir:
    # a crash mid-rebuild must leave "no index" rather than a stale
    # meta validating torn buckets (with the tombstones already gone)
    _begin_rebuild(path)
    planes = sign_planes(bits, dim)
    # fresh lifecycle: tombstones from a prior index must not leak
    # into the rebuilt one (same contract as the SQ tier)
    mio.remove_tree(mio.join(path, "tombstones"))
    (
        corpus.select(
            F.col(id_col).alias("id"),
            sign_bucket(vec_col, planes).alias("bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "buckets"))
    )
    mio.write_json(mio.join(path, "meta.json"), want)
    return path


def pruned_lists(spark: SparkSession, path: str, probes: DataFrame) -> DataFrame:
    """The IVF inverted-lists scan pruned to the probed centroids:
    collect the distinct probed cid set (≤ |queries| × n_probe rows —
    the audited driver-size contract) and filter the cid-partitioned
    parquet with literal values, so unprobed list partitions cost
    zero I/O (PartitionFilters, the FAISS nprobe economics). Shared
    by both det-IVF indexed searches and the registry's probe sweep
    (review r9-3: the sweep read 100% of the lists to use at most
    |Q|·4 of them)."""
    probed = sorted({r["cid"] for r in probes.select("cid").distinct().collect()})
    return spark.read.parquet(os.path.join(path, "lists")).filter(
        F.col("cid").isin(probed)
    )


def _index_scan(spark: SparkSession, path: str, probed: list[int]) -> DataFrame:
    """The pruned (id, bucket) scan every sign-LSH search shares:
    partition-pruned to the probed buckets, with tombstoned ids
    anti-joined out (no broadcast hint — tombstones accumulate until
    the next rebuild, so AQE picks broadcast only while the set is
    actually small), so deleted vectors can never reach candidate
    generation or the rerank."""
    idx = (
        spark.read.parquet(os.path.join(path, "buckets"))
        .filter(F.col("bucket").isin(probed))
    )
    tomb = mio.join(path, "tombstones")
    if mio.is_dir(tomb):
        idx = idx.join(spark.read.parquet(tomb), "id", "left_anti")
    return idx


def ann_sign_topk_indexed(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str | None = None,
    bits: int = SIGN_BITS,
    dim: int = SIGN_DIM,
    exclude_self: bool | None = None,
) -> DataFrame:
    """Sign-LSH search against the persisted index: bucket the queries
    (Catalyst), prune the index scan to the probed buckets (genuine
    partition pruning — the probed bucket list is collected driver-side,
    bounded by the query count), bucket-join for candidates, exact
    cosine rerank, top-k per query with (score DESC, doc_id ASC)
    tie-break. Returns (query_id, doc_id, score, rank).

    ``filter_col``: optional metadata predicate — rank only corpus
    rows whose ``filter_col`` equals the query's (filtered ANN). The
    predicate composes WITH the index: bucket pruning still bounds
    the candidate scan, and the attribute filter lands on the rerank
    join — post-filtering, the strategy real vector stores use when
    the filter is not bucket-aligned.

    ``exclude_self``: drop rows where query_id == doc_id (self-
    retrieval). Decoupled from ``filter_col`` so the metadata
    predicate doesn't silently change self-match semantics; the
    default (None) preserves the historical coupling — self-exclusion
    on iff a filter is set — which the registered queries' oracles
    encode."""
    ensure_sign_index(
        spark, corpus, path, id_col=id_col, vec_col=vec_col, bits=bits, dim=dim
    )
    if exclude_self is None:
        exclude_self = filter_col is not None
    planes = sign_planes(bits, dim)
    qcols = [
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        sign_bucket(vec_col, planes).alias("bucket"),
    ]
    if filter_col is not None:
        qcols.append(F.col(filter_col).alias("__qf"))
    qb = queries.select(*qcols)
    probed = sorted({r["bucket"] for r in qb.select("bucket").distinct().collect()})
    idx = _index_scan(spark, path, probed)
    keep = ["query_id", "__qv", F.col("id").alias("doc_id")] + (
        ["__qf"] if filter_col is not None else []
    )
    cand = qb.join(idx, "bucket").select(*keep)
    ccols = [F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__cv")] + (
        [F.col(filter_col).alias("__cf")] if filter_col is not None else []
    )
    withvec = cand.join(corpus.select(*ccols), "doc_id")
    if filter_col is not None:
        withvec = withvec.filter(F.col("__qf") == F.col("__cf"))
    if exclude_self:
        withvec = withvec.filter(F.col("query_id") != F.col("doc_id"))
    scored = withvec.select(
        "query_id",
        "doc_id",
        F.round(cosine_similarity("__qv", "__cv"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def sign_bucket_probes(vec_col: Column | str, planes=None) -> Column:
    """ARRAY<INT> of probed buckets: the base signature plus the
    signature with its lowest-|margin| bit flipped — classic
    margin-based multiprobe (Lv et al. '07): the plane the vector is
    closest to is the likeliest wrong bit, so flipping it roughly
    doubles recall for 2× candidate cost. Ties break on the lowest
    bit index. Same sequential-fold dots as ``sign_bucket``, so the
    SQL twin agrees bitwise."""
    planes = SIGN_PLANES if planes is None else planes
    n_bits = len(planes)
    v = F.transform(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        lambda x: x.cast("double"),
    )
    dots = []
    for signs in planes:
        sarr = F.array(*[F.lit(float(s)) for s in signs])
        dots.append(
            F.aggregate(
                F.zip_with(v, sarr, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    base = None
    for b, d in enumerate(dots):
        bit = F.when(d >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        base = bit if base is None else base + bit
    # argmin |dot| with lowest-index tie-break: strict < against all
    # previous planes, <= against all later ones.
    flip = None
    for b in range(n_bits):
        cond = None
        for o in range(n_bits):
            if o == b:
                continue
            c = (
                F.abs(dots[b]) < F.abs(dots[o])
                if o < b
                else F.abs(dots[b]) <= F.abs(dots[o])
            )
            cond = c if cond is None else cond & c
        flip = F.when(cond, F.lit(1 << b)) if flip is None else flip.when(
            cond, F.lit(1 << b)
        )
    return F.array(
        base.cast("int"), (base.cast("int")).bitwiseXOR(flip.cast("int"))
    )


def probes_sql(vec_expr: str, planes=None) -> str:
    """SQL twin of ``sign_bucket_probes`` (same argmin tie-break)."""
    planes = SIGN_PLANES if planes is None else planes
    n_bits = len(planes)
    dots = [f"({plane_dot_sql(vec_expr, signs)})" for signs in planes]
    base = bucket_sql(vec_expr, planes)
    whens = []
    for b in range(n_bits):
        conds = []
        for o in range(n_bits):
            if o == b:
                continue
            op = "<" if o < b else "<="
            conds.append(f"abs({dots[b]}) {op} abs({dots[o]})")
        whens.append(f"WHEN {' AND '.join(conds)} THEN {1 << b}")
    flip = "(CASE " + " ".join(whens) + " END)"
    return f"[{base}, xor({base}, {flip})]"


def ann_sign_multiprobe_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_BITS,
    dim: int = SIGN_DIM,
) -> DataFrame:
    """Multiprobe sign-LSH against the persisted index: each query
    probes its base bucket AND the lowest-margin bit-flip bucket
    (2× candidates, ~2× recall — the X3 ef-style knob on the
    deterministic tier). Same pruned scan / bucket join / exact
    rerank shape as the single-probe search."""
    ensure_sign_index(
        spark, corpus, path, id_col=id_col, vec_col=vec_col, bits=bits, dim=dim
    )
    planes = sign_planes(bits, dim)
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(sign_bucket_probes(vec_col, planes)).alias("bucket"),
    )
    probed = sorted({r["bucket"] for r in qb.select("bucket").distinct().collect()})
    idx = _index_scan(spark, path, probed)
    cand = qb.join(idx, "bucket").select(
        "query_id", "__qv", F.col("id").alias("doc_id")
    )
    withvec = cand.join(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__cv")),
        "doc_id",
    )
    scored = withvec.select(
        "query_id",
        "doc_id",
        F.round(cosine_similarity("__qv", "__cv"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ann_sign_probe_stats(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    n_probes: int = 1,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_BITS,
    dim: int = SIGN_DIM,
) -> DataFrame:
    """The knob-sweep observable (X3/B3, the reference's ef sweep
    ``003-hnswlib_demo.py:408-458`` restated for the LSH tier): for a
    probe setting, the per-query CANDIDATE COUNT (the work the knob
    buys) and the best rounded cosine among candidates (the quality it
    buys). ``n_probes`` ∈ {1, 2}: 1 = base bucket, 2 = base + the
    lowest-|margin| bit flip. Returns (query_id, n_candidates,
    top1_score) — deterministic per-row values, fully SQL-restateable,
    and monotone in ``n_probes`` (probe-2 candidates ⊇ probe-1)."""
    if n_probes not in (1, 2):
        raise ValueError("n_probes must be 1 or 2")
    ensure_sign_index(
        spark, corpus, path, id_col=id_col, vec_col=vec_col, bits=bits, dim=dim
    )
    planes = sign_planes(bits, dim)
    bucket = (
        sign_bucket(vec_col, planes)
        if n_probes == 1
        else F.explode(sign_bucket_probes(vec_col, planes))
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        bucket.alias("bucket"),
    )
    probed = sorted({r["bucket"] for r in qb.select("bucket").distinct().collect()})
    idx = _index_scan(spark, path, probed)
    cand = qb.join(idx, "bucket").select(
        "query_id", "__qv", F.col("id").alias("doc_id")
    )
    withvec = cand.join(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__cv")),
        "doc_id",
    )
    return (
        withvec.groupBy("query_id")
        .agg(
            F.count("*").alias("n_candidates"),
            F.max(F.round(cosine_similarity("__qv", "__cv"), 6)).alias(
                "top1_score"
            ),
        )
    )


def ann_sign_probe_sweep(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_BITS,
    dim: int = SIGN_DIM,
) -> DataFrame:
    """Both probe settings of the knob sweep in ONE candidate pass:
    (setting ∈ {probe1, probe2}, query_id, n_candidates, top1_score).

    ``ann_sign_probe_stats`` per setting scans/scores its full
    candidate set, and probe2's candidates are a superset of probe1's
    — two calls score every base-bucket candidate twice and collect
    the probed-bucket list twice. Here each query explodes to its
    (probe_rank, bucket) pairs ONCE (rank 0 = base, 1 = margin flip;
    a doc lives in exactly one bucket, so the two probe sets are
    disjoint), one pruned index scan + one corpus join scores every
    candidate exactly once, and a ROLLUP on (query, rank) produces
    both grains in a single aggregation pass: the (query, rank=0)
    rows are the probe1 setting, the rank-collapsed rows are probe2
    (their count/max over both disjoint probe sets ≡ the two-bucket
    search). No union of re-planned subtrees, no reliance on runtime
    exchange reuse — the plan has exactly one candidate join.
    Candidate scoring work drops ~40% vs the two-call form and the
    driver round-trips halve (one probed-bucket collect)."""
    ensure_sign_index(
        spark, corpus, path, id_col=id_col, vec_col=vec_col, bits=bits, dim=dim
    )
    planes = sign_planes(bits, dim)
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.posexplode(sign_bucket_probes(vec_col, planes)).alias("__p", "bucket"),
    )
    probed = sorted({r["bucket"] for r in qb.select("bucket").distinct().collect()})
    idx = _index_scan(spark, path, probed)
    withvec = (
        qb.join(idx, "bucket")
        .select("query_id", "__qv", "__p", F.col("id").alias("doc_id"))
        .join(
            corpus.select(
                F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__cv")
            ),
            "doc_id",
        )
    )
    per = withvec.rollup("query_id", "__p").agg(
        F.count("*").alias("n_candidates"),
        F.max(F.round(cosine_similarity("__qv", "__cv"), 6)).alias("top1_score"),
        F.grouping("__p").alias("__gp"),
        F.grouping("query_id").alias("__gq"),
    )
    return per.filter(
        (F.col("__gq") == 0) & ((F.col("__gp") == 1) | (F.col("__p") == 0))
    ).select(
        F.when(F.col("__gp") == 1, F.lit("probe2"))
        .otherwise(F.lit("probe1"))
        .alias("setting"),
        "query_id",
        "n_candidates",
        "top1_score",
    )


def upsert_sign_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental maintenance of the persisted sign-LSH index — the
    hnswlib batched ``add_items`` loop (``003-hnswlib_demo.py:207-220``)
    as an append-only delta write: only the NEW vectors are bucketed
    (with the planes recorded in meta.json, so a bits=10 index stays a
    bits=10 index), and their rows land as extra parquet files inside
    the same bucket partitions — search needs zero changes and still
    partition-prunes. O(delta) work; the stored fingerprint merges the
    delta so a later ``ensure_sign_index`` over the full corpus
    recognizes the maintained index as current. Because the bucket
    function is deterministic, an upserted index is BIT-IDENTICAL to a
    full rebuild over base ∪ delta — which is why the registered
    upsert query shares the plain search oracle.

    Contract (FAISS ``add``): delta ids disjoint from stored ids —
    ENFORCED (including against tombstones: a re-added deleted id
    would stay permanently masked by the surviving tombstone while
    the merged fingerprint counted it — silently unsearchable).

    Runs under the index commit lock (review r9): the upsert is a
    read-modify-write on the fingerprint, and a concurrent
    ``compact_sign_index`` holding only its own lock could otherwise
    rewrite ``buckets`` from a listing that predates this append —
    silently dropping the delta while the merged fingerprint claims
    it is present."""
    with mio.commit_lock(path):
        return _upsert_sign_locked(spark, new_vectors, path, id_col, vec_col)


def _upsert_sign_locked(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
) -> dict:
    from inside_vectordb_spark.operators.ann_index import (
        _assert_disjoint_delta,
        _corpus_fingerprint,
        _merge_fingerprint,
    )

    meta = mio.read_json(mio.join(path, "meta.json"))
    if meta is None or meta.get("kind") != "sign_lsh":
        raise FileNotFoundError(f"no complete sign-LSH index at {path}")
    stored_ids = spark.read.parquet(os.path.join(path, "buckets")).select("id")
    tomb = mio.join(path, "tombstones")
    if mio.is_dir(tomb):
        stored_ids = stored_ids.unionByName(
            spark.read.parquet(tomb).select("id")
        )
    _assert_disjoint_delta(stored_ids, new_vectors.select(id_col), path)
    planes = sign_planes(meta["bits"], meta["dim"])
    (
        new_vectors.select(
            F.col(id_col).alias("id"),
            sign_bucket(vec_col, planes).alias("bucket"),
        )
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "buckets"))
    )
    meta["corpus"] = _merge_fingerprint(
        meta.get("corpus"), _corpus_fingerprint(new_vectors, id_col)
    )
    mio.write_json(mio.join(path, "meta.json"), meta)
    return meta


def delete_from_sign_index(
    spark: SparkSession, path: str, ids: list[int]
) -> dict:
    """hnswlib ``mark_deleted`` analogue on the sign-LSH tier:
    tombstone doc ids WITHOUT rewriting the bucket table — deletes
    append to a tiny ``tombstones`` parquet that search anti-joins
    out of the candidate scan (AQE-chosen strategy). O(deleted)
    bytes written;
    a rebuild (``ensure_sign_index`` on a changed corpus/params)
    compacts tombstones away. Idempotent per id. Runs under the index
    commit lock (review r9): a delete landing between compaction's
    live-row snapshot and its tombstone-dir removal would be silently
    dropped — the compacted index would resurrect the id."""
    import numpy as np
    import pandas as pd

    with mio.commit_lock(path):
        meta = mio.read_json(mio.join(path, "meta.json"))
        if meta is None or meta.get("kind") != "sign_lsh":
            raise FileNotFoundError(f"no complete sign-LSH index at {path}")
        existing = sign_deleted_ids(spark, path)
        fresh = sorted(set(int(i) for i in ids) - existing)
        if fresh:
            (
                spark.createDataFrame(
                    pd.DataFrame({"id": np.array(fresh, dtype=np.int64)})
                )
                .write.mode("append")
                .parquet(os.path.join(path, "tombstones"))
            )
            meta["n_deleted"] = meta.get("n_deleted", 0) + len(fresh)
            mio.write_json(mio.join(path, "meta.json"), meta)
        return meta


def sign_deleted_ids(spark: SparkSession, path: str) -> set[int]:
    tomb = mio.join(path, "tombstones")
    if not mio.is_dir(tomb):
        return set()
    return {r["id"] for r in mio.read_parquet_rows(tomb)}


def compact_sign_index(spark: SparkSession, path: str) -> dict:
    """OPTIMIZE for the sign-LSH tier (Delta ``OPTIMIZE`` / FAISS
    rebuild-without-retrain analogue; reference anchor: the index
    caching/rebuild economics of ``003-hnswlib_demo.py:234-251``).
    Upserts append extra parquet files into the bucket partitions and
    deletes accumulate tombstone rows that EVERY search anti-joins —
    both costs grow without bound until a full rebuild. Compaction
    folds them back to the base shape at O(index) sequential I/O and
    ZERO recompute (the bucket assignment is already materialized; no
    re-hashing, unlike a rebuild):

    1. under the commit lock, rewrite (live buckets ⊖ tombstones)
       into a fresh temp dir, one file per bucket partition;
    2. remove the completeness marker (crash from here = "no index",
       the next ensure rebuilds — marker protocol, review r6s2);
    3. swap the temp dir over ``buckets``, drop ``tombstones``;
    4. recommit meta UNCHANGED except the tombstone bookkeeping
       (``n_deleted`` → ``n_compacted_away``, plus ``compacted``).

    The corpus fingerprint deliberately stays as-is: it is a LINEAGE
    identity (base ∪ every upsert delta), not a live-row count —
    tombstone-masked deletes never changed it, so compaction (the
    same logical rows, different physical layout) must not either.
    Recomputing it over the live rows broke the search path in
    testing: ``ann_sign_topk_indexed`` auto-ensures against the
    caller's ORIGINAL corpus, and the "shrunk" fingerprint read as a
    changed corpus → silent full rebuild that resurrected every
    deleted id.

    Search results are BIT-IDENTICAL before and after (the anti-join
    masked exactly the rows compaction removed) — pinned against the
    shared oracle in tests and on the driver via
    ``ann_signlsh_compacted``. Idempotent; a compacted index has one
    file per bucket and no tombstone dir. Side effect of physical
    removal: a compacted-away id MAY be re-upserted (the disjointness
    check no longer sees it), which is correct — no tombstone remains
    to mask it."""
    with mio.commit_lock(path):
        meta = mio.read_json(mio.join(path, "meta.json"))
        if meta is None or meta.get("kind") != "sign_lsh":
            raise FileNotFoundError(f"no complete sign-LSH index at {path}")
        buckets = os.path.join(path, "buckets")
        tomb = mio.join(path, "tombstones")
        tmp = mio.join(path, "buckets_compact_tmp")
        mio.remove_tree(tmp)  # orphan from a crashed prior compaction
        live = spark.read.parquet(buckets)
        if mio.is_dir(tomb):
            live = live.join(spark.read.parquet(tomb), "id", "left_anti")
        # emptiness guard BEFORE any write: an all-tombstoned index
        # must refuse (and an empty partitioned parquet dir can't even
        # be read back for validation — UNABLE_TO_INFER_SCHEMA)
        n_live = live.count()
        if n_live == 0:
            raise ValueError(
                f"compaction would leave the sign-LSH index at {path} "
                "EMPTY (every row tombstoned) — rebuild over a fresh "
                "corpus instead"
            )
        # one file per bucket partition (each bucket lands in exactly
        # one shuffle task), same physical shape as a fresh build
        live.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(tmp)
        # validate the WRITTEN data before swapping it live
        if spark.read.parquet(tmp).count() != n_live:
            mio.remove_tree(tmp)
            raise RuntimeError(
                f"compaction wrote a torn bucket table at {tmp} — "
                "index left untouched"
            )
        from inside_vectordb_spark.operators.ann_index import _begin_rebuild

        _begin_rebuild(path)  # marker OFF before the non-atomic swap
        mio.remove_tree(buckets)
        mio.move(tmp, buckets)
        mio.remove_tree(tomb)
        removed = meta.pop("n_deleted", 0)
        if removed:
            meta["n_compacted_away"] = meta.get("n_compacted_away", 0) + removed
        meta["compacted"] = True
        mio.write_json(mio.join(path, "meta.json"), meta)
        return meta


def _assign_nearest(
    vectors: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(doc_id, cid): each vector's nearest centroid by rounded
    cosine with cid tie-break — argmax expressed as
    min(struct(-score, cid)) so it partial-aggregates map-side. THE
    assignment rule for every IVF tier (det and km, build and
    O(delta) upsert); one implementation so the rounding/tie-break
    can never diverge between the six call sites (review r6s2)."""
    ac = F.round(cosine_similarity(vec_col, "__cv"), 6)
    return (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("doc_id"),
            F.struct((-ac).alias("negs"), F.col("cid").alias("cid")).alias("__s"),
        )
        .groupBy("doc_id")
        .agg(F.min("__s").alias("__best"))
        .select("doc_id", F.col("__best.cid").alias("cid"))
    )


def ann_ivf_det_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    centroid_stride: int = 37,
    n_centroids_cap: int = 16,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str | None = None,
) -> DataFrame:
    """IVF with a DETERMINISTIC coarse quantizer — the FAISS-analogue
    tier made fully hash-verifiable (the np.random k-means IVF in
    ``operators/ann.py`` stays as the stochastic twin, rows-only).
    The centroid set is the id-selected corpus subsample
    ``id % stride == 1 AND id < stride * cap`` — BOUNDED at
    ``n_centroids_cap`` regardless of corpus size, so the quantizer
    broadcast and the per-row assignment cost are O(cap) at any scale
    (FAISS accepts any coarse quantizer; sampled-point quantizers are
    the classic training-free variant).

    Assignment/probe ordering uses cosine ROUNDED to 6 dp with
    centroid-id tie-break, so the argmax is cross-engine stable even
    at float-ulp ties — and assignment is a map-side-combinable
    struct-min AGGREGATE (no window: corpus vectors never ride a
    shuffle keyed by row id).

    Scale shape (same as the stochastic IVF): assignment is corpus ×
    broadcast(centroids) — the one-pass index-build cost; probing
    touches ``n_probe`` inverted lists per query; the exact rerank
    sees only candidates."""
    cents = corpus.filter(
        ((F.col(id_col) % centroid_stride) == 1)
        & (F.col(id_col) < centroid_stride * n_centroids_cap)
    ).select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__cv"))
    # same loud guard as the build path (review r9-4): an offset id
    # space (snowflake/partition-encoded) selects NO centroids, and
    # every downstream join is then empty — the similarity_join auto
    # route would silently return a zero-row "top-k" for any large
    # corpus with non-dense ids. The probe is a limit(1) early-exit
    # scan in the healthy case (dense ids hit the rule within the
    # first stride rows).
    if cents.limit(1).count() == 0:
        raise ValueError(
            f"ivf_det centroid rule (id % {centroid_stride} == 1, id < "
            f"{centroid_stride * n_centroids_cap}) selects no corpus rows "
            "— ids don't intersect the rule range; use the km tier or "
            "adjust stride/cap"
        )
    return _ivf_search(
        queries, corpus, cents, k, n_probe, query_id_col, id_col, vec_col,
        filter_col=filter_col,
    )


def _ivf_search(
    queries: DataFrame,
    corpus: DataFrame,
    cents: DataFrame,
    k: int,
    n_probe: int,
    query_id_col: str,
    id_col: str,
    vec_col: str,
    filter_col: str | None = None,
) -> DataFrame:
    """The assignment → probe → rerank tail every deterministic IVF
    variant shares (extracted r8 so the id-rule and hash-rule coarse
    quantizers cannot diverge in search semantics). ``cents`` =
    (cid, __cv), any id type — ordering/tie-breaks only require the
    id to be orderable, not numeric.

    ``filter_col``: optional metadata predicate — rank only corpus
    rows whose value equals the query's. Same composition as the
    sign-LSH tier: probing/assignment are untouched (the quantizer
    covers the full corpus), the predicate post-filters the rerank
    join, and self-matches are excluded iff a filter is set (the
    engine-wide coupling the registered oracles encode)."""
    # corpus -> nearest centroid: argmax rounded cosine, cid tie-break,
    # expressed as min(struct(-score, cid)) so it partial-aggregates
    assign = _assign_nearest(corpus, cents, id_col, vec_col)
    # queries -> n_probe nearest centroids (query side is small; a
    # per-query window over cap rows is bounded work)
    qcols = [F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")]
    if filter_col is not None:
        qcols.append(F.col(filter_col).alias("__qf"))
    qb = queries.select(*qcols)
    pw = Window.partitionBy("query_id").orderBy(F.desc("__pc"), F.asc("cid"))
    keep = ["query_id", "__qv", "cid"] + (
        ["__qf"] if filter_col is not None else []
    )
    probes = (
        qb.crossJoin(F.broadcast(cents))
        .withColumn("__pc", F.round(cosine_similarity("__qv", "__cv"), 6))
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= n_probe)
        .select(*keep)
    )
    cand = probes.join(assign, "cid").drop("cid")
    ccols = [F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__dv")] + (
        [F.col(filter_col).alias("__cf")] if filter_col is not None else []
    )
    withvec = cand.join(corpus.select(*ccols), "doc_id")
    if filter_col is not None:
        withvec = withvec.filter(F.col("__qf") == F.col("__cf")).filter(
            F.col("query_id") != F.col("doc_id")
        )
    scored = withvec.select(
        "query_id",
        "doc_id",
        F.round(cosine_similarity("__qv", "__dv"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def hash_centroids(
    corpus: DataFrame,
    centroid_stride: int = 7,
    n_centroids_cap: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash-derived deterministic coarse quantizer for corpora whose
    ids are STRINGS (BEIR 'MED-10'-style keys, reference
    ``000-get_data.py:141`` — the id-modulo rule is unusable there):
    centroid candidates are rows whose 60-bit md5(id) prefix is ≡ 0
    mod ``stride``, bounded to the ``cap`` SMALLEST matching ids (a
    distributed TakeOrdered, never a single-partition window). Works
    for any orderable id type; restates in DuckDB as
    ``('0x' || substr(md5(id), 1, 15))::BIGINT % stride = 0 …
    ORDER BY id LIMIT cap``."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return (
        corpus.filter((h % centroid_stride) == 0)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__cv"))
        .orderBy("cid")
        .limit(n_centroids_cap)
    )


def ann_ivf_hash_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    centroid_stride: int = 7,
    n_centroids_cap: int = 16,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str | None = None,
) -> DataFrame:
    """``ann_ivf_det_topk``'s string-id-capable sibling: identical
    search semantics (shared ``_ivf_search`` tail — assignment argmax,
    n_probe probing, exact rerank, all rounded-6dp + id tie-break),
    but the coarse quantizer is the md5-derived ``hash_centroids``
    rule, so a corpus keyed by STRING document ids (the reference's
    native key type) gets the same training-free deterministic IVF
    tier. Fully hash-verifiable: md5 arithmetic restates in DuckDB.

    The centroid set is persisted and counted eagerly: an empty
    quantizer (stride too large for the corpus — P(no id matches)
    ≈ (1−1/stride)^N) must FAIL LOUDLY here, exactly like
    ``ensure_ivf_det_index``'s empty-rule guard, never serve empty
    top-k forever; the count also materializes the TakeOrdered once
    for both its consumers (assignment and probing) (review r8).
    The ≤``n_centroids_cap``-row persist is not unpersisted — the
    returned plan reads it lazily; blocks evict LRU and correctness
    never depends on the persist (advisory r9)."""
    from pyspark import StorageLevel

    cents = hash_centroids(
        corpus, centroid_stride, n_centroids_cap, id_col, vec_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if cents.count() == 0:
        raise ValueError(
            f"ivf_hash centroid rule (md5({id_col}) prefix % "
            f"{centroid_stride} == 0) selects no corpus rows — an empty "
            "quantizer would serve empty top-k results; lower the stride"
        )
    return _ivf_search(
        queries, corpus, cents, k, n_probe, query_id_col, id_col, vec_col,
        filter_col=filter_col,
    )


def ensure_ivf_det_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    centroid_stride: int = 37,
    n_centroids_cap: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Persist the deterministic-IVF assignment table as parquet
    PARTITIONED BY centroid id — the inverted lists as directory
    layout, so probing n_probe lists is genuine partition pruning
    (unprobed lists are never read). The quantizer itself needs no
    artifact: centroids derive from the corpus by the stored rule
    (stride/cap in meta.json), the same no-shipped-artifact property
    the sign-plane generator has. meta.json (atomic via _meta_io)
    carries params + corpus fingerprint; written LAST as the
    completeness marker."""
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint

    want = {
        "kind": "ivf_det",
        "stride": centroid_stride,
        "cap": n_centroids_cap,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    meta = mio.read_json(mio.join(path, "meta.json"))
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return path
    from inside_vectordb_spark.operators.ann_index import _begin_rebuild

    _begin_rebuild(path)  # no stale completeness marker over torn data
    cents = corpus.filter(
        ((F.col(id_col) % centroid_stride) == 1)
        & (F.col(id_col) < centroid_stride * n_centroids_cap)
    ).select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__cv"))
    # the id-rule assumes ids intersect [1, stride*cap): an offset id
    # space (snowflake/partition-encoded) selects NOTHING — fail loudly
    # instead of persisting an empty "complete" index that serves
    # empty top-k forever (the one count is build-path-only cost)
    if cents.limit(1).count() == 0:
        raise ValueError(
            f"ivf_det centroid rule (id % {centroid_stride} == 1, id < "
            f"{centroid_stride * n_centroids_cap}) selects no corpus rows "
            "— ids don't intersect the rule range; use the km tier or "
            "adjust stride/cap"
        )
    assign = _assign_nearest(corpus, cents, id_col, vec_col)
    assign.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(path, "lists")
    )
    # centroid VECTORS persist so O(delta) upserts can assign without
    # the base corpus (the rule still re-derives them at search time)
    cents.write.mode("overwrite").parquet(os.path.join(path, "cents"))
    mio.write_json(mio.join(path, "meta.json"), want)
    return path


def upsert_ivf_det_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """FAISS ``add`` on the deterministic-IVF tier: assign ONLY the
    delta against the frozen centroid rule and append its rows into
    the cid-partitioned lists — O(delta) work, and because assignment
    is deterministic the maintained lists are BIT-IDENTICAL to a full
    rebuild over base ∪ delta (the registered upsert query shares the
    plain search oracle).

    Contract: delta ids disjoint from stored ids AND disjoint from
    the centroid rule (``id % stride == 1 AND id < stride*cap``) — a
    rule-matching delta would change the re-derived quantizer, so it
    is REJECTED (rebuild instead, FAISS retrain semantics)."""
    # serialize maintenance under the commit lock (review r9-4, the
    # hnsw/sign r9-2 rule applied tier-wide): without it the
    # disjointness guard races a concurrent upsert of the same delta
    # (both pass, the second appends duplicate rows), and readers /
    # ensure_* hit the marker window of a healthy index mid-append
    with mio.commit_lock(path):
        from inside_vectordb_spark.operators.ann_index import (
            _corpus_fingerprint,
            _merge_fingerprint,
        )

        meta = mio.read_json(mio.join(path, "meta.json"))
        if meta is None or meta.get("kind") != "ivf_det":
            raise FileNotFoundError(f"no complete ivf_det index at {path}")
        stride, cap = int(meta["stride"]), int(meta["cap"])
        bad = new_vectors.filter(
            ((F.col(id_col) % stride) == 1) & (F.col(id_col) < stride * cap)
        ).count()
        if bad:
            raise ValueError(
                f"{bad} delta ids match the centroid rule (id % {stride} == 1, "
                f"id < {stride * cap}); rebuild via ensure_ivf_det_index instead"
            )
        from inside_vectordb_spark.operators.ann_index import _assert_disjoint_delta

        _assert_disjoint_delta(
            spark.read.parquet(os.path.join(path, "lists")).select("doc_id"),
            new_vectors.select(id_col),
            path,
        )
        cents = spark.read.parquet(os.path.join(path, "cents"))
        assign = _assign_nearest(new_vectors, cents, id_col, vec_col)
        assign.repartition("cid").write.mode("append").partitionBy("cid").parquet(
            os.path.join(path, "lists")
        )
        meta["corpus"] = _merge_fingerprint(
            meta.get("corpus"), _corpus_fingerprint(new_vectors, id_col)
        )
        mio.write_json(mio.join(path, "meta.json"), meta)
        return meta


def ann_ivf_det_topk_indexed(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 4,
    centroid_stride: int = 37,
    n_centroids_cap: int = 16,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF against the persisted inverted lists: probe
    selection is the same bounded centroid scan; the probed cid list
    (≤ queries × n_probe, collected driver-side) prunes the lists
    scan at the parquet partition level; candidates join raw vectors
    only for the exact rerank. Deterministic assignment makes results
    bit-identical to the in-memory ``ann_ivf_det_topk`` — the
    registered indexed query shares its oracle."""
    ensure_ivf_det_index(
        spark, corpus, path, centroid_stride, n_centroids_cap, id_col, vec_col
    )
    cents = corpus.filter(
        ((F.col(id_col) % centroid_stride) == 1)
        & (F.col(id_col) < centroid_stride * n_centroids_cap)
    ).select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__cv"))
    qb = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("__pc"), F.asc("cid"))
    probes = (
        qb.crossJoin(F.broadcast(cents))
        .withColumn("__pc", F.round(cosine_similarity("__qv", "__cv"), 6))
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "cid")
    )
    lists = pruned_lists(spark, path, probes)
    cand = probes.join(lists, "cid").select("query_id", "__qv", "doc_id")
    withvec = cand.join(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__dv")),
        "doc_id",
    )
    scored = withvec.select(
        "query_id",
        "doc_id",
        F.round(cosine_similarity("__qv", "__dv"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ann_ivf_km_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    km_k: int = 8,
    km_iters: int = 2,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer — Lloyd k-means centroids
    instead of the id-sampled rule, which is how FAISS actually
    builds an IVF (train_coarse via k-means, then assign; reference
    ``004-faiss_demo.py`` nlist/nprobe path). Stays fully
    hash-verifiable because the training runs on the deterministic
    fixed-point ``kmeans_lloyd`` (quantized integer distances,
    rounded centroid updates, id tie-breaks) — the one k-means two
    engines reproduce bit-for-bit.

    A trained quantizer BALANCES the inverted lists (id-sampling makes
    list sizes data-independent luck): at scale, balanced lists mean
    probing n_probe of k lists touches ~n_probe/k of the corpus with
    low variance — the property that keeps IVF latency flat as the
    corpus grows. Assignment/probing use cosine against the quantized
    centroids (cosine is scale-invariant, so the ×quant training
    space needs no un-scaling), rounded at 6 dp with cid tie-breaks;
    rerank is exact cosine on the raw vectors over candidates only.

    Scale shape: training = km_iters broadcast-assignment passes (the
    MLlib KMeans shape); index assignment = one corpus ×
    broadcast(k×dim) pass; probes touch n_probe lists; only
    candidates reach the exact rerank."""
    from inside_vectordb_spark.operators.traindata import kmeans_lloyd

    km = kmeans_lloyd(corpus, k=km_k, iters=km_iters, id_col=id_col, vec_col=vec_col)
    cents = (
        km.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
                lambda s: s["centroid"],
            ).alias("__cv")
        )
        .select(F.col("cluster").alias("cid"), "__cv")
    )
    assign = _assign_nearest(corpus, cents, id_col, vec_col)
    qb = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("__pc"), F.asc("cid"))
    probes = (
        qb.crossJoin(F.broadcast(cents))
        .withColumn("__pc", F.round(cosine_similarity("__qv", "__cv"), 6))
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "cid")
    )
    cand = probes.join(assign, "cid").select("query_id", "__qv", "doc_id")
    withvec = cand.join(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__dv")),
        "doc_id",
    )
    scored = withvec.select(
        "query_id",
        "doc_id",
        F.round(cosine_similarity("__qv", "__dv"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ensure_ivf_km_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    km_k: int = 8,
    km_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Persist the TRAINED-quantizer IVF: the Lloyd centroids
    (FAISS's trained coarse quantizer — unlike the det-IVF rule they
    cannot be re-derived at serving time without re-training, so the
    k×dim table IS part of the index artifact, exactly as FAISS
    serializes its quantizer) plus the assignment table partitioned
    by cid (inverted lists as directory layout → probing = parquet
    partition pruning). meta.json written LAST as the completeness
    marker; deterministic training makes rebuilds bit-identical."""
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint
    from inside_vectordb_spark.operators.traindata import kmeans_lloyd

    want = {
        "kind": "ivf_km",
        "km_k": km_k,
        "km_iters": km_iters,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    meta = mio.read_json(mio.join(path, "meta.json"))
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return path
    from inside_vectordb_spark.operators.ann_index import _begin_rebuild

    _begin_rebuild(path)  # no stale completeness marker over torn data
    km = kmeans_lloyd(corpus, k=km_k, iters=km_iters, id_col=id_col, vec_col=vec_col)
    cents = (
        km.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
                lambda s: s["centroid"],
            ).alias("__cv")
        )
        .select(F.col("cluster").alias("cid"), "__cv")
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "cents"))
    stored_cents = spark.read.parquet(os.path.join(path, "cents"))
    assign = _assign_nearest(corpus, stored_cents, id_col, vec_col)
    assign.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(path, "lists")
    )
    mio.write_json(mio.join(path, "meta.json"), want)
    return path


def ann_ivf_km_topk_indexed(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 4,
    km_k: int = 8,
    km_iters: int = 2,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained-quantizer IVF served from the persisted index: the
    stored k×dim centroid table broadcasts into probe selection
    (training never reruns at query time — the FAISS serve path),
    the probed cid set prunes the lists scan at the parquet partition
    level, and only candidates reach the exact rerank. Deterministic
    training + assignment ⇒ bit-identical to the in-memory
    ``ann_ivf_km_topk`` (the registered query shares its oracle)."""
    ensure_ivf_km_index(spark, corpus, path, km_k, km_iters, id_col, vec_col)
    cents = spark.read.parquet(os.path.join(path, "cents"))
    qb = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("__pc"), F.asc("cid"))
    probes = (
        qb.crossJoin(F.broadcast(cents))
        .withColumn("__pc", F.round(cosine_similarity("__qv", "__cv"), 6))
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "cid")
    )
    lists = pruned_lists(spark, path, probes)
    cand = probes.join(lists, "cid").select("query_id", "__qv", "doc_id")
    withvec = cand.join(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__dv")),
        "doc_id",
    )
    scored = withvec.select(
        "query_id",
        "doc_id",
        F.round(cosine_similarity("__qv", "__dv"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def upsert_ivf_km_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """FAISS ``add`` on the trained-quantizer tier: assign ONLY the
    delta against the STORED centroids (the quantizer is frozen by
    the artifact itself — FAISS never retrains on add) and append
    into the cid-partitioned lists — O(delta) work. Unlike the
    rule-derived det-IVF the delta needs no id RULE, but the ids must
    be DISJOINT from the stored ones (the append-only contract every
    upsert in this repo shares): re-adding an id would duplicate its
    list entry and serve the same doc twice in a top-k. Enforced here
    with a broadcast semi-join against the stored lists (delta is
    small by contract) — a retried maintenance job fails loudly
    instead of corrupting served results. Drift stays the retrain
    decision (rebuild via ensure_ivf_km_index), exactly FAISS's
    train/add split."""
    # serialize maintenance under the commit lock (review r9-4, the
    # hnsw/sign r9-2 rule applied tier-wide): without it the
    # disjointness guard races a concurrent upsert of the same delta
    # (both pass, the second appends duplicate rows), and readers /
    # ensure_* hit the marker window of a healthy index mid-append
    with mio.commit_lock(path):
        from inside_vectordb_spark.operators.ann_index import (
            _corpus_fingerprint,
            _merge_fingerprint,
        )

        meta = mio.read_json(mio.join(path, "meta.json"))
        if meta is None or meta.get("kind") != "ivf_km":
            raise FileNotFoundError(f"no complete ivf_km index at {path}")
        from inside_vectordb_spark.operators.ann_index import _assert_disjoint_delta

        _assert_disjoint_delta(
            spark.read.parquet(os.path.join(path, "lists")).select("doc_id"),
            new_vectors.select(id_col),
            path,
        )
        cents = spark.read.parquet(os.path.join(path, "cents"))
        assign = _assign_nearest(new_vectors, cents, id_col, vec_col)
        assign.repartition("cid").write.mode("append").partitionBy("cid").parquet(
            os.path.join(path, "lists")
        )
        meta["corpus"] = _merge_fingerprint(
            meta.get("corpus"), _corpus_fingerprint(new_vectors, id_col)
        )
        mio.write_json(mio.join(path, "meta.json"), meta)
        return meta
