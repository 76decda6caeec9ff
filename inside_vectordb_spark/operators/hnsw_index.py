"""Persisted vendored-HNSW graph index: save/load the proximity graph.

The reference's actual hnswlib artifact is a serialized graph —
``003-hnswlib_demo.py:234-257`` builds once, ``save_index``es to disk,
``load_index``s without rebuild, and ``add_items`` appends to the
loaded index. Every other persisted tier in this engine (LSH / IVF /
PQ / SQ / MRL) stores derived tables; this module rounds out S9 by
persisting the GRAPH itself for the vendored NumPy kernel
(``operators/hnsw_kernel.py``), so repeated queries skip the
per-partition graph build the scatter-gather tier
(``operators/partitioned_ann.py``) pays per job.

Layout (all data parquet, control files via the ``_meta_io`` seam):

    <path>/graph/part=<p>/…   base generation: one row per
                              (node, level) — internal insertion
                              index (``ord``), external id, neighbor
                              ``ord`` list; the level-0 row carries
                              the L2-NORMALIZED vector; one header
                              row per partition (level = −1) carries
                              entry point / max level / RNG state
    <path>/graph_u<N>/…       upsert generations; meta's
                              ``part_rels`` names which generation
                              serves each partition
    <path>/graph_c<N>/…       compaction generations (``base_rel``)
    <path>/tombstones/        mark_deleted ids (search filters them;
                              compaction removes them physically)
    <path>/meta.json          params + fingerprint + the generation
                              map — the ATOMIC COMMIT POINT for
                              every maintenance op; removed first
                              only on full rebuilds

Scale shape: vectors are routed to ``n_parts`` graph partitions by
``pmod(xxhash64(id), n_parts)`` — deterministic, so a delta upsert
routes to the same partition its full-rebuild twin would. Search is
scatter-gather with ZERO graph-row shuffles: each partition gets its
own PartitionFilters-pruned scan coalesced into one task, whose
mapInPandas reconstructs the kernel and answers the broadcast query
batch with the ef beam; only Q×k partial rows reach the global merge
exchange (plan-pinned in ``tests/test_plans.py``). Upserts rebuild
ONLY the receiving partitions into a fresh generation dir (same
no-shuffle shape) with O(delta) graph inserts — base nodes are never
re-inserted; the stored RNG state continues the level-draw stream, so
load-then-add builds the identical graph an unsaved index would; the
meta write commits, superseded dirs survive one commit for in-flight
readers. Deletes tombstone (nodes keep ROUTING the beam, hnswlib
semantics); compaction rebuilds partitions from live rows — the
compacted index is bit-identical to a fresh build over them.

Graph builds are insertion-order dependent (true of hnswlib too), so
this tier is rows-only at the driver; determinism (same corpus, same
params → same graph → same results), stored==fresh,
load-then-add==never-saved, compacted==rebuild, and the maintenance
contracts are pinned in ``tests/test_hnsw_index.py``, and recall vs
exact is floor-asserted.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.operators.ann import _normalize_rows
from inside_vectordb_spark.operators.ann_index import (
    _assert_disjoint_delta,
    _begin_rebuild,
    _corpus_fingerprint,
    _merge_fingerprint,
)
from inside_vectordb_spark.operators.hnsw_kernel import HnswIndex

GRAPH_SCHEMA = StructType(
    [
        StructField("part", LongType()),
        StructField("ord", LongType()),
        StructField("node_id", LongType()),
        StructField("level", IntegerType()),
        StructField("neighbors", ArrayType(LongType())),
        StructField("vector", ArrayType(DoubleType())),
        StructField("meta_json", StringType()),
    ]
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _tomb_dir(path: str, meta: dict) -> str:
    """The CURRENT tombstone relation. Partial compaction shrinks the
    tombstone set; an in-place rewrite of one fixed dir would lose the
    surviving tombstones on a crash between remove and rewrite
    (deleted docs reappearing), so the live relation is versioned in
    meta (``tomb_rel``) and swapped by the atomic meta commit, exactly
    like the graph generation dirs."""
    return mio.join(path, meta.get("tomb_rel", "tombstones"))


def _gc_dirs(path: str, gc_now: list) -> None:
    """Reclaim dirs a PREVIOUS commit superseded: ``[rel, part]``
    entries are one graph partition dir; ``[rel, None]`` entries are a
    whole relation (superseded tombstone generations)."""
    for old_rel, p in gc_now:
        if p is None:
            mio.remove_tree(os.path.join(path, old_rel))
        else:
            mio.remove_tree(os.path.join(path, old_rel, f"part={p}"))


def _part_expr(id_col: str, n_parts: int):
    """THE partition-routing rule. xxhash64 is seed-stable across
    sessions, so deltas route to the same graph partition their
    full-rebuild twin would — the property the O(delta) upsert's
    bit-compat contract rests on."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).cast("long")


def _index_to_rows(part: int, index: HnswIndex) -> pd.DataFrame:
    """Serialize a kernel to GRAPH_SCHEMA rows: one row per
    (node, level) plus one header row (level = −1) carrying the
    scalars and RNG state."""
    state = index.get_state()
    ords, node_ids, levels, neighbors, vectors = [], [], [], [], []
    ids = state["ids"]
    vecs = state["vecs"]
    for lv, links in enumerate(state["links"]):
        for o, nbrs in links.items():
            ords.append(o)
            node_ids.append(ids[o])
            levels.append(lv)
            neighbors.append(list(nbrs))
            vectors.append(list(map(float, vecs[o])) if lv == 0 else None)
    header = {
        "entry": state["entry"],
        "max_level": state["max_level"],
        "rng_state_json": state["rng_state_json"],
        "n": len(ids),
        # Alg. 4 flags ride the header so a reconstructed kernel keeps
        # the build's selection rule for continued inserts (r11)
        "heuristic": bool(state.get("heuristic", False)),
        "extend_candidates": bool(state.get("extend_candidates", False)),
        "keep_pruned_connections": bool(
            state.get("keep_pruned_connections", False)
        ),
    }
    body = pd.DataFrame(
        {
            "part": np.full(len(ords), part, dtype=np.int64),
            "ord": np.asarray(ords, dtype=np.int64),
            "node_id": np.asarray(node_ids, dtype=np.int64),
            "level": np.asarray(levels, dtype=np.int32),
            "neighbors": neighbors,
            "vector": vectors,
            "meta_json": None,
        }
    )
    hdr = pd.DataFrame(
        {
            "part": [part],
            "ord": [-1],
            "node_id": [-1],
            "level": [-1],
            "neighbors": [None],
            "vector": [None],
            "meta_json": [json.dumps(header)],
        }
    )
    return pd.concat([body, hdr], ignore_index=True)


def _index_from_rows(pdf: pd.DataFrame, m: int, ef_construction: int, dim: int) -> HnswIndex:
    """Rebuild a kernel from one partition's GRAPH_SCHEMA rows without
    re-inserting any vector. ``ord`` IS the internal insertion index
    (0..n−1 contiguous by construction), so heap tie-breaks — and
    therefore search results — are bit-identical to the pre-save
    index."""
    hdr = json.loads(pdf.loc[pdf["level"] < 0, "meta_json"].iloc[0])
    body = pdf[pdf["level"] >= 0]
    lvl0 = body[body["level"] == 0].sort_values("ord")
    n = int(hdr["n"])
    if len(lvl0) != n:
        raise ValueError(
            f"torn HNSW graph partition: header says {n} nodes, "
            f"found {len(lvl0)} level-0 rows"
        )
    vecs = np.array(list(lvl0["vector"]), dtype=np.float64).reshape(n, dim)
    ids = lvl0["node_id"].to_numpy(dtype=np.int64)
    links: list[dict[int, list[int]]] = [
        {} for _ in range(int(body["level"].max()) + 1)
    ]
    for lv, o, nbrs in zip(body["level"], body["ord"], body["neighbors"]):
        links[int(lv)][int(o)] = [int(x) for x in nbrs]
    return HnswIndex.from_state(
        {
            "dim": dim,
            "m": m,
            "ef_construction": ef_construction,
            "entry": int(hdr["entry"]),
            "max_level": int(hdr["max_level"]),
            "rng_state_json": hdr["rng_state_json"],
            "heuristic": bool(hdr.get("heuristic", False)),
            "extend_candidates": bool(hdr.get("extend_candidates", False)),
            "keep_pruned_connections": bool(
                hdr.get("keep_pruned_connections", False)
            ),
            "ids": ids,
            "vecs": vecs,
            "links": links,
        }
    )


def _build_partition_udf(
    m: int, ef_construction: int, seed: int, dim: int, heuristic: bool = False
):
    def build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=[f.name for f in GRAPH_SCHEMA.fields])
        part = int(pdf["part"].iloc[0])
        # id-ASC insertion order: makes the graph a pure function of
        # (vector set, params) so stored==fresh and the upsert's
        # same-order twin are well-defined
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        mat = _normalize_rows(np.array(list(pdf["v"]), dtype=np.float64))
        index = HnswIndex(
            dim=dim,
            m=m,
            ef_construction=ef_construction,
            seed=seed,
            heuristic=heuristic,
        )
        index.add_items(mat, ids)
        return _index_to_rows(part, index)

    return build_one


def build_hnsw_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    m: int = 16,
    ef_construction: int = 100,
    n_parts: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    heuristic: bool = False,
) -> dict[str, Any]:
    """Build and persist the partitioned HNSW graph (hnswlib
    ``save_index`` analogue, ``003-hnswlib_demo.py:234-243``). One
    corpus pass: route by the partition rule, build one graph per
    partition inside its task, write the serialized rows partitioned
    by ``part``. meta.json (params + corpus fingerprint) lands LAST as
    the completeness marker."""
    fp = _corpus_fingerprint(corpus, id_col)
    if fp["n"] == 0:
        raise ValueError(
            "refusing to persist an HNSW index over an EMPTY corpus — "
            "it would serve empty top-k forever under a valid marker"
        )
    # the full rebuild runs under the commit lock (review r10): an
    # unlocked build racing a LOCKED upsert removed the marker and
    # deleted graph_u* generation dirs while the upsert was writing
    # them — the upsert's meta commit then named relations the build
    # had destroyed. Serializing here turns that into
    # rebuild-after-commit; a maintenance op waiting on this lock
    # re-reads meta after acquisition and sees the rebuilt index.
    with mio.commit_lock(path):
        return _build_hnsw_locked(
            corpus, path, fp, dim, m, ef_construction, n_parts, seed,
            id_col, vec_col, heuristic,
        )


def _build_hnsw_locked(
    corpus, path, fp, dim, m, ef_construction, n_parts, seed, id_col,
    vec_col, heuristic=False,
) -> dict[str, Any]:
    _begin_rebuild(path)
    c = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")
    ).withColumn("part", _part_expr("doc_id", n_parts))
    rows = c.groupBy("part").applyInPandas(
        _build_partition_udf(m, ef_construction, seed, dim, heuristic),
        GRAPH_SCHEMA,
    )
    rows.write.mode("overwrite").partitionBy("part").parquet(
        os.path.join(path, "graph")
    )
    # per-partition node counts ride the meta (round-10): incremental
    # OPTIMIZE's dirty-shard decision then reads metadata + the
    # bounded tombstone set instead of scanning the whole graph — at
    # 100 TB the "which shards to compact" question must not cost a
    # full index pass. One narrow agg over the corpus the build is
    # already scanning; ≤ n_parts rows collected.
    part_counts = {
        str(r["part"]): r["count"]
        for r in c.groupBy("part").count().collect()
    }
    # fresh lifecycle: upsert/compaction generations and tombstones
    # from a prior index must not leak into the rebuilt one (the
    # marker is already off, so no reader resolves them mid-cleanup)
    for name in os.listdir(path) if os.path.isdir(path) else []:
        if name.startswith(("graph_u", "graph_c", "tombstones")):
            mio.remove_tree(os.path.join(path, name))
    meta = {
        "kind": "hnsw_vendored",
        "dim": dim,
        "m": m,
        "ef_construction": ef_construction,
        "n_parts": n_parts,
        "seed": seed,
        # Alg. 4 selection flag: every later maintenance op (upsert
        # fresh-partition kernels, compaction rebuilds) must reproduce
        # the build's selection rule or stored==fresh breaks (r11)
        "heuristic": bool(heuristic),
        # per-partition relation map: upserts repoint a partition at a
        # fresh generation dir instead of rewriting the live one in
        # place (review r9 — dynamic overwrite deleted files under
        # in-flight readers, and a crash after the marker removal
        # destroyed a valid index)
        "part_rels": {},  # part -> rel; absent parts resolve to "graph"
        "gc_pending": [],  # [rel, part] dirs superseded by THIS commit
        "part_counts": part_counts,  # stored nodes per partition
        "corpus": fp,
    }
    mio.write_json(mio.join(path, "meta.json"), meta, indent=2)
    return meta


def ensure_hnsw_index(corpus: DataFrame, path: str, **params: Any) -> dict[str, Any]:
    """Reuse the stored graph when params AND the corpus fingerprint
    match; rebuild otherwise. The compare validates RESOLVED defaults,
    not just passed params (the r8 batch-6 ensure_* class).
    ``id_col``/``vec_col`` are deliberately NOT part of the identity —
    they are caller-side column NAMES, and including them would force
    a silent full rebuild whenever two callers alias the same data
    differently (the engine-wide convention, see
    ``ann_index.ensure_ivfpq_index``); the corollary, as there, is
    that pointing ``vec_col`` at a DIFFERENT vector column over the
    same ids requires a distinct ``path``."""
    meta = mio.read_json(mio.join(path, "meta.json"))
    want = {
        "kind": "hnsw_vendored",
        "dim": params["dim"],
        "m": params.get("m", 16),
        "ef_construction": params.get("ef_construction", 100),
        "n_parts": params.get("n_parts", 4),
        "seed": params.get("seed", 42),
        # pre-r11 metas carry no flag; they were built simple, so a
        # missing key matches heuristic=False instead of forcing a
        # rebuild of every existing artifact
        "heuristic": bool(params.get("heuristic", False)),
        "corpus": _corpus_fingerprint(corpus, params.get("id_col", "vec_id")),
    }
    if meta is not None and all(
        meta.get(k, False if k == "heuristic" else None) == v
        for k, v in want.items()
    ):
        return meta
    return build_hnsw_index(corpus, path, **params)


def _read_graph(spark: SparkSession, path: str, meta: dict) -> DataFrame:
    """Union the live graph rows across generation dirs: each
    partition resolves to the relation meta names for it ("graph" =
    the base build; "graph_u<N>" = the upsert generation that last
    rewrote it). Only meta-named (rel, part) pairs are visible, so an
    interrupted upsert (generation written, meta not yet swapped)
    reads as the pre-upsert index — and superseded dirs survive one
    commit for in-flight readers (the lexical-index discipline)."""
    part_rels: dict[str, str] = meta.get("part_rels", {}) or {}
    base_rel = meta.get("base_rel", "graph")
    by_rel: dict[str, list[int]] = {}
    for p in range(int(meta["n_parts"])):
        rel = part_rels.get(str(p), base_rel)
        # resolve per-(rel, part): a pair whose part=p subdir is absent
        # is a partition that was never populated OR rebuilt to zero
        # rows (incremental compact of a fully-tombstoned shard writes
        # a generation dir with no part=p data — advice r10: falling
        # back to base_rel here would resurrect compacted-away rows,
        # and reading a data-less generation dir raises
        # UNABLE_TO_INFER_SCHEMA). Same guard as the indexed search.
        if not mio.is_dir(os.path.join(path, rel, f"part={p}")):
            continue
        by_rel.setdefault(rel, []).append(p)
    out = None
    for rel, parts in sorted(by_rel.items()):
        g = (
            spark.read.parquet(os.path.join(path, rel))
            .withColumn("part", F.col("part").cast("long"))
            .filter(F.col("part").isin(parts))
        )
        out = g if out is None else out.unionByName(g)
    if out is None:
        raise FileNotFoundError(f"no graph relations at {path}")
    return out


def ann_hnsw_topk_indexed(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 10,
    ef_search: int = 64,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    round_to: int | None = 6,
    filter_df: DataFrame | None = None,
    filter_id_col: str = "vec_id",
    query_filter_col: str | None = None,
    corpus_filter_df: DataFrame | None = None,
) -> DataFrame:
    """Search the stored graph without rebuilding (hnswlib
    ``load_index`` analogue, ``003:245-257``): per stored partition,
    reconstruct the kernel from its own rows inside one task, answer
    the broadcast query batch with the ef beam, merge partition-local
    top-k through one global (score DESC, doc_id ASC) window. Output
    contract matches ``exact_cosine_topk``.

    ``filter_df`` (r10 verdict #7) enables FILTER-DURING-SEARCH: its
    ``filter_id_col`` values are the allowed doc ids; disallowed nodes
    still route the beam but never enter results (hnswlib
    filter-function semantics), so a selective predicate keeps its
    recall instead of paying the post-filter loss. The allowed set
    joins each partition's pruned scan broadcast-side — right for the
    selective predicates filtered search exists for; a broad predicate
    at 100 TB belongs in metadata columns co-partitioned with the
    graph (and is cheaper as post-filtering anyway, since it barely
    cuts the candidate pool).

    ``query_filter_col`` + ``corpus_filter_df`` (r12, the facade's
    per-query-EQUALITY contract pushed down): each query ranks only
    corpus rows whose ``corpus_filter_df`` value equals the query's
    ``query_filter_col`` value — ONE grouped pass instead of one
    search per distinct value. The (id, value) mapping broadcasts
    with the partition scan exactly like ``filter_df``; inside each
    task the kernel is reconstructed ONCE and the per-value boolean
    masks are cut from the attached value column, so the cost is
    V-independent: one graph scan, one broadcast, one reconstruct per
    partition regardless of how many distinct values the batch
    carries. NULL-valued queries match nothing (SQL equality).
    Mutually exclusive with ``filter_df``."""
    meta = mio.read_json(mio.join(path, "meta.json"))
    if meta is None or meta.get("kind") != "hnsw_vendored":
        raise FileNotFoundError(f"no complete vendored-HNSW index at {path}")
    if filter_df is not None and query_filter_col is not None:
        raise ValueError(
            "filter_df (global allow-list) and query_filter_col (per-query "
            "equality) are mutually exclusive"
        )
    if (query_filter_col is None) != (corpus_filter_df is None):
        raise ValueError(
            "query_filter_col and corpus_filter_df must be passed together"
        )
    m, efc, dim = meta["m"], meta["ef_construction"], meta["dim"]
    allowed = (
        None
        if filter_df is None
        else filter_df.select(
            F.col(filter_id_col).cast("long").alias("__fid")
        )
        .distinct()
        # materialize ONCE before fanning out: each partition branch
        # broadcast-joins this set, and without pinning it the plan
        # re-runs the predicate scan + distinct per branch (measured:
        # n_parts BroadcastExchanges, zero reuse — at 1000 shards
        # that's 1000 duplicate subtree executions). localCheckpoint
        # keeps the set executor-side (no driver collect).
        .localCheckpoint(eager=True)
    )
    fvalues = (
        None
        if corpus_filter_df is None
        else corpus_filter_df.select(
            F.col(filter_id_col).cast("long").alias("__fid"),
            F.col(query_filter_col).alias("__fval"),
        )
        # dedupe like `allowed`: a duplicated (id, value) row would
        # duplicate the joined graph rows and MISALIGN the task-side
        # ord→mask index space (silent wrong results, not an error).
        # An id mapped to two DIFFERENT values remains the caller's
        # contract violation — corpus ids are unique engine-wide.
        .dropDuplicates(["__fid", "__fval"])
        # same pin rationale as `allowed` above
        .localCheckpoint(eager=True)
    )

    qcols = [F.col(query_id).alias("qid"), F.col(query_vec).alias("v")]
    if query_filter_col is not None:
        qcols.append(F.col(query_filter_col).alias("fv"))
    qrows = queries.select(*qcols).collect()
    if not qrows:
        raise ValueError("empty query set")
    qids_l = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat_l = _normalize_rows(np.array([r["v"] for r in qrows], dtype=np.float64))
    qvals_l = (
        np.array([r["fv"] for r in qrows], dtype=object)
        if query_filter_col is not None
        else None
    )
    bc = spark.sparkContext.broadcast((qids_l, qmat_l, qvals_l))

    # hnswlib mark_deleted semantics: tombstoned nodes stay in the
    # graph (they still ROUTE the beam) but are filtered from results;
    # each partition over-fetches by the global tombstone count so a
    # filtered-out neighbor can't starve the local top-k
    n_deleted = int(meta.get("n_deleted", 0))

    def _result_frame(qids, qmat, index, kk, allow):
        labels, dists = index.knn_query(qmat, k=kk, allow=allow)
        rows = np.repeat(np.arange(len(qids)), labels.shape[1])
        out = pd.DataFrame(
            {
                "query_id": qids[rows],
                "doc_id": labels.ravel(),
                "score": 1.0 - dists.ravel(),
            }
        )
        # non-finite distances are fewer-than-k-reachable pads
        return out[np.isfinite(dists).ravel()]

    def search_one(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=["query_id", "doc_id", "score"])
        if pdf.empty:
            return empty
        allow = None
        node_vals = None
        if "__allowed" in pdf.columns:
            # internal idx == ord (contiguous by construction), so the
            # level-0 rows in ord order ARE the mask's index space
            lvl0 = pdf[pdf["level"] == 0].sort_values("ord")
            allow = (
                lvl0["__allowed"].fillna(False).to_numpy(dtype=bool)
            )
            if not allow.any():
                return empty
        elif "__fval" in pdf.columns:
            lvl0 = pdf[pdf["level"] == 0].sort_values("ord")
            node_vals = lvl0["__fval"].to_numpy(dtype=object)
        index = _index_from_rows(pdf, m, efc, dim)
        qids, qmat, qvals = bc.value
        kk = min(k + n_deleted, len(index))
        index.set_ef(max(ef_search, kk))
        if node_vals is None:
            return _result_frame(qids, qmat, index, kk, allow)
        # grouped per-query-equality pass: the kernel above was
        # reconstructed ONCE; each distinct query value only cuts a
        # boolean mask from the attached node values (None/NaN node
        # values — ids absent from corpus_filter_df — equal nothing)
        parts = []
        for v in pd.unique(qvals):
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue  # NULL-valued queries match nothing
            sel = np.array([qv == v for qv in qvals], dtype=bool)
            mask = np.array([nv == v for nv in node_vals], dtype=bool)
            if not mask.any():
                continue  # this partition holds no rows for the value
            parts.append(_result_frame(qids[sel], qmat[sel], index, kk, mask))
        return pd.concat(parts, ignore_index=True) if parts else empty

    # NO shuffle of graph rows: the graph is already partitioned by
    # ``part`` at rest, but a groupBy("part") would hash-exchange the
    # ENTIRE index per query batch (caught by the shuffled_payloads
    # plan audit — at 100 TB that exchange IS the query cost). Each
    # partition instead gets its own pruned scan coalesced into one
    # task, whose mapInPandas concatenates its Arrow batches and
    # searches; the per-part branches union. Only Q×k partial rows
    # ever reach an exchange (the global merge window).
    def search_whole_partition(batches):
        pdf = pd.concat(list(batches), ignore_index=True)
        if not pdf.empty:
            yield search_one(pdf)

    part_rels: dict[str, str] = meta.get("part_rels", {}) or {}
    base_rel = meta.get("base_rel", "graph")
    partials = None
    for p in range(int(meta["n_parts"])):
        d = os.path.join(path, part_rels.get(str(p), base_rel))
        if not mio.is_dir(os.path.join(d, f"part={p}")):
            continue
        src = spark.read.parquet(d).filter(
            # no cast on the partition column — it would block the
            # PartitionFilters prune that makes this scan one dir
            F.col("part") == p
        )
        if allowed is not None:
            # left broadcast join: graph rows stay put (no exchange of
            # index payload); only the small allowed-id set ships
            src = src.join(
                F.broadcast(allowed),
                F.col("node_id") == F.col("__fid"),
                "left",
            ).withColumn(
                "__allowed", F.col("__fid").isNotNull()
            ).drop("__fid")
        elif fvalues is not None:
            # same shape for the grouped-equality mode: attach each
            # node's filter VALUE instead of a boolean; ids absent
            # from the mapping surface NULL (match nothing)
            src = src.join(
                F.broadcast(fvalues),
                F.col("node_id") == F.col("__fid"),
                "left",
            ).drop("__fid")
        branch = src.coalesce(1).mapInPandas(
            search_whole_partition, _PARTIAL_SCHEMA
        )
        partials = branch if partials is None else partials.unionByName(branch)
    if partials is None:
        raise FileNotFoundError(f"no graph relations at {path}")
    tomb = _tomb_dir(path, meta)
    if mio.is_dir(tomb):
        partials = partials.join(
            spark.read.parquet(tomb).withColumnRenamed("id", "doc_id"),
            "doc_id",
            "left_anti",
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = partials.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out.select("query_id", "doc_id", "score", "rank")


def _fresh_upsert_rel(path: str) -> str:
    """Smallest ``graph_u<n>`` whose dir doesn't exist — an upsert
    generation never reuses a directory a live or grace-period meta
    could name (the lexical `_fresh_delta` discipline)."""
    n = 1
    while os.path.isdir(os.path.join(path, f"graph_u{n}")):
        n += 1
    return f"graph_u{n}"


def upsert_hnsw_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """hnswlib ``add_items`` on the loaded index (``003:249-251``):
    route the delta by the stored partition rule, reconstruct ONLY the
    receiving partitions' kernels, run O(delta) graph inserts
    continuing each partition's stored RNG stream, and write the
    extended partitions into a FRESH generation dir that meta's
    ``part_rels`` repoints at atomically. The meta write is the
    commit point: a crash anywhere before it leaves the old index
    fully servable (review r9 — the first cut removed the marker
    before a dynamic partition overwrite, so a crash — or even a
    delta routing to a previously EMPTY partition — destroyed a valid
    index; it also deleted files under in-flight readers, who now get
    one commit of grace). Runs under the commit lock: two concurrent
    upserts are read-modify-write on part_rels/fingerprint and the
    loser's rows would silently vanish otherwise. A delta routing to
    a partition with no stored graph builds a fresh kernel for it —
    exactly what a full rebuild over base ∪ delta would hold there."""
    with mio.commit_lock(path):
        return _upsert_hnsw_locked(spark, new_vectors, path, id_col, vec_col)


def _upsert_hnsw_locked(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
) -> dict[str, Any]:
    meta = mio.read_json(mio.join(path, "meta.json"))
    if meta is None or meta.get("kind") != "hnsw_vendored":
        raise FileNotFoundError(f"no complete vendored-HNSW index at {path}")
    m, efc, dim, n_parts, seed = (
        meta["m"],
        meta["ef_construction"],
        meta["dim"],
        meta["n_parts"],
        meta.get("seed", 42),
    )
    heur = bool(meta.get("heuristic", False))

    graph = _read_graph(spark, path, meta)
    stored_ids = graph.filter(F.col("level") == 0).select(
        F.col("node_id").alias(id_col)
    )
    tomb = _tomb_dir(path, meta)
    if mio.is_dir(tomb):
        # a re-added deleted id would stay permanently masked by the
        # surviving tombstone while the merged fingerprint counted it
        # (the sign-tier contract)
        stored_ids = stored_ids.unionByName(
            spark.read.parquet(tomb).select(F.col("id").alias(id_col))
        )
    delta = new_vectors.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")
    ).withColumn("part", _part_expr("doc_id", n_parts))
    _assert_disjoint_delta(stored_ids, delta.select("doc_id"), path)
    # duplicates WITHIN the delta would insert two graph nodes with
    # the same external id and serve the same doc twice in a top-k
    # (review r9); the delta is small by contract — one cheap agg
    dup = delta.groupBy("doc_id").count().filter(F.col("count") > 1).limit(1)
    if dup.count():
        raise ValueError(
            f"upsert delta for {path} contains duplicate ids — "
            "deduplicate the delta before adding"
        )

    # per-part delta sizes (≤ n_parts rows): names the touched
    # partitions AND maintains meta's part_counts in the same bounded
    # collect the old distinct() spent on names alone
    delta_counts = {
        int(r["part"]): r["count"]
        for r in delta.groupBy("part").count().collect()
    }
    touched = sorted(delta_counts)
    if not touched:
        return meta

    def extend_one(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=[f.name for f in GRAPH_SCHEMA.fields])
        part = int(pdf["part"].iloc[0])
        is_delta = pdf["level"] == -2
        stored = pdf[~is_delta]
        if len(stored):
            index = _index_from_rows(stored, m, efc, dim)
        else:
            # previously-empty partition: a fresh kernel, exactly what
            # a full rebuild would build there (review r9 — this case
            # crashed AND the crash landed after the marker removal)
            index = HnswIndex(
                dim=dim, m=m, ef_construction=efc, seed=seed,
                heuristic=heur,
            )
        dp = pdf[is_delta].sort_values("node_id")  # id-ASC, like build
        ids = dp["node_id"].to_numpy(dtype=np.int64)
        mat = _normalize_rows(np.array(list(dp["__delta_v"]), dtype=np.float64))
        index.add_items(mat, ids)
        return _index_to_rows(part, index)

    def extend_whole_partition(batches):
        pdf = pd.concat(list(batches), ignore_index=True)
        if not pdf.empty:
            yield extend_one(pdf)

    # same no-graph-shuffle shape as the search path: per touched
    # partition, one pruned graph scan unioned with that partition's
    # delta rows, coalesced into a single task — graph rows never
    # cross an exchange during maintenance either (the groupBy form
    # hash-exchanged every touched partition's whole graph)
    part_rels0 = dict(meta.get("part_rels", {}) or {})
    base_rel0 = meta.get("base_rel", "graph")
    out = None
    for p in touched:
        d_rows = delta.filter(F.col("part") == p).select(
            F.col("part").cast("long").alias("part"),
            F.lit(-2).cast("long").alias("ord"),
            F.col("doc_id").alias("node_id"),
            F.lit(-2).cast("int").alias("level"),
            F.lit(None).cast(ArrayType(LongType())).alias("neighbors"),
            F.lit(None).cast(ArrayType(DoubleType())).alias("vector"),
            F.lit(None).cast(StringType()).alias("meta_json"),
            F.col("v").alias("__delta_v"),
        )
        gdir = os.path.join(path, part_rels0.get(str(p), base_rel0))
        branch = d_rows
        if mio.is_dir(os.path.join(gdir, f"part={p}")):
            g_rows = (
                spark.read.parquet(gdir)
                .filter(F.col("part") == p)  # PartitionFilters prune
                .select(
                    F.col("part").cast("long").alias("part"),
                    "ord",
                    "node_id",
                    "level",
                    "neighbors",
                    "vector",
                    "meta_json",
                )
                .withColumn(
                    "__delta_v", F.lit(None).cast(ArrayType(DoubleType()))
                )
            )
            branch = g_rows.unionByName(d_rows)
        branch = branch.coalesce(1).mapInPandas(
            extend_whole_partition, GRAPH_SCHEMA
        )
        out = branch if out is None else out.unionByName(branch)
    rel = _fresh_upsert_rel(path)
    out.write.mode("overwrite").partitionBy("part").parquet(
        os.path.join(path, rel)
    )
    part_rels = dict(meta.get("part_rels", {}) or {})
    base_rel = meta.get("base_rel", "graph")
    superseded = [
        [part_rels.get(str(p), base_rel), p]
        for p in touched
        if mio.is_dir(
            os.path.join(path, part_rels.get(str(p), base_rel), f"part={p}")
        )
    ]
    for p in touched:
        part_rels[str(p)] = rel
    meta["part_rels"] = part_rels
    # maintain the per-partition node counts ONLY on post-r10 lineage
    # (a pre-r10 meta has no baseline to add deltas to — compaction
    # falls back to the graph-scan stats path for those)
    if "part_counts" in meta:
        counts = dict(meta["part_counts"] or {})
        for p, n in delta_counts.items():
            counts[str(p)] = counts.get(str(p), 0) + n
        meta["part_counts"] = counts
    meta["corpus"] = _merge_fingerprint(
        meta.get("corpus"), _corpus_fingerprint(new_vectors, id_col)
    )
    # one-commit GC grace: delete the dirs the PREVIOUS commit
    # superseded, record this commit's for the next one
    gc_now = meta.get("gc_pending", [])
    meta["gc_pending"] = superseded
    mio.write_json(mio.join(path, "meta.json"), meta, indent=2)  # commit
    _gc_dirs(path, gc_now)
    return meta


def delete_from_hnsw_index(
    spark: SparkSession, path: str, ids: list[int]
) -> dict[str, Any]:
    """hnswlib ``mark_deleted`` on the graph tier: tombstone doc ids
    WITHOUT touching the graph — deleted nodes keep ROUTING the beam
    (their out-edges still navigate) but are filtered from results,
    which is exactly hnswlib's semantics. O(deleted) bytes written;
    ``compact_hnsw_index`` removes them physically. Idempotent per
    id; runs under the commit lock (a delete landing inside a
    concurrent compaction's window would be silently dropped)."""
    with mio.commit_lock(path):
        meta = mio.read_json(mio.join(path, "meta.json"))
        if meta is None or meta.get("kind") != "hnsw_vendored":
            raise FileNotFoundError(f"no complete vendored-HNSW index at {path}")
        tomb = _tomb_dir(path, meta)
        existing: set[int] = set()
        if mio.is_dir(tomb):
            existing = {r["id"] for r in mio.read_parquet_rows(tomb)}
        fresh = sorted(set(int(i) for i in ids) - existing)
        if fresh:
            spark.createDataFrame(
                pd.DataFrame({"id": np.array(fresh, dtype=np.int64)})
            ).write.mode("append").parquet(tomb)
            meta["n_deleted"] = meta.get("n_deleted", 0) + len(fresh)
            mio.write_json(mio.join(path, "meta.json"), meta, indent=2)
        return meta


def _fresh_compact_rel(path: str) -> str:
    n = 1
    while os.path.isdir(os.path.join(path, f"graph_c{n}")):
        n += 1
    return f"graph_c{n}"


def _fresh_tomb_rel(path: str) -> str:
    n = 1
    while os.path.isdir(os.path.join(path, f"tombstones_g{n}")):
        n += 1
    return f"tombstones_g{n}"


def compact_hnsw_index(
    spark: SparkSession,
    path: str,
    min_dead_fraction: float | None = None,
) -> dict[str, Any]:
    """OPTIMIZE for the graph tier: fold upsert generations and apply
    tombstones by REBUILDING a partition's kernel from its live
    level-0 vectors (graph deletion is structural — unlike the
    sign/lexical tiers a row filter can't express it, so compaction
    here pays the per-partition graph build, exactly what hnswlib
    users do when deleted mass grows). A rebuilt partition inserts
    id-ASC with a fresh seeded RNG, so it is BIT-IDENTICAL to
    ``build_hnsw_index`` over its live rows (pinned in tests). Commit
    = one atomic meta write; superseded dirs get one commit of reader
    grace. No-op when there is nothing to fold.

    ``min_dead_fraction=None`` (default) is the full OPTIMIZE: every
    partition rebuilds to canonical form (``base_rel`` repointed,
    ``part_rels`` cleared, all tombstones physically gone) — the
    compacted index equals a fresh build over the live corpus.

    ``min_dead_fraction=x`` is INCREMENTAL OPTIMIZE (round-10): only
    partitions whose tombstoned fraction exceeds ``x`` rebuild —
    O(dirty partitions), not O(index). Clean partitions' generation
    dirs are untouched (byte-for-byte, pinned in tests); tombstones
    routed to uncompacted partitions SURVIVE into a fresh versioned
    tombstone relation (``tomb_rel``) swapped by the same meta commit,
    so they keep masking until their partition's turn. At 100 TB this
    is the difference between rewriting the whole index and rewriting
    the churned shards — the same dirty-partition economics as delta
    compaction in table formats."""
    with mio.commit_lock(path):
        meta = mio.read_json(mio.join(path, "meta.json"))
        if meta is None or meta.get("kind") != "hnsw_vendored":
            raise FileNotFoundError(f"no complete vendored-HNSW index at {path}")
        tomb = _tomb_dir(path, meta)
        has_tomb = mio.is_dir(tomb)
        if min_dead_fraction is None:
            if not (meta.get("part_rels") or has_tomb):
                return meta  # single clean generation already
        elif not has_tomb:
            return meta  # incremental mode folds only dead mass
        m, efc, dim, seed = (
            meta["m"],
            meta["ef_construction"],
            meta["dim"],
            meta.get("seed", 42),
        )
        g0 = _read_graph(spark, path, meta).filter(F.col("level") == 0)
        tomb_df = (
            spark.read.parquet(tomb).withColumnRenamed("id", "doc_id")
            if has_tomb
            else None
        )
        live = g0.select(
            "part",
            F.col("node_id").alias("doc_id"),
            F.col("vector").alias("v"),
        )
        if tomb_df is not None:
            live = live.join(tomb_df, "doc_id", "left_anti")

        part_rels = dict(meta.get("part_rels", {}) or {})
        base_rel = meta.get("base_rel", "graph")
        if min_dead_fraction is None:
            dirty = list(range(int(meta["n_parts"])))
            n_removed = meta.get("n_deleted", 0)
            remaining: list[int] = []
        else:
            # tombstone routing uses THE partition rule (xxhash64 is a
            # Spark-side hash) — one bounded collect (≤ deletes, the
            # mark_deleted contract)
            tomb_rows = tomb_df.withColumn(
                "part", _part_expr("doc_id", int(meta["n_parts"]))
            ).collect()
            dead_by_part: dict[int, int] = {}
            for r in tomb_rows:
                p = int(r["part"])
                dead_by_part[p] = dead_by_part.get(p, 0) + 1
            # dirty-shard decision from METADATA (round-10): the
            # per-partition node counts ride meta since this round, so
            # "which shards to compact" costs zero graph I/O — at
            # 100 TB a full index pass just to find dirty shards IS
            # the cost incremental OPTIMIZE exists to avoid. Pre-r10
            # artifacts (no part_counts) fall back to one graph scan.
            pc = meta.get("part_counts")
            if pc:
                sizes = {int(k): int(v) for k, v in pc.items()}
            else:
                sizes = {
                    int(r["part"]): int(r["n"])
                    for r in g0.groupBy("part")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            dirty = sorted(
                p
                for p, dead in dead_by_part.items()
                if sizes.get(p) and dead / sizes[p] > min_dead_fraction
            )
            if not dirty:
                return meta  # no shard over the threshold
            dirty_set = set(dirty)
            remaining = sorted(
                int(r["doc_id"])
                for r in tomb_rows
                if int(r["part"]) not in dirty_set
            )
            n_removed = len(tomb_rows) - len(remaining)
            live = live.filter(F.col("part").isin(dirty))
        # one bounded collect (≤ n_parts rows): the emptiness guard's
        # total AND the rebuilt partitions' node counts for meta
        live_counts = {
            int(r["part"]): int(r["count"])
            for r in live.groupBy("part").count().collect()
        }
        n_live = sum(live_counts.values())
        if n_live == 0 and (
            min_dead_fraction is None
            # incremental: only refuse when the dirty set covers every
            # populated shard — i.e. the rebuild would leave ZERO
            # physical rows anywhere (non-dirty shards keep their rows;
            # their tombstones just mask them)
            or all(p in dirty_set for p, n in sizes.items() if n)
        ):
            raise ValueError(
                f"compaction would leave the HNSW index at {path} EMPTY "
                "(every row tombstoned) — rebuild over a fresh corpus instead"
            )
        rel = _fresh_compact_rel(path)
        # stored vectors are already normalized; build_one re-normalizes,
        # which is idempotent on unit vectors — the rebuilt partition is
        # bit-identical to a fresh build over the live rows
        live.groupBy("part").applyInPandas(
            _build_partition_udf(
                m, efc, seed, dim, bool(meta.get("heuristic", False))
            ),
            GRAPH_SCHEMA
        ).write.mode("overwrite").partitionBy("part").parquet(
            os.path.join(path, rel)
        )
        superseded = []
        for p in dirty:
            old = part_rels.get(str(p), base_rel)
            if mio.is_dir(os.path.join(path, old, f"part={p}")):
                superseded.append([old, p])
        if has_tomb:
            # the superseded tombstone relation ALWAYS enters
            # gc_pending (crash resilience: if the immediate removal
            # below doesn't run, the next commit's GC reclaims it);
            # with survivors it additionally gets the one-commit
            # reader grace, with none it is removed immediately below
            # as well — leaving a fully-folded dir named "tombstones"
            # on disk while meta drops tomb_rel would make the DEFAULT
            # relation name resolve back to the stale dir (a re-added
            # id would be rejected as a duplicate by the upsert
            # disjointness check)
            superseded.append([meta.get("tomb_rel", "tombstones"), None])
        if n_removed:
            meta["n_compacted_away"] = (
                meta.get("n_compacted_away", 0) + n_removed
            )
        if min_dead_fraction is None:
            meta.pop("n_deleted", None)
            meta["base_rel"] = rel
            meta["part_rels"] = {}
            meta.pop("tomb_rel", None)
            # canonical rebuild: the live counts ARE the new census
            meta["part_counts"] = {
                str(p): n for p, n in sorted(live_counts.items())
            }
        else:
            for p in dirty:
                part_rels[str(p)] = rel
            meta["part_rels"] = part_rels
            if "part_counts" in meta:
                counts = dict(meta["part_counts"] or {})
                for p in dirty:
                    # a fully-tombstoned shard rebuilds to zero rows;
                    # recording 0 keeps future dirty decisions honest
                    counts[str(p)] = live_counts.get(p, 0)
                meta["part_counts"] = counts
            if remaining:
                # survivors move to a FRESH versioned relation; the
                # meta commit swaps it in atomically (a crash before
                # the commit leaves the old relation fully live)
                new_tomb = _fresh_tomb_rel(path)
                spark.createDataFrame(
                    pd.DataFrame({"id": np.array(remaining, dtype=np.int64)})
                ).write.mode("overwrite").parquet(
                    os.path.join(path, new_tomb)
                )
                meta["tomb_rel"] = new_tomb
                meta["n_deleted"] = len(remaining)
            else:
                meta.pop("n_deleted", None)
                meta.pop("tomb_rel", None)
        gc_now = meta.get("gc_pending", [])
        meta["gc_pending"] = superseded
        # fingerprint: recompute over live ids is WRONG here for the
        # same reason as the sign tier (lineage identity — ensure
        # callers pass the ORIGINAL corpus); it stays as committed.
        mio.write_json(mio.join(path, "meta.json"), meta, indent=2)  # commit
        if has_tomb and (min_dead_fraction is None or not remaining):
            # every mask is physically folded away; the tombstone dir
            # goes with them immediately (the lifecycle's "cleared"
            # contract, and the default-relation-name hazard above)
            mio.remove_tree(tomb)
        _gc_dirs(path, gc_now)
        return meta
