"""Persisted ANN index artifacts (S9/S10).

The reference serializes its graph indexes to binary files and
reloads them on the next run (hnswlib ``003-hnswlib_demo.py:234-257``
``save_index``/``load_index``; FAISS ``004-faiss_demo.py:223-249``
``write_index``/``read_index``), skipping the expensive rebuild when
the artifact exists (cache check ``003:234-251``).

Spark-native index-at-rest:

- **LSH** (S9 analogue): the capped (id, table_idx, bucket) table as
  parquet partitioned by ``table_idx``. Hyperplanes are derived
  deterministically from the stored seed, so the artifact is
  self-describing via ``meta.json`` alone.
- **IVF** (S10 analogue): centroids as a tiny parquet + the
  assignment table partitioned by ``centroid_id`` — the inverted
  lists ARE parquet partitions, so probing ``n_probe`` centroids is
  partition pruning: unprobed lists are never read from disk. That is
  the at-rest property that matters at 100 TB (the reference gets it
  via in-RAM adjacency; we get it from the layout).

``meta.json`` is written LAST and is the completeness marker: a
partially-written index (job died mid-write) has no meta and is
rebuilt. ``ensure_*`` also rebuilds when the stored params differ
from the requested ones.

Search reuse: query batches against a stored index skip the corpus
signature/assignment scan entirely — the only per-batch work is
bucketing/probing the (small) query side and the candidate re-rank.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.functions.vector import l2_normalize
from inside_vectordb_spark.operators.ann import (
    _rerank_candidates,
    _hyperplanes,
    ivf_assign,
    kmeans_centroids,
    lsh_bucket_ids,
)


def _read_meta(path: str) -> dict[str, Any] | None:
    return mio.read_json(mio.join(path, "meta.json"))


def _begin_rebuild(path: str) -> None:
    """Invalidate the completeness marker BEFORE any data dir is
    touched: a rebuild overwrites the live relations in place, so a
    crash mid-rebuild must leave "no complete index" (forcing a clean
    rebuild) rather than a stale meta that validates torn data —
    meta.json written last is only a completeness marker if it is
    also REMOVED first (review r6s2; the lexical index solves the
    same problem with generation dirs, which its multi-relation
    layout needs — a single-relation ANN artifact only needs the
    marker discipline). Goes through the _meta_io seam like every
    other control-file touch: a raw os.remove would silently no-op on
    an object-store deployment and leave the stale marker standing
    (advice r6)."""
    mio.remove_file(mio.join(path, "meta.json"))


def _assert_disjoint_delta(
    stored_ids: DataFrame, delta_ids: DataFrame, path: str
) -> None:
    """Enforce the append-only contract every upsert in this repo
    shares (FAISS ``add``): re-adding a stored id would duplicate its
    index row and serve the same doc twice in a top-k. Both inputs
    are single-column id frames; the delta is small by contract →
    broadcast semi-join, one count."""
    a = stored_ids.toDF("__sid")
    b = delta_ids.toDF("__sid")
    n_dup = a.join(F.broadcast(b), "__sid", "left_semi").count()
    if n_dup:
        raise ValueError(
            f"upsert: {n_dup} delta id(s) already in the index at "
            f"{path} — upserts are append-only (rebuild to replace "
            "existing vectors)"
        )


def _write_meta(path: str, meta: dict[str, Any]) -> None:
    mio.write_json(mio.join(path, "meta.json"), meta, indent=2)


# (source path, id_col, content_col) → (file stat, fingerprint dict);
# see the memo note inside _corpus_fingerprint. Keyed by PATH with the
# stat tuple in the VALUE (advice r12): a rewritten table replaces its
# entry instead of accreting one per (mtime, size), so the memo is
# bounded by the number of live tables in a long-lived driver.
_FINGERPRINT_MEMO: dict = {}


def _corpus_fingerprint(
    corpus: DataFrame, id_col: str, content_col: str | None = None
) -> dict[str, int]:
    """Cheap corpus identity for the cache check: row count + id
    range. A changed corpus at the same path must NOT silently reuse
    the stale artifact (the reference's hnswlib cache check has this
    gap — ``003:234-251`` keys on params only). Count+min/max is one
    columnar scan of the id column (parquet answers it from
    metadata/stats at rest), so the check stays far cheaper than the
    rebuild it guards.

    For TEXT-bearing tables pass ``content_col``: folds
    ``sum(length(content))`` into the fingerprint so an in-place edit
    of document text at unchanged ids (same count, same id range)
    still invalidates the cached index — closes the round-4 advisory
    gap on the lexical index. Still one cheap columnar aggregate."""
    # Optimization r12: a bare ``io.load_table`` frame carries its
    # source file's (path, mtime_ns, size) tag; the fingerprint of an
    # UNCHANGED file is the same value every time, so recomputing the
    # scalar agg per ensure call (~0.3 s of pure job overhead, paid by
    # every indexed query construction) buys nothing. The memo is
    # keyed by the file stat — any rewrite of the table invalidates
    # it — and only exact load_table frames have the tag, so filtered
    # deltas (upserts) always compute fresh. This is catalog-style
    # metadata validation, not result caching: every query still
    # scans its data in full.
    stat = getattr(corpus, "_sg_source_stat", None)
    memo_key = (stat[0], id_col, content_col) if stat is not None else None
    if memo_key is not None:
        hit = _FINGERPRINT_MEMO.get(memo_key)
        if hit is not None and hit[0] == stat:
            return dict(hit[1])
    aggs = [
        F.count("*").alias("n"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
    ]
    if content_col is not None:
        aggs.append(F.sum(F.length(F.col(content_col))).alias("chars"))
    row = corpus.agg(*aggs).collect()[0]
    fp = {
        "n": int(row["n"]),
        "lo": int(row["lo"]) if row["lo"] is not None else None,
        "hi": int(row["hi"]) if row["hi"] is not None else None,
    }
    if content_col is not None:
        fp["chars"] = int(row["chars"]) if row["chars"] is not None else 0
    if memo_key is not None:
        _FINGERPRINT_MEMO[memo_key] = (stat, dict(fp))
    return fp


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------


def build_lsh_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_tables: int = 4,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 2000,
) -> dict[str, Any]:
    """X1-analogue build + S9 sink: signature scan → capped bucket
    table → parquet. One corpus pass, no joins."""
    _begin_rebuild(path)
    cb = lsh_bucket_ids(corpus, id_col, vec_col, dim, n_tables, n_bits, seed)
    if max_bucket_size is not None:
        w = Window.partitionBy("table_idx", "bucket").orderBy("id")
        cb = (
            cb.withColumn("__bpos", F.row_number().over(w))
            .filter(F.col("__bpos") <= max_bucket_size)
            .drop("__bpos")
        )
    os.makedirs(path, exist_ok=True)
    # repartition on the partition key first: one file per table dir
    # instead of (#task-partitions × #tables) tiny files — small-file
    # explosion is a real read-path tax (observed 2.5× slower search)
    cb.repartition("table_idx").write.mode("overwrite").partitionBy(
        "table_idx"
    ).parquet(os.path.join(path, "buckets"))
    meta = {
        "kind": "lsh",
        "dim": dim,
        "n_tables": n_tables,
        "n_bits": n_bits,
        "seed": seed,
        "max_bucket_size": max_bucket_size,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    _write_meta(path, meta)
    return meta


def ensure_lsh_index(corpus: DataFrame, path: str, **params: Any) -> dict[str, Any]:
    """Build unless a complete index with identical params AND the
    same corpus fingerprint exists (the reference's cache check,
    ``003:234-251``, keys on params only — a changed corpus at the
    same path would silently serve stale buckets)."""
    meta = _read_meta(path)
    want = {
        "kind": "lsh",
        # RESOLVED defaults included (review r8, the ensure_mrl_index
        # r7 fix applied to this tier): a caller relying on the
        # documented defaults must not silently accept an artifact
        # built at different knobs.
        "n_tables": params.get("n_tables", 4),
        "n_bits": params.get("n_bits", 12),
        "seed": params.get("seed", 42),
        "max_bucket_size": params.get("max_bucket_size", 2000),
        # id_col/vec_col are caller-side names, never stored in meta —
        # including them would fail the compare and force a silent
        # full rebuild on EVERY call (the ensure_sq_index fix, applied
        # to all tiers in r6s2)
        **{k: v for k, v in params.items() if k not in ("id_col", "vec_col")},
        "corpus": _corpus_fingerprint(corpus, params.get("id_col", "vec_id")),
    }
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return meta
    return build_lsh_index(corpus, path, **params)


def _merge_fingerprint(
    old: dict[str, int] | None, new: dict[str, int]
) -> dict[str, int]:
    """Fingerprint of (old corpus ∪ delta), assuming disjoint ids —
    the append-only contract. Keeping it identical to what
    ``_corpus_fingerprint`` would compute over the full corpus means
    a later ``ensure_*`` call with the full corpus recognizes the
    upserted index as current and skips the rebuild."""
    if old is None or old.get("n") in (None, 0):
        return new
    merged = {
        "n": old["n"] + new["n"],
        "lo": min(x for x in (old["lo"], new["lo"]) if x is not None),
        "hi": max(x for x in (old["hi"], new["hi"]) if x is not None),
    }
    if "chars" in old or "chars" in new:
        merged["chars"] = old.get("chars", 0) + new.get("chars", 0)
    return merged


def upsert_lsh_index(
    new_vectors: DataFrame, path: str, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """Incremental index maintenance — the reference's batched
    ``add_items`` loop (``003-hnswlib_demo.py:207-220`` adds 1000
    vectors at a time to the live index) re-expressed as an
    append-only delta write. Only the NEW vectors are signature-
    hashed; their bucket rows land as additional parquet files inside
    the same ``table_idx`` partitions, so search (which reads the
    bucket table as one scan) needs zero changes. At 100 TB this is
    the difference between a full rebuild (scan + rewrite everything)
    and work proportional to the delta.

    The per-bucket cap is enforced against EXISTING occupancy by
    reading only the touched buckets (a broadcast semi-join prunes
    the stored table); like hnswlib, earlier inserts are never
    evicted — a full bucket rejects late arrivals, and recall for
    them rides the other tables.

    Contract: delta ids must be disjoint from stored ids (FAISS
    ``add`` appends; it never replaces). A crash mid-append leaves
    meta's fingerprint stale, which the next ``ensure_lsh_index``
    call detects as a mismatch and repairs via full rebuild.
    """
    # serialize maintenance under the commit lock (review r9-4, the
    # hnsw/sign r9-2 rule applied tier-wide): without it the
    # disjointness guard races a concurrent upsert of the same delta
    # (both pass, the second appends duplicate rows), and readers /
    # ensure_* hit the marker window of a healthy index mid-append
    with mio.commit_lock(path):
        meta = _read_meta(path)
        if meta is None or meta.get("kind") != "lsh":
            raise FileNotFoundError(f"no complete LSH index at {path}")
        spark = new_vectors.sparkSession
        buckets_path = os.path.join(path, "buckets")
        _assert_disjoint_delta(
            spark.read.parquet(buckets_path).select("id").distinct(),
            new_vectors.select(id_col),
            path,
        )
        nb = lsh_bucket_ids(
            new_vectors, id_col, vec_col,
            meta["dim"], meta["n_tables"], meta["n_bits"], meta["seed"],
        )
        cap = meta.get("max_bucket_size")
        if cap is not None:
            touched = nb.select("table_idx", "bucket").distinct()
            occupancy = (
                spark.read.parquet(buckets_path)
                .join(F.broadcast(touched), ["table_idx", "bucket"], "left_semi")
                .groupBy("table_idx", "bucket")
                .agg(F.count("*").alias("__occ"))
            )
            w = Window.partitionBy("table_idx", "bucket").orderBy("id")
            nb = (
                nb.withColumn("__pos", F.row_number().over(w))
                .join(F.broadcast(occupancy), ["table_idx", "bucket"], "left")
                .filter(F.coalesce(F.col("__occ"), F.lit(0)) + F.col("__pos") <= cap)
                .drop("__pos", "__occ")
            )
        # invalidate the completeness marker BEFORE the append: a crash
        # mid-append (partially visible task commits) must read as "no
        # complete index" — the next ensure_* rebuilds — never a valid
        # meta over torn appended rows; the meta rewrite below restores
        # the marker as the commit point (review r8)
        _begin_rebuild(path)
        nb.repartition("table_idx").write.mode("append").partitionBy(
            "table_idx"
        ).parquet(buckets_path)
        meta["corpus"] = _merge_fingerprint(
            meta.get("corpus"), _corpus_fingerprint(new_vectors, id_col)
        )
        _write_meta(path, meta)
        return meta


def upsert_ivf_index(
    new_vectors: DataFrame, path: str, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """Incremental IVF maintenance — FAISS's ``index.add`` contract
    (``004-faiss_demo.py:199-211`` adds batches without retraining
    the quantizer): assign NEW vectors to the EXISTING centroids and
    append them to the inverted lists. Centroids stay fixed, so the
    stored assignments after an upsert are bit-identical to assigning
    the full corpus against the stored quantizer (pinned in
    tests/test_ann_index.py), and probing/partition pruning see the
    union of old + delta files per list automatically."""
    # serialize maintenance under the commit lock (review r9-4, the
    # hnsw/sign r9-2 rule applied tier-wide): without it the
    # disjointness guard races a concurrent upsert of the same delta
    # (both pass, the second appends duplicate rows), and readers /
    # ensure_* hit the marker window of a healthy index mid-append
    with mio.commit_lock(path):
        meta = _read_meta(path)
        if meta is None or meta.get("kind") != "ivf":
            raise FileNotFoundError(f"no complete IVF index at {path}")
        spark = new_vectors.sparkSession
        _assert_disjoint_delta(
            spark.read.parquet(os.path.join(path, "assignments")).select("id"),
            new_vectors.select(id_col),
            path,
        )
        cents = load_ivf_centroids(spark, path)
        # invalidate the completeness marker BEFORE the append: a crash
        # mid-append (partially visible task commits) must read as "no
        # complete index" — the next ensure_* rebuilds — never a valid
        # meta over torn appended rows; the meta rewrite below restores
        # the marker as the commit point (review r8)
        _begin_rebuild(path)
        (
            ivf_assign(new_vectors, id_col, vec_col, cents)
            .repartition("centroid_id")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(os.path.join(path, "assignments"))
        )
        meta["corpus"] = _merge_fingerprint(
            meta.get("corpus"), _corpus_fingerprint(new_vectors, id_col)
        )
        _write_meta(path, meta)
        return meta


def ann_lsh_topk_indexed(
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """T3 search against a STORED index: only the query side is
    signature-hashed per batch; the corpus bucket table is a parquet
    scan (and the candidate join broadcasts the query buckets, so the
    stored table never shuffles)."""
    meta = _read_meta(path)
    if meta is None or meta.get("kind") != "lsh":
        raise FileNotFoundError(f"no complete LSH index at {path}")
    spark = queries.sparkSession
    cb = spark.read.parquet(os.path.join(path, "buckets"))
    qb = lsh_bucket_ids(
        queries, query_id, query_vec,
        meta["dim"], meta["n_tables"], meta["n_bits"], meta["seed"],
    )
    cand = (
        F.broadcast(qb.select(F.col("id").alias("query_id"), "table_idx", "bucket"))
        .join(
            cb.select(F.col("id").alias("doc_id"), "table_idx", "bucket"),
            ["table_idx", "bucket"],
        )
        .select("query_id", "doc_id")
        .distinct()
    )
    return _rerank_candidates(
        cand, queries, corpus, query_id, query_vec, corpus_id, corpus_vec, k, round_to
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """X2-analogue build + S10 sink: train the coarse quantizer,
    assign every vector, land centroids + assignments with the
    inverted lists as parquet partitions."""
    spark = corpus.sparkSession
    _begin_rebuild(path)
    cents = kmeans_centroids(corpus, vec_col, n_centroids, seed, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    cents_pdf = pd.DataFrame(
        {
            "centroid_id": np.arange(len(cents), dtype=np.int32),
            "vector": [row.tolist() for row in cents],
        }
    )
    (
        spark.createDataFrame(cents_pdf)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "centroids"))
    )
    (
        ivf_assign(corpus, id_col, vec_col, cents)
        .repartition("centroid_id")  # one file per inverted list
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "assignments"))
    )
    meta = {
        "kind": "ivf",
        "n_centroids": n_centroids,
        "seed": seed,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    _write_meta(path, meta)
    return meta


def ensure_ivf_index(corpus: DataFrame, path: str, **params: Any) -> dict[str, Any]:
    meta = _read_meta(path)
    want = {
        "kind": "ivf",
        # RESOLVED defaults included (review r8, the ensure_mrl_index
        # r7 fix applied to this tier): a caller relying on the
        # documented defaults must not silently accept an artifact
        # built at different knobs.
        "n_centroids": params.get("n_centroids", 16),
        "seed": params.get("seed", 42),
        # id_col/vec_col are caller-side names, never stored in meta —
        # including them would fail the compare and force a silent
        # full rebuild on EVERY call (the ensure_sq_index fix, applied
        # to all tiers in r6s2)
        **{k: v for k, v in params.items() if k not in ("id_col", "vec_col")},
        "corpus": _corpus_fingerprint(corpus, params.get("id_col", "vec_id")),
    }
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return meta
    return build_ivf_index(corpus, path, **params)


def load_ivf_centroids(spark: SparkSession, path: str) -> np.ndarray:
    rows = mio.read_parquet_rows(
        os.path.join(path, "centroids"), order_by=("centroid_id",)
    )
    return np.array([r["vector"] for r in rows], dtype=np.float64)


# ---------------------------------------------------------------------------
# IVF-PQ (combined: coarse partition pruning × compressed codes)
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    ks: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """The FAISS-at-scale architecture (IVF-PQ), Spark-native: a
    coarse quantizer routes every vector to an inverted list
    (parquet partition — probing = partition pruning, unread lists
    cost zero I/O), and each list stores PQ codes (m small ints per
    vector — ~32× less I/O than raw float32 vectors when a list IS
    read). Codes are non-residual (encode the vector itself, not
    x − centroid): determinism and engine-portability over the last
    ~10% of quantization accuracy; the exact re-rank restores true
    scores either way."""
    from inside_vectordb_spark.operators.pq import pq_encode, pq_train

    spark = corpus.sparkSession
    _begin_rebuild(path)
    cents = kmeans_centroids(corpus, vec_col, n_centroids, seed, id_col=id_col)
    books = pq_train(corpus, vec_col, dim, m, ks, seed, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    (
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "centroid_id": np.arange(len(cents), dtype=np.int32),
                    "vector": [row.tolist() for row in cents],
                }
            )
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "centroids"))
    )
    (
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "subspace": np.repeat(np.arange(m, dtype=np.int32), ks),
                    "code": np.tile(np.arange(ks, dtype=np.int32), m),
                    "vector": [row.tolist() for row in books.reshape(m * ks, -1)],
                }
            )
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codebooks"))
    )
    codes = pq_encode(corpus, id_col, vec_col, books)
    assigned = codes.join(ivf_assign(corpus, id_col, vec_col, cents), "id")
    (
        assigned.repartition("centroid_id")  # one file per inverted list
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "codes"))
    )
    meta = {
        "kind": "ivfpq",
        "dim": dim,
        "n_centroids": n_centroids,
        "m": m,
        "ks": ks,
        "seed": seed,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    _write_meta(path, meta)
    return meta


def ensure_ivfpq_index(corpus: DataFrame, path: str, **params: Any) -> dict[str, Any]:
    meta = _read_meta(path)
    want = {
        "kind": "ivfpq",
        # RESOLVED defaults included (review r8, the ensure_mrl_index
        # r7 fix applied to this tier): a caller relying on the
        # documented defaults must not silently accept an artifact
        # built at different knobs.
        "n_centroids": params.get("n_centroids", 16),
        "m": params.get("m", 8),
        "ks": params.get("ks", 16),
        "seed": params.get("seed", 42),
        # id_col/vec_col are caller-side names, never stored in meta —
        # including them would fail the compare and force a silent
        # full rebuild on EVERY call (the ensure_sq_index fix, applied
        # to all tiers in r6s2)
        **{k: v for k, v in params.items() if k not in ("id_col", "vec_col")},
        "corpus": _corpus_fingerprint(corpus, params.get("id_col", "vec_id")),
    }
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return meta
    return build_ivfpq_index(corpus, path, **params)


def ann_ivfpq_topk_indexed(
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 4,
    refine: int = 5,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """IVF-PQ search: probe ``n_probe`` lists per query (scan-level
    partition pruning over the union of probed lists), ADC-score the
    compressed codes with each query masked to ITS probed lists,
    refine ``k·refine`` candidates with exact cosine. Two knobs, two
    axes: ``n_probe`` bounds I/O, ``refine`` bounds exact-rerank
    compute."""
    from inside_vectordb_spark.operators.ann import _rerank_candidates
    from inside_vectordb_spark.operators.pq import (
        _normalize_rows,
        pq_adc_candidates_probed,
    )
    from pyspark.sql import Window as _W

    meta = _read_meta(path)
    if meta is None or meta.get("kind") != "ivfpq":
        raise FileNotFoundError(f"no complete IVF-PQ index at {path}")
    spark = queries.sparkSession
    cents = load_ivf_centroids(spark, path)
    books = load_pq_codebooks(spark, path)

    qrows = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("v")
    ).collect()
    if not qrows:
        raise ValueError("empty query set")  # 1-D np.array([]) would
        # reach _normalize_rows as an opaque AxisError otherwise
        # (review r8 — the guard ann_pq_topk already has)
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    order = np.argsort(-(_normalize_rows(qmat) @ cents.T), axis=1)[:, :n_probe]
    probe_lists = {int(qids[i]): set(map(int, order[i])) for i in range(len(qids))}
    probed_ids = sorted({c for s in probe_lists.values() for c in s})

    codes_all = spark.read.parquet(os.path.join(path, "codes"))
    codes = codes_all.filter(F.col("centroid_id").isin(probed_ids))
    # candidate count floored to a FRACTION of the stored corpus, not
    # a fixed k*refine: recall tracks the candidate fraction, and the
    # fixed count starves it as N grows (ann_pq_topk measured 0.83 ->
    # 0.615 recall@10 at N=2000 before gaining the same floor — the
    # r6 scale-sweep defect, applied to this tier in review r8). The
    # corpus size comes from the meta fingerprint (kept current across
    # upserts by _merge_fingerprint) — a distinct().count() over the
    # m-rows-per-doc codes table would be a full shuffle per search
    # call (advisory r9).
    import math as _math

    n_corpus = int(meta["corpus"]["n"])
    n_refine = max(k * refine, _math.ceil(0.075 * n_corpus))
    partials = pq_adc_candidates_probed(
        codes, qids, qmat, books, probe_lists, n_refine
    )
    w = _W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("doc_id"))
    cand = (
        partials.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_refine)
        .select("query_id", "doc_id")
    )
    return _rerank_candidates(
        cand, queries, corpus, query_id, query_vec, corpus_id, corpus_vec, k, round_to
    )


# ---------------------------------------------------------------------------
# PQ
# ---------------------------------------------------------------------------


def build_pq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    m: int = 8,
    ks: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """PQ build + sink: train per-subspace codebooks, encode the
    corpus, land codebooks (tiny) + the codes table as parquet. The
    codes table is the compressed corpus — ``m`` small ints per
    vector instead of ``dim`` floats — and is what ADC search scans;
    the raw vectors are only touched by the final exact re-rank on
    refined candidates."""
    from inside_vectordb_spark.operators.pq import pq_encode, pq_train

    spark = corpus.sparkSession
    _begin_rebuild(path)
    books = pq_train(corpus, vec_col, dim, m, ks, seed, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    books_pdf = pd.DataFrame(
        {
            "subspace": np.repeat(np.arange(m, dtype=np.int32), ks),
            "code": np.tile(np.arange(ks, dtype=np.int32), m),
            "vector": [row.tolist() for row in books.reshape(m * ks, -1)],
        }
    )
    (
        spark.createDataFrame(books_pdf)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codebooks"))
    )
    (
        pq_encode(corpus, id_col, vec_col, books)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codes"))
    )
    meta = {
        "kind": "pq",
        "dim": dim,
        "m": m,
        "ks": ks,
        "seed": seed,
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    _write_meta(path, meta)
    return meta


def ensure_pq_index(corpus: DataFrame, path: str, **params: Any) -> dict[str, Any]:
    meta = _read_meta(path)
    want = {
        "kind": "pq",
        # RESOLVED defaults included (review r8, the ensure_mrl_index
        # r7 fix applied to this tier): a caller relying on the
        # documented defaults must not silently accept an artifact
        # built at different knobs.
        "m": params.get("m", 8),
        "ks": params.get("ks", 16),
        "seed": params.get("seed", 42),
        # id_col/vec_col are caller-side names, never stored in meta —
        # including them would fail the compare and force a silent
        # full rebuild on EVERY call (the ensure_sq_index fix, applied
        # to all tiers in r6s2)
        **{k: v for k, v in params.items() if k not in ("id_col", "vec_col")},
        "corpus": _corpus_fingerprint(corpus, params.get("id_col", "vec_id")),
    }
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return meta
    return build_pq_index(corpus, path, **params)


def load_pq_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    meta = _read_meta(path)
    rows = mio.read_parquet_rows(
        os.path.join(path, "codebooks"), order_by=("subspace", "code")
    )
    books = np.array([r["vector"] for r in rows], dtype=np.float64)
    return books.reshape(meta["m"], meta["ks"], -1)


def ann_pq_topk_indexed(
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    refine: int = 5,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """PQ-ADC search against a STORED index: codebooks load
    driver-side (m·ks·dsub floats), the compressed codes table is the
    only corpus-wide scan, and the raw-vector table is touched only
    by the candidate-keyed exact re-rank."""
    from inside_vectordb_spark.operators.pq import ann_pq_topk

    meta = _read_meta(path)
    if meta is None or meta.get("kind") != "pq":
        raise FileNotFoundError(f"no complete PQ index at {path}")
    spark = queries.sparkSession
    books = load_pq_codebooks(spark, path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return ann_pq_topk(
        queries,
        corpus,
        dim=meta["dim"],
        k=k,
        m=meta["m"],
        ks=meta["ks"],
        refine=refine,
        query_id=query_id,
        query_vec=query_vec,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        round_to=round_to,
        codes=codes,
        codebooks=books,
    )


def ann_ivf_topk_indexed(
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """T4 search against a STORED index: centroids load driver-side
    (tiny), probed inverted lists come back via partition pruning —
    ``centroid_id IN (probes)`` prunes unprobed list files at the
    scan, the disk-level analogue of FAISS's nprobe."""
    meta = _read_meta(path)
    if meta is None or meta.get("kind") != "ivf":
        raise FileNotFoundError(f"no complete IVF index at {path}")
    spark = queries.sparkSession
    cents = load_ivf_centroids(spark, path)

    qrows = queries.select(
        F.col(query_id).alias("qid"), l2_normalize(query_vec).alias("v")
    ).collect()
    if not qrows:
        raise ValueError("empty query set")  # 1-D np.array([]) would
        # raise an opaque matmul ValueError otherwise (review r8)
    qids = [r["qid"] for r in qrows]
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    probes = spark.createDataFrame(
        [
            (int(qids[i]), int(order[i, j]))
            for i in range(len(qids))
            for j in range(order.shape[1])
        ],
        "query_id long, centroid_id int",
    )
    probed_ids = sorted({int(c) for row in order for c in row})
    assignments = (
        spark.read.parquet(os.path.join(path, "assignments"))
        .filter(F.col("centroid_id").isin(probed_ids))
    )
    cand = (
        F.broadcast(probes)
        .join(assignments, "centroid_id")
        .select("query_id", F.col("id").alias("doc_id"))
    )
    return _rerank_candidates(
        cand, queries, corpus, query_id, query_vec, corpus_id, corpus_vec, k, round_to
    )


# ---------------------------------------------------------------------------
# SQ8 (scalar quantization)
# ---------------------------------------------------------------------------


def build_sq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, Any]:
    """SQ8 build + sink: per-dimension (min, span) stats (tiny) plus
    the int8-codes table — the compressed corpus that search scans at
    1 byte/dim instead of 4. Training is deterministic (corpus-wide
    extrema, no seed), so stored codes ≡ fresh codes and the indexed
    search shares the in-memory path's FULL DuckDB oracle."""
    from inside_vectordb_spark.operators.sq import sq_encode_col, sq_train

    spark = corpus.sparkSession
    _begin_rebuild(path)
    mins, spans = sq_train(corpus, vec_col)
    mio.makedirs(path)
    # a rebuild starts a fresh index lifecycle: tombstones from the
    # previous index would silently exclude ids from the NEW corpus
    # (deletes are "compacted away by a rebuild" — so the rebuild must
    # actually drop them)
    mio.remove_tree(mio.join(path, "tombstones"))
    (
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "pos": np.arange(len(mins), dtype=np.int32),
                    "mn": mins,
                    "span": spans,
                }
            )
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "stats"))
    )
    (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            sq_encode_col(vec_col, mins, spans).alias("codes"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codes"))
    )
    meta = {
        "kind": "sq",
        "dim": len(mins),
        "corpus": _corpus_fingerprint(corpus, id_col),
    }
    _write_meta(path, meta)
    return meta


def delete_from_sq_index(
    spark: SparkSession, path: str, ids: list[int]
) -> dict[str, Any]:
    """FAISS ``remove_ids`` / hnswlib ``mark_deleted`` analogue:
    tombstone a set of doc ids in the persisted SQ index WITHOUT
    rewriting the codes table. Deletes append to a tiny ``tombstones``
    parquet; search anti-joins it (no broadcast hint — the set grows
    until the next rebuild, AQE broadcasts only while it is actually
    small). At 100 TB this is the
    only viable shape: a delete touches O(deleted) bytes, and the
    codes table is compacted away lazily by a rebuild, not eagerly.

    Idempotent per id: already-tombstoned ids are skipped, so re-runs
    do not grow the tombstone table or the meta counter.
    """
    # serialize maintenance under the commit lock (review r9-4, the
    # hnsw/sign r9-2 rule applied tier-wide): without it the
    # disjointness guard races a concurrent upsert of the same delta
    # (both pass, the second appends duplicate rows), and readers /
    # ensure_* hit the marker window of a healthy index mid-append
    with mio.commit_lock(path):
        meta = _read_meta(path)
        if meta is None or meta.get("kind") != "sq":
            raise FileNotFoundError(f"no complete SQ index at {path}")
        # idempotency via executor-side anti-join (the pq_det twin's
        # shape): the ACCUMULATED tombstone set can be corpus-sized after
        # crawl-scale delete campaigns, and the old deleted_ids() collect
        # round-tripped ALL of it through the driver on every delete of a
        # handful of ids (review r8). The delta side is caller-provided
        # and small; the anti-join count is bounded by len(ids).
        ids_df = spark.createDataFrame(
            pd.DataFrame({"doc_id": np.array(sorted(set(int(i) for i in ids)),
                                             dtype=np.int64)})
        ).distinct()
        tomb = os.path.join(path, "tombstones")
        if mio.is_dir(tomb):
            ids_df = ids_df.join(spark.read.parquet(tomb), "doc_id", "left_anti")
        n_fresh = ids_df.count()
        if n_fresh:
            ids_df.write.mode("append").parquet(tomb)
            meta["n_deleted"] = meta.get("n_deleted", 0) + n_fresh
            _write_meta(path, meta)
        return meta


def deleted_ids(spark: SparkSession, path: str) -> set[int]:
    """The current tombstone set (empty if none ever deleted)."""
    tomb = mio.join(path, "tombstones")
    if not mio.is_dir(tomb):
        return set()
    return {r["doc_id"] for r in mio.read_parquet_rows(tomb)}


def ensure_sq_index(corpus: DataFrame, path: str, **params: Any) -> dict[str, Any]:
    meta = _read_meta(path)
    want = {
        "kind": "sq",
        **{k: v for k, v in params.items() if k not in ("id_col", "vec_col")},
        "corpus": _corpus_fingerprint(corpus, params.get("id_col", "vec_id")),
    }
    if meta is not None and all(meta.get(k) == v for k, v in want.items()):
        return meta
    return build_sq_index(corpus, path, **params)


def load_sq_stats(spark: SparkSession, path: str) -> tuple[np.ndarray, np.ndarray]:
    rows = mio.read_parquet_rows(os.path.join(path, "stats"), order_by=("pos",))
    mins = np.array([r["mn"] for r in rows], dtype=np.float64)
    spans = np.array([r["span"] for r in rows], dtype=np.float64)
    return mins, spans


def ann_sq_topk_indexed(
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 10,
    refine: int = 5,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """SQ8 search against the persisted index: the approximate scan
    reads the codes parquet (4× less I/O than raw float32 vectors);
    raw vectors are only read by the candidate-keyed exact rerank.

    Tombstoned ids (``delete_from_sq_index``) are excluded from
    candidate generation via a broadcast anti join on the codes scan —
    deleted vectors can therefore never reach the rerank either."""
    from inside_vectordb_spark.operators.sq import ann_sq_topk

    meta = _read_meta(path)
    if meta is None or meta.get("kind") != "sq":
        raise FileNotFoundError(f"no complete SQ index at {path}")
    spark = queries.sparkSession
    stats = load_sq_stats(spark, path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    tomb = mio.join(path, "tombstones")
    if mio.is_dir(tomb):
        codes = codes.join(
            spark.read.parquet(tomb), "doc_id", "left_anti"
        )
    return ann_sq_topk(
        queries,
        corpus,
        k=k,
        refine=refine,
        query_id=query_id,
        query_vec=query_vec,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        round_to=round_to,
        stats=stats,
        codes=codes,
    )
