"""Pin the driver-window composition.

The external correctness gate checks the first 50 entries of
``queries()``; these tests guarantee that prefix covers every
SURVEY.md §2 operator tier and stays oracle-backed wherever possible,
so a registry refactor can't silently push an operator out of the
checked window again (the round-2 failure mode).
"""

from __future__ import annotations

import __spark_entry__ as e
from inside_vectordb_spark.registry import ORACLES, QUERIES

WINDOW = 50

# Rows-only entries allowed inside the window. The round-10 window is
# 100% oracle-backed: the r9 graph tier's two rows-only entries
# (ann_hnsw_vendored_indexed/_lifecycle) rotated out after their green
# first observation, and the graph tier's quality envelope re-enters
# as hash-checkable rows (ann_hnsw_recall_vs_exact,
# ann_hnsw_lifecycle_invariants, ann_hnsw_partial_compact_invariants).
NO_ORACLE_OK: set[str] = set()

# One representative per §2 tier that MUST sit inside the window
# every round (reproducible multi-round anchors). Round 5 shrank the
# sentinel set from 22 to 10 (judge's ask) to spend 40 slots on
# never-driver-checked queries; everything rotated out remains
# registered, oracle-backed, and covered by check_gate --all.
MUST_COVER = {
    "flagship_topk",            # J5 flagship
    "recall_at_k",              # A5-A7 metric chain
    "beir_roundtrip",           # S2 composite (exercises S3-S6 paths)
    "ann_signlsh_topk_indexed", # S9/X1 (persisted sign-LSH, full oracle)
    "ann_sq_topk_indexed",      # S10/X2 (persisted FAISS-analogue)
    "dedup_exact",              # exact dedup
    "minhash_near_duplicates",  # MinHash+LSH
    "corpus_curation",          # curation DAG
    "events_asof_join",         # temporal analytics
    "events_hourly_stream",     # streaming
}


# Rows rotated into the round-10 window by observation age: the full
# 33-row r4-last-observed cohort, the 3 oldest r5 rows (registration
# order), and the queries NEW this round (first observation). They
# stay pinned here until CORRECTNESS_r10 proves them green.
ROTATED_IN_R10 = {
    # last observed r4 (all 33)
    "ann_binary_topk", "ann_hnsw_partitioned", "ann_signlsh_bits10",
    "ann_signlsh_filtered", "ann_signlsh_multiprobe",
    "ann_signlsh_sweep", "ann_sq_topk_deleted", "chunked_retrieval",
    "corpus_merge_upsert", "decontamination_fuzzy",
    "decontamination_ngram", "heavy_hitters_cms", "hybrid_rrf_topk",
    "incremental_view_refresh", "index_stats", "kmeans_lloyd",
    "lang_id", "late_interaction_topk", "mmr_diversified_topk",
    "multimodal_manifest", "near_dup_clusters",
    "price_histogram_equidepth", "q18_large_volume_customer",
    "q21_waiting_suppliers", "q2_min_cost_supplier",
    "rerank_cross_encoder", "sequence_packing", "snapshot_change_feed",
    "snapshot_time_travel", "span_dedup", "topk_gemm",
    "winnowing_fingerprints", "word_stats",
    # oldest r5 (2 of 39)
    "ann_ivf_det_sweep", "ann_ivf_det_topk_indexed",
    # new this round
    "ann_hnsw_recall_vs_exact", "ann_hnsw_lifecycle_invariants",
    "ann_hnsw_partial_compact_invariants", "similarity_join_hnsw",
    "report_roundtrip",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R10 - window
    assert not missing, f"rotation rows fell out of the window: {missing}"


def test_union_driver_coverage_complete():
    """After the r8 window, every registered query has at least one
    driver observation: (names ever seen in CORRECTNESS files) ∪
    (this window) must cover the whole registry."""
    import glob
    import json

    seen: set[str] = set(list(e.queries())[:WINDOW])
    for f in glob.glob("CORRECTNESS_r*.json"):
        try:
            seen |= set(json.load(open(f)))
        except Exception:
            pass
    missing = set(QUERIES) - seen
    assert not missing, f"queries with no driver observation: {missing}"


def test_priority_names_exist():
    missing = [n for n in e.WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"WINDOW_PRIORITY names not registered: {missing}"


def test_window_prefix_is_priority_list():
    names = list(e.queries())
    assert names[: len(e.WINDOW_PRIORITY)] == e.WINDOW_PRIORITY
    # no entries lost or duplicated by the reordering
    assert sorted(names) == sorted(QUERIES)
    assert len(e.WINDOW_PRIORITY) <= WINDOW


def test_window_covers_every_tier():
    window = set(list(e.queries())[:WINDOW])
    missing = MUST_COVER - window
    assert not missing, f"§2 operators outside the driver window: {missing}"


def test_window_is_oracle_backed():
    window = list(e.queries())[:WINDOW]
    bare = [n for n in window if n not in ORACLES and n not in NO_ORACLE_OK]
    assert not bare, f"window entries without an oracle: {bare}"


def test_oracle_ordering_matches_queries():
    qnames = [n for n in e.queries() if n in ORACLES]
    assert qnames == list(e.oracle_sql())


def test_bench_headline_names_are_registered():
    """bench.py's HEADLINE list must reference real registry entries —
    a renamed query would otherwise fail only at bench time (after the
    round's correctness run, too late)."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE names not registered: {missing}"
