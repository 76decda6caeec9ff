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

# Rows-only entries allowed inside the window. Empty since the
# sign-LSH tier replaced the np.random LSH row: every window entry is
# now oracle-backed.
NO_ORACLE_OK: set[str] = set()

# One representative per §2 tier that MUST sit inside the window.
# Round 4 rotated the window (judge's top ask): the tier anchors
# below stay checked every round; the specific extra rows rotate to
# spend the 50-row budget on never-driver-checked queries.
MUST_COVER = {
    "flagship_topk",            # J5 flagship
    "topk_gemm",                # J5/T1 scale twin
    "ann_hnsw_partitioned",     # T3
    "recall_at_k",              # A5
    "precision_at_k",           # A6
    "mrr",                      # A7
    "text_embeddings",          # F4
    "beir_roundtrip",           # S2 composite (exercises S3-S6 paths)
    "ann_signlsh_topk_indexed", # S9/X1 (persisted sign-LSH, full oracle)
    "ann_sq_topk_indexed",      # S10/X2 (persisted FAISS-analogue, full oracle)
    "ann_signlsh_sweep",        # X3/B3 knob sweep (promoted round 4)
    "dedup_exact",              # exact dedup
    "minhash_near_duplicates",  # MinHash+LSH
    "near_dup_clusters",        # connected components
    "lang_id",                  # text analysis
    "corpus_curation",
    "sequence_packing",
    "bm25_topk",                # lexical retrieval
    "kmeans_lloyd",             # clustering
    "snapshot_change_feed",     # lakehouse lifecycle
    "incremental_view_refresh", # IVM
    "events_asof_join",         # temporal analytics
    "events_hourly_stream",     # streaming
    "multimodal_manifest",      # multimodal
}


# Rows that must have never appeared in a prior round's driver window
# stay listed here until a CORRECTNESS file proves them green — the
# rotation's whole point is spending slots on the unchecked surface.
ROTATED_IN_R4 = {
    "ann_signlsh_multiprobe", "ann_signlsh_sweep", "ann_signlsh_bits10",
    "ann_signlsh_filtered", "ann_sq_topk_deleted", "ann_binary_topk",
    "index_stats", "bm25_topk", "hybrid_rrf_topk", "mmr_diversified_topk",
    "late_interaction_topk", "rerank_cross_encoder", "chunked_retrieval",
    "kmeans_lloyd", "near_dup_clusters", "span_dedup",
    "decontamination_ngram", "decontamination_fuzzy",
    "winnowing_fingerprints", "corpus_merge_upsert",
    "snapshot_time_travel", "snapshot_change_feed",
    "incremental_view_refresh", "heavy_hitters_cms",
    "price_histogram_equidepth", "q2_min_cost_supplier",
    "q18_large_volume_customer", "q21_waiting_suppliers",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R4 - window
    assert not missing, f"rotation rows fell out of the window: {missing}"


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
