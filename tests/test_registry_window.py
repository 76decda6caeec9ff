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


# Rows rotated into the round-11 window by observation age: the full
# 37-row r5-last-observed cohort plus r6 fill rows (the stochastic
# rows-only embedding_near_duplicates_lsh skipped for its det twin so
# the window stays 100% oracle-backed), and the queries NEW this
# round (first observation). They stay pinned here until
# CORRECTNESS_r11 proves them green.
ROTATED_IN_R11 = {
    # last observed r5 (all 37)
    "q12_priority_shipments", "q7_volume_shipping", "q8_market_share",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q15_top_supplier", "q9_product_profit", "q11_important_stock",
    "q16_supplier_part_variety", "q20_promo_part_suppliers",
    "simhash_near_duplicates", "tfidf_topk", "hybrid_rrf3_topk",
    "lm_perplexity_scores", "cluster_safe_split", "token_budget_select",
    "curriculum_stages", "corpus_datasheet", "bm25_topk_indexed",
    "tfidf_topk_indexed", "hybrid_serving_topk",
    "bm25_upsert_topk_indexed", "ann_signlsh_upsert_topk",
    "ann_signlsh_deleted", "ann_pq_det_topk_indexed", "hard_negatives",
    "training_triples", "partitioned_layout_roundtrip",
    "zorder_layout_roundtrip", "method_comparison", "comparison_extrema",
    "events_sessionized_stream", "events_user_totals_stream",
    "dedup_exact_stream", "events_click_purchase_stream",
    "snapshot_stream_merge", "image_features",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R11 - window
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
