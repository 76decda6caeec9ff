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


# Rows rotated into the round-5 window: never driver-checked before
# (except q12_priority_shipments, whose last driver row is a stale
# r02 FAIL being cleared). They stay pinned here until a CORRECTNESS
# file proves them green.
ROTATED_IN_R5 = {
    "q12_priority_shipments",
    "ann_signlsh_upsert_topk", "ann_signlsh_deleted", "tfidf_topk",
    "tfidf_topk_indexed", "bm25_topk_indexed", "hybrid_rrf3_topk",
    "hybrid_serving_topk", "lineitem_correlations",
    "lm_perplexity_scores", "simhash_near_duplicates",
    "snapshot_stream_merge", "hard_negatives", "training_triples",
    "cluster_safe_split", "token_budget_select", "curriculum_stages",
    "corpus_datasheet", "ann_ivf_det_topk_indexed", "ann_ivf_det_sweep",
    "bm25_upsert_topk_indexed",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q11_important_stock", "q15_top_supplier",
    "q16_supplier_part_variety", "q17_small_quantity_revenue",
    "q19_discounted_revenue", "q20_promo_part_suppliers",
    "events_sessionized_stream", "events_user_totals_stream",
    "dedup_exact_stream", "events_click_purchase_stream",
    "partitioned_layout_roundtrip", "zorder_layout_roundtrip",
    "image_features",
    "ann_pq_det_topk_indexed", "method_comparison", "comparison_extrema",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R5 - window
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
