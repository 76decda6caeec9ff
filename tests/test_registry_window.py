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

# Rows-only entries allowed inside the window. The round-8 window
# deliberately rotates in the 12 never-driver-checked stochastic/
# sketch tiers (their quality envelopes are driver-proven as DATA via
# ann_stochastic_recall_floor / ann_recall_vs_exact, both pass(r6);
# the rows-only driver row proves run-health) so that after this
# round every registered query has at least one driver observation.
NO_ORACLE_OK: set[str] = {
    "ann_knob_sweep", "ann_lsh_topk_indexed", "ann_ivf_topk_indexed",
    "ann_ivf_upsert_topk", "ann_hnsw_vendored", "ann_brp_topk",
    "ann_pq_topk", "ann_pq_topk_indexed", "ann_ivfpq_topk_indexed",
    "method_speedups", "events_user_sketch",
    "doc_length_percentiles_approx",
}

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


# Rows rotated into the round-8 window: the LAST 19 never-driver-
# checked queries, the 20 stalest standing proofs (all 16
# r1/r2-last-observed rows + 4 of the oldest r3 rows), and the
# round-8-new ann_ivf_hash_topk. They stay pinned here until a
# CORRECTNESS file proves them green.
ROTATED_IN_R8 = {
    # never driver-checked (19)
    "doc_chunks", "bpe_pair_counts", "bpe_vocab", "bpe_encoded_tokens",
    "orc_roundtrip", "events_moving_avg", "price_histogram_equiwidth",
    "ann_knob_sweep", "ann_lsh_topk_indexed", "ann_ivf_topk_indexed",
    "ann_ivf_upsert_topk", "ann_hnsw_vendored", "ann_brp_topk",
    "ann_pq_topk", "ann_pq_topk_indexed", "ann_ivfpq_topk_indexed",
    "method_speedups", "events_user_sketch",
    "doc_length_percentiles_approx",
    # stale backfill (17) + the four round-8-new queries
    "doc_fingerprints", "quality_scores", "token_counts",
    "events_hourly", "events_sessionized", "minhash_candidate_pairs",
    "minhash_signatures", "q1_pricing_summary", "q3_top_revenue_orders",
    "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
    "q10_returned_items", "q13_customer_distribution",
    "q14_promo_revenue", "q22_global_sales_opportunity",
    "jsonl_roundtrip", "ann_ivf_hash_topk", "similarity_join_topk",
    "similarity_join_filtered", "similarity_join_ivf_filtered",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R8 - window
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
