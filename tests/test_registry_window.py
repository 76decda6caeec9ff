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

# Rows-only entries allowed inside the window: the three stochastic
# ANN tiers whose LAST driver observation is a r01/r02 FAIL — rotated
# back in (judge's round-5 ask) to clear those stale records; their
# deterministic twins are oracle-backed and driver-green.
NO_ORACLE_OK: set[str] = {
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_duplicates_lsh",
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


# Rows rotated into the round-6 window: never driver-checked before,
# plus the four last-observation-FAIL records being cleared
# (lineitem_correlations r5 signed-zero, and the three rows-only
# stochastic tiers). They stay pinned here until a CORRECTNESS file
# proves them green.
ROTATED_IN_R6 = {
    "lineitem_correlations",
    "ann_lsh_topk", "ann_ivf_topk", "embedding_near_duplicates_lsh",
    "embedding_near_duplicates_det", "decontamination_bloom",
    "dsir_select", "bm25_rm3_topk", "events_cohort_retention",
    "events_funnel", "corpus_distinct_ngrams", "source_term_kl",
    "minhash_stream_pairs", "zipf_fit", "ann_pq_det_topk",
    "ann_pq_det_upsert_topk", "ann_pq_det_topk_deleted",
    "ann_ivfpq_det_topk", "ann_ivfpq_det_topk_indexed",
    "ann_ivf_det_topk", "ann_ivf_det_upsert_topk", "semantic_dedup",
    "embedding_column_stats", "ann_recall_vs_exact",
    "ann_pq_det_refine_sweep", "ann_signlsh_stream_upsert",
    "method_candidate_costs", "events_user_distinct", "range_search",
    "events_user_journey", "quality_percentile_gate",
    "repetition_stats", "corpus_curation_clustered",
    "temperature_mixture", "ann_stochastic_recall_floor",
    "weighted_sample",
    "events_value_zscore", "events_stream_enriched", "ann_sq_topk",
    "label_centroids",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R6 - window
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
