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

# Rows-only entries allowed inside the window (the standing rows-only
# rotation policy: stochastic tiers whose QUALITY is already bounded
# by a driver-green oracle envelope may take a slot for their
# staleness refresh). Round 12 rotates in ann_ivf_topk (an arm of
# ann_stochastic_recall_floor, green r11), so its rows-only
# observation only re-proves run-and-schema, not quality — which
# is already covered; ann_lsh_topk (same coverage) deferred to
# make room for the changed-shape heuristic envelope refresh.
NO_ORACLE_OK: set[str] = {"ann_ivf_topk"}

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


# Rows rotated into the round-12 window by observation age: 37 of
# the 39 r6-last-observed rows (embedding_near_duplicates_lsh defers —
# the new recall envelope executes its blocking path with a
# hash-checked bound, strictly stronger than a rows-only slot;
# ann_lsh_topk defers for the changed-shape heuristic refresh), plus
# the queries NEW this round (first observation). They stay pinned
# here until CORRECTNESS_r12 proves them green.
ROTATED_IN_R12 = {
    # last observed r6 (37 of 39)
    "ann_ivf_det_topk", "ann_ivf_det_upsert_topk", "ann_ivf_topk",
    "ann_ivfpq_det_topk", "ann_ivfpq_det_topk_indexed",
    "ann_pq_det_refine_sweep", "ann_pq_det_topk",
    "ann_pq_det_topk_deleted", "ann_pq_det_upsert_topk",
    "ann_recall_vs_exact", "ann_signlsh_stream_upsert", "ann_sq_topk",
    "bm25_rm3_topk", "corpus_curation_clustered",
    "corpus_distinct_ngrams", "decontamination_bloom", "dsir_select",
    "embedding_column_stats", "embedding_near_duplicates_det",
    "events_cohort_retention", "events_funnel", "events_stream_enriched",
    "events_user_distinct", "events_user_journey", "events_value_zscore",
    "label_centroids", "lineitem_correlations", "method_candidate_costs",
    "minhash_stream_pairs", "quality_percentile_gate", "range_search",
    "repetition_stats", "semantic_dedup", "source_term_kl",
    "temperature_mixture", "weighted_sample", "zipf_fit",
    # changed output this round (1 -> 2 arms: the clustered
    # strict-win arm joined) — fresh observation per the standing
    # changed-shape policy; it displaced ann_lsh_topk (rows-only,
    # quality already envelope-covered, deferred with
    # embedding_near_duplicates_lsh)
    "ann_hnsw_heuristic_recall",
    # new this round
    "sketch_accuracy_envelope", "embedding_near_duplicates_lsh_recall",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R12 - window
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
