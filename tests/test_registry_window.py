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
# rotated the 12 never-driver-checked stochastic/sketch tiers through
# their first (and green) driver observation; the round-9 window is
# fully oracle-backed except queries NEW this round whose semantics
# are inherently order-dependent (graph-build tiers).
NO_ORACLE_OK: set[str] = {
    # HNSW graph builds are insertion-order dependent (hnswlib too);
    # stored==fresh / load-then-add parity / compacted==rebuild /
    # recall floor are pinned in tests/test_hnsw_index.py
    "ann_hnsw_vendored_indexed",
    "ann_hnsw_vendored_lifecycle",
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


# Rows rotated into the round-9 window: the observation-age policy's
# first execution — all 27 rows whose last driver observation was r3,
# plus 7 of the 40-row r4 cohort (the verdict-named priorities
# first; new-query slots displaced the rest). They stay pinned here until CORRECTNESS_r09 proves them
# green.
ROTATED_IN_R9 = {
    # last observed r3 (all 27)
    "avg_relevant_per_query", "corpus_subset", "decontamination",
    "doc_concat", "doc_json", "doc_truncate", "docs_without_judgments",
    "embedding_near_duplicates", "embeddings_parquet_roundtrip",
    "head_n_docs", "ids_except", "ids_intersect", "layer_histogram",
    "missing_relevant_check", "mixture_sample",
    "ngram_jaccard_neighbors", "order_date_format", "pii_redaction",
    "qrels_tsv_roundtrip", "queries_with_judgments", "ranked_lists",
    "relevance_histogram", "results_enriched", "seeded_sample",
    "simhash_signatures", "table_counts", "top_lineitems",
    # oldest r4 (7 of 40)
    "search_hits", "precision_at_k", "mrr", "evaluation_report",
    "text_embeddings", "qrels_table", "bm25_topk",
    # new this round
    "ann_hnsw_vendored_indexed", "ann_hnsw_vendored_lifecycle",
    "ann_signlsh_compacted", "bm25_compacted_topk", "ann_mrl_sq_topk",
    "ann_mrl_compacted_topk",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R9 - window
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
