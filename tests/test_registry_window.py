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

# Rows-only entries allowed inside the window. Round 6 cleared the
# three stale-FAIL stochastic tiers (ann_lsh_topk, ann_ivf_topk,
# embedding_near_duplicates_lsh — all rows-only-green in r6), so the
# round-7 window is 100% oracle-backed.
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


# Rows rotated into the round-7 window: never driver-checked before
# (the round-6 window came back 50/50 green, so all its rotation rows
# moved past the prefix). They stay pinned here until a CORRECTNESS
# file proves them green.
ROTATED_IN_R7 = {
    "ann_ivf_km_topk", "ann_ivf_km_topk_indexed",
    "ann_ivf_km_upsert_topk", "ann_mrl_topk", "ann_mrl_topk_indexed",
    "ann_mrl_sweep", "ann_mrl_upsert_topk",
    "decontamination_semantic", "ndcg_at_k", "winnowing_candidates",
    "hybrid_linear_topk", "source_quota_cap", "perplexity_buckets",
    "embedding_norms_pandas_udf", "label_mean_norm_pandas_udf",
    "doc_chunks_udtf", "jsonl_pyds_roundtrip",
    "bucketed_join_roundtrip", "compaction_roundtrip",
    "dataset_split", "doc_length_percentiles", "events_cooccurrence",
    "events_hourly_stream_sink", "events_sliding_window",
    "events_time_rollup", "events_value_winsorized", "filtered_topk",
    "length_bucketed_batches", "lineitem_column_stats",
    "media_chunks", "nearest_centroid_assign",
    "schema_evolution_roundtrip", "skewed_join_salted",
    "stratified_sample", "snapshot_vacuum", "text_normalize",
    "text_search_e2e", "audio_features", "video_frame_sample",
    "vocab_top_terms",
}


def test_rotated_rows_in_window():
    window = set(list(e.queries())[:WINDOW])
    missing = ROTATED_IN_R7 - window
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
