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
MUST_COVER = {
    "flagship_topk",            # J5 flagship
    "ann_hnsw_partitioned",     # T3
    "recall_at_k",              # A5
    "text_embeddings",          # F4
    "jsonl_roundtrip",          # S3/S6
    "qrels_tsv_roundtrip",      # S5
    "embeddings_parquet_roundtrip",  # S7/S8
    "beir_roundtrip",           # S2
    "ann_signlsh_topk_indexed", # S9/X1 (persisted sign-LSH, full oracle)
    "ann_sq_topk_indexed",      # S10/X2 (persisted FAISS-analogue, full oracle)
    "dedup_exact",              # exact dedup
    "minhash_near_duplicates",  # MinHash+LSH
    "simhash_signatures",       # SimHash
    "embedding_near_duplicates",
    "lang_id",
    "pii_redaction",
    "decontamination",
    "corpus_curation",
    "sequence_packing",
    "mixture_sample",
    "events_asof_join",         # temporal analytics
    "events_hourly_stream",     # streaming
    "multimodal_manifest",      # multimodal
}


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
