"""Round-11 adversarial review pins (VERDICT r10 advisory findings).

Findings fixed this round:
- HIGH: incremental compact of a FULLY-tombstoned shard wrote a
  generation dir with no part=p data; _read_graph resolved the whole
  rel dir (UNABLE_TO_INFER_SCHEMA when every dirty shard was empty)
  or fell back over absent pairs, permanently breaking later
  upserts/compacts. _read_graph now resolves per-(rel, part) and
  skips absent pairs — the same guard the indexed search always had.
- LOW: load_latest_reports picked max-by-mtime with arbitrary glob
  order on ties; now tie-broken on the filename's embedded stamp.
- LOW: _corpus_keyed_path hashed only each vector's FIRST component;
  corpora identical in ids + first components collided onto one index
  dir. The key now folds in the last component and the squared norm.
- LOW: run_to_memory's failure path leaked the memory-sink view when
  q.stop() raised, and a dropTempView failure masked the original
  exception. Cleanup steps are now individually suppressed.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

import inside_vectordb_spark.io as eio
from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.operators.hnsw_index import (
    _part_expr,
    ann_hnsw_topk_indexed,
    build_hnsw_index,
    compact_hnsw_index,
    delete_from_hnsw_index,
    upsert_hnsw_index,
)
from tests.conftest import SF_DIR

DIM = 64
N_PARTS = 4
M = 16
EFC = 100
K = 10
EF = 128


def _corpus(spark):
    return eio.load_table(spark, SF_DIR, "embeddings")


def _queries(spark):
    return eio.query_vectors(spark, SF_DIR)


def _sorted(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def _routed_ids(spark) -> dict[int, list[int]]:
    pdf = (
        _corpus(spark)
        .select("vec_id", _part_expr("vec_id", N_PARTS).alias("part"))
        .toPandas()
    )
    return {p: sorted(g["vec_id"]) for p, g in pdf.groupby("part")}


def test_incremental_compact_of_fully_tombstoned_shard(spark, tmp_path):
    """The r10-advisory HIGH repro: delete ALL ids of one partition,
    incremental-compact it away, then prove the index stays fully
    operable — search, another compact, an upsert that repopulates
    the emptied partition, and a final full compact all succeed and
    agree with a fresh-build twin."""
    art = str(tmp_path / "full_tomb")
    corpus = _corpus(spark)
    build_hnsw_index(
        corpus, art, dim=DIM, m=M, ef_construction=EFC, n_parts=N_PARTS, seed=42
    )
    by_part = _routed_ids(spark)
    dead = by_part[1]  # every id routed to partition 1
    delete_from_hnsw_index(spark, art, dead)

    pre = _sorted(ann_hnsw_topk_indexed(spark, _queries(spark), art, k=K, ef_search=EF))
    assert not set(pre["doc_id"]) & set(dead)

    # partition 1 is 100% dead -> rebuilds to ZERO rows
    meta = compact_hnsw_index(spark, art, min_dead_fraction=0.5)
    assert meta["part_rels"].keys() == {"1"}
    assert meta["part_counts"]["1"] == 0
    rel1 = meta["part_rels"]["1"]
    assert not mio.is_dir(os.path.join(art, rel1, "part=1")), (
        "a zero-row rebuild must leave no part=1 data for readers to trip on"
    )

    # search unchanged after the physical fold
    post = _sorted(ann_hnsw_topk_indexed(spark, _queries(spark), art, k=K, ef_search=EF))
    pd.testing.assert_frame_equal(pre, post)

    # the advisory's breakage: compact again (both modes' _read_graph
    # path) and upsert again must NOT raise UNABLE_TO_INFER_SCHEMA
    compact_hnsw_index(spark, art, min_dead_fraction=0.5)  # no-op, no tomb
    re_add = corpus.filter(F.col("vec_id").isin(dead[: max(2, len(dead) // 2)]))
    upsert_hnsw_index(spark, re_add, art)
    re_ids = {r["vec_id"] for r in re_add.select("vec_id").collect()}
    # search must serve immediately after repopulating the emptied shard
    _sorted(ann_hnsw_topk_indexed(spark, _queries(spark), art, k=K, ef_search=EF))
    # full compact folds to canonical form == fresh build over live rows
    compact_hnsw_index(spark, art)
    live = corpus.filter(
        ~F.col("vec_id").isin([i for i in dead if i not in re_ids])
    )
    twin = str(tmp_path / "full_tomb_twin")
    build_hnsw_index(
        live, twin, dim=DIM, m=M, ef_construction=EFC, n_parts=N_PARTS, seed=42
    )
    a = _sorted(ann_hnsw_topk_indexed(spark, _queries(spark), art, k=K, ef_search=EF))
    b = _sorted(ann_hnsw_topk_indexed(spark, _queries(spark), twin, k=K, ef_search=EF))
    pd.testing.assert_frame_equal(a, b)


def test_incremental_compact_refuses_fully_empty_index(spark, tmp_path):
    """Tombstoning EVERY row and incremental-compacting every shard
    must refuse (same contract as the full rebuild) instead of leaving
    an index with zero physical rows that _read_graph can't open."""
    art = str(tmp_path / "all_dead")
    corpus = _corpus(spark)
    build_hnsw_index(
        corpus, art, dim=DIM, m=M, ef_construction=EFC, n_parts=N_PARTS, seed=42
    )
    all_ids = [r["vec_id"] for r in corpus.select("vec_id").collect()]
    delete_from_hnsw_index(spark, art, all_ids)
    with pytest.raises(ValueError, match="EMPTY"):
        compact_hnsw_index(spark, art, min_dead_fraction=0.0)


def test_latest_report_mtime_tie_breaks_on_stamp(spark, tmp_path):
    """Two reports with IDENTICAL mtimes must resolve to the one with
    the newer embedded stamp, regardless of glob order."""
    from inside_vectordb_spark.sources.reports import (
        load_latest_reports,
        save_metrics_report,
    )

    rep_dir = str(tmp_path / "reports")
    p_old = save_metrics_report(
        "exact", {"recall@10": -1.0}, rep_dir, stamp="20240101_000000"
    )
    p_new = save_metrics_report(
        "exact", {"recall@10": 0.9}, rep_dir, stamp="20240102_000000"
    )
    # force an exact mtime tie (the coarse-filesystem scenario)
    t = os.path.getmtime(p_old)
    os.utime(p_old, (t, t))
    os.utime(p_new, (t, t))
    back = load_latest_reports(rep_dir)
    assert back["exact"]["metrics"] == {"recall@10": 0.9}


def test_corpus_key_sees_beyond_first_component(spark):
    """Two corpora with identical ids and identical FIRST components
    but different later dimensions must key to distinct index dirs."""
    from inside_vectordb_spark.operators.similarity import _corpus_keyed_path

    a = spark.createDataFrame(
        [(1, [0.5, 0.1, 0.2]), (2, [0.3, 0.4, 0.5])],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(1, [0.5, 0.9, 0.2]), (2, [0.3, 0.4, 0.7])],
        "vec_id long, embedding array<float>",
    )
    ka = _corpus_keyed_path(a, "vec_id", "embedding", "signlsh")
    kb = _corpus_keyed_path(b, "vec_id", "embedding", "signlsh")
    assert ka != kb
    # determinism: same corpus, same key
    assert ka == _corpus_keyed_path(a, "vec_id", "embedding", "signlsh")


def test_run_to_memory_failure_cleanup_survives_stop_raising(spark, monkeypatch):
    """When the drain times out AND q.stop() raises, the memory-sink
    view must still be dropped and the ORIGINAL TimeoutError (not the
    stop error) must propagate."""
    from pyspark.sql.streaming import query as sq

    from inside_vectordb_spark.streaming import read_events_stream
    from inside_vectordb_spark.streaming.events import hourly_stream, run_to_memory

    views_before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    monkeypatch.setattr(
        sq.StreamingQuery, "awaitTermination", lambda self, timeout=None: False
    )

    def _boom(self):
        raise RuntimeError("stop failed")

    monkeypatch.setattr(sq.StreamingQuery, "stop", _boom)
    stream = hourly_stream(read_events_stream(spark, SF_DIR))
    with pytest.raises(TimeoutError):
        run_to_memory(stream, timeout_sec=1)
    views_after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    leaked = {v for v in views_after - views_before if v.startswith("stream_")}
    assert not leaked, f"memory-sink view leaked on failure: {leaked}"
    # let the real (unpatched) stop run so the background query ends
    monkeypatch.undo()
    for q in spark.streams.active:
        q.stop()


def test_bench_counter_fingerprint_and_best_total(tmp_path, monkeypatch):
    """bench.py's same-code evidence (r10 verdict #1): the counter
    fingerprint hashes only STABLE-envelope queries (a documented-
    variance query can't split it), and min_total_over_runs returns
    the best committed same-code/same-sf total."""
    import json

    import bench

    monkeypatch.chdir(tmp_path)
    baseline = {
        "queries": {
            "stable_q": {"rows_read": [10, 10], "shuffle_bytes": [5, 5]},
            "unstable_q": {"rows_read": [10, 20], "shuffle_bytes": [5, 5]},
        }
    }
    json.dump(baseline, open(tmp_path / "counters_baseline.json", "w"))
    spreads_a = {
        "stable_q": {"work": {"rows_read": 10, "shuffle_bytes": 5}},
        "unstable_q": {"work": {"rows_read": 13, "shuffle_bytes": 5}},
    }
    spreads_b = {
        "stable_q": {"work": {"rows_read": 10, "shuffle_bytes": 5}},
        "unstable_q": {"work": {"rows_read": 19, "shuffle_bytes": 5}},
    }
    fa, fb = bench._counter_fingerprint(spreads_a), bench._counter_fingerprint(spreads_b)
    assert fa == fb, "unstable-query drift must not split the fingerprint"
    spreads_c = {
        "stable_q": {"work": {"rows_read": 11, "shuffle_bytes": 5}},
    }
    assert bench._counter_fingerprint(spreads_c) != fa

    os.makedirs(tmp_path / "reports", exist_ok=True)
    for i, (tot, fp, sf) in enumerate(
        [(90.0, fa, 0.1), (120.0, fa, 0.1), (50.0, "other", 0.1), (40.0, fa, 0.01)]
    ):
        json.dump(
            {"total_sec": tot, "median_total_sec": tot + 5,
             "counter_fingerprint": fp, "sf": sf},
            open(tmp_path / "reports" / f"spark_headline_r{i}.json", "w"),
        )
    result = {"value": 110.0, "median_total_sec": 115.0, "sf": 0.1}
    best = bench._min_total_over_runs(fa, result)
    # picks 90.0 (same fp, same sf); ignores the 50.0 (other code) and
    # the 40.0 (other sf); counts this run plus the two matches
    assert best == {
        "total_sec": 90.0, "median_total_sec": 95.0, "n_same_code_runs": 3
    }
    # no fingerprint -> this run is its own best
    assert bench._min_total_over_runs(None, result)["n_same_code_runs"] == 1
