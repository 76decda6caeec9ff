"""Round-12 adversarial review pins (ADVICE r11 findings).

Findings fixed this round:
- MEDIUM: similarity_join's hnsw route read filter_col as a GLOBAL
  boolean predicate (and skipped self-exclusion) while every other
  route means per-query EQUALITY. The graph route now runs a SINGLE
  grouped filter-during-search pass (query_filter_col +
  corpus_filter_df on ann_hnsw_topk_indexed: the id→value mapping
  rides the partition scan broadcast-side, per-value masks are cut
  inside each task — one graph scan and one kernel reconstruct per
  partition regardless of distinct-value count) with the same
  self-exclusion, so the facade contract is uniform; the raw
  allow-list form stays available via filter_df.
- LOW: run_to_memory progress capture read recentProgress, which
  Spark caps at spark.sql.streaming.numRecentProgressUpdates
  (default 100); a >100-micro-batch drain silently undercounted.
  The drain now pins the retention conf to 10k for its lifetime and
  _progress_dicts hard-fails if the cap is ever reached.
- LOW: bench.py's CALIB_REF floor ratchet ran unconditionally (even
  under SPARK_GRAFT_NO_REPORT) and a single anomalously fast probe
  iteration permanently inflated vs_ref. The ratchet is now gated on
  report-enabled runs and on median-confirmation (median ≤ 1.5×min).
- LOW: ann_brp_topk force-broadcasts the query side (the r10 AQE
  build-side race fix) with nothing bounding the batch; it now
  documents the bounded-serving-batch contract and raises on
  corpus-sized query sets instead of OOMing the broadcast.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import inside_vectordb_spark.io as eio
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# MEDIUM: facade filter_col contract uniform across routes
# ---------------------------------------------------------------------------


def test_facade_hnsw_filter_is_per_query_equality(spark, tmp_path):
    """A non-boolean metadata column (label) must work on the hnsw
    route exactly as on exact/signlsh/ivf_det: each query ranks only
    corpus rows sharing ITS value, self-matches excluded, ranks
    contiguous from 1. Pre-r12 this raised AnalysisException (the
    route tried F.col('label') as a boolean predicate)."""
    from inside_vectordb_spark.operators.similarity import similarity_join

    q = eio.query_vectors(spark, SF_DIR).filter(F.col("query_id") < 8)
    c = eio.load_table(spark, SF_DIR, "embeddings")
    res = similarity_join(
        spark, q, c, k=5, method="hnsw", filter_col="label",
        index_path=str(tmp_path / "hnsw_eq"), ef_search=128,
    ).toPandas()
    clab = {r["vec_id"]: r["label"] for r in c.select("vec_id", "label").collect()}
    qlab = {r["query_id"]: r["label"] for r in q.select("query_id", "label").collect()}
    assert len(res) > 0
    assert all(
        clab[d] == qlab[qi] for qi, d in zip(res["query_id"], res["doc_id"])
    )
    assert not (res["query_id"] == res["doc_id"]).any()
    # ranks re-contiguous after self-exclusion (the k+1 over-fetch)
    for _, grp in res.groupby("query_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_facade_hnsw_filter_all_null_raises(spark, tmp_path):
    """NULL never equals anything (SQL semantics): an all-NULL query
    filter column is a caller error and must fail loudly, not return
    an empty frame that reads as 'no neighbors'."""
    from inside_vectordb_spark.operators.similarity import similarity_join

    q = eio.query_vectors(spark, SF_DIR).limit(4).withColumn(
        "grp", F.lit(None).cast("int")
    )
    c = eio.load_table(spark, SF_DIR, "embeddings").withColumn(
        "grp", F.col("label")
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        similarity_join(
            spark, q, c, k=5, method="hnsw", filter_col="grp",
            index_path=str(tmp_path / "hnsw_null"),
        )


def test_hnsw_grouped_filter_single_pass_matches_loop(spark, tmp_path):
    """The r12 single-pass grouped mode (query_filter_col +
    corpus_filter_df) must return exactly what the per-value
    filter_df loop returns — same masks, one graph scan. Also pins
    STRING filter values (the facade's contract is any equality
    type) and that ids absent from the mapping match nothing."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.hnsw_index import (
        ann_hnsw_topk_indexed,
        ensure_hnsw_index,
    )

    c = eio.load_table(spark, SF_DIR, "embeddings").withColumn(
        "grp", F.concat(F.lit("g"), (F.col("label") % 3).cast("string"))
    )
    q = eio.query_vectors(spark, SF_DIR).filter(F.col("query_id") < 12).withColumn(
        "grp", F.concat(F.lit("g"), (F.col("label") % 3).cast("string"))
    )
    art = str(tmp_path / "grouped")
    ensure_hnsw_index(c, art, dim=64)

    single_df = ann_hnsw_topk_indexed(
        spark, q, art, k=5, ef_search=128,
        query_filter_col="grp",
        corpus_filter_df=c.select("vec_id", "grp"),
    )
    # the single-pass claim, plan-level: the stored graph is scanned
    # once per partition — NOT once per distinct filter value
    import json

    meta = json.load(open(os.path.join(art, "meta.json")))
    plan = single_df._jdf.queryExecution().executedPlan().toString()
    n_graph_scans = plan.count(os.path.basename(art))
    assert n_graph_scans <= meta["n_parts"], (
        f"{n_graph_scans} graph scans for {meta['n_parts']} partitions — "
        "the grouped pass must not fan out per value"
    )
    single = single_df.toPandas()
    loops = []
    for v in ("g0", "g1", "g2"):
        loops.append(
            ann_hnsw_topk_indexed(
                spark, q.filter(F.col("grp") == v), art, k=5, ef_search=128,
                filter_df=c.filter(F.col("grp") == v).select("vec_id"),
            ).toPandas()
        )
    import pandas as pd

    loop = pd.concat(loops, ignore_index=True)
    key = ["query_id", "rank"]
    assert single.sort_values(key).reset_index(drop=True).equals(
        loop.sort_values(key).reset_index(drop=True)
    )

    # ids absent from the mapping match nothing: restrict the mapping
    # to even ids and assert only even docs are served
    partial = ann_hnsw_topk_indexed(
        spark, q, art, k=5, ef_search=128,
        query_filter_col="grp",
        corpus_filter_df=c.filter(F.col("vec_id") % 2 == 0).select(
            "vec_id", "grp"
        ),
    ).toPandas()
    assert len(partial) > 0 and (partial["doc_id"] % 2 == 0).all()

    # a duplicated (id, value) mapping row must not duplicate graph
    # rows (which would misalign the task-side ord→mask index space):
    # results equal the clean-mapping results exactly
    dup = ann_hnsw_topk_indexed(
        spark, q, art, k=5, ef_search=128,
        query_filter_col="grp",
        corpus_filter_df=c.select("vec_id", "grp").unionAll(
            c.select("vec_id", "grp")
        ),
    ).toPandas()
    assert dup.sort_values(key).reset_index(drop=True).equals(
        single.sort_values(key).reset_index(drop=True)
    )

    # the two filter modes are mutually exclusive
    with pytest.raises(ValueError, match="mutually exclusive"):
        ann_hnsw_topk_indexed(
            spark, q, art, k=5,
            filter_df=c.select("vec_id"),
            query_filter_col="grp",
            corpus_filter_df=c.select("vec_id", "grp"),
        )
    # and the grouped pair must be passed together
    with pytest.raises(ValueError, match="together"):
        ann_hnsw_topk_indexed(spark, q, art, k=5, query_filter_col="grp")


# ---------------------------------------------------------------------------
# LOW: progress-retention pin
# ---------------------------------------------------------------------------


def test_run_to_memory_pins_progress_retention(spark, monkeypatch):
    """While a progress-capturing drain runs, the session's
    numRecentProgressUpdates must be raised to the module cap; after
    the drain the prior value is restored."""
    from inside_vectordb_spark.streaming import events as ev

    key = "spark.sql.streaming.numRecentProgressUpdates"
    spark.conf.set(key, "100")
    seen: dict[str, str] = {}
    orig = ev._progress_dicts

    def spy(q):
        seen["during"] = spark.conf.get(key)
        return orig(q)

    monkeypatch.setattr(ev, "_progress_dicts", spy)
    prog: list = []
    docs = ev.read_table_stream(spark, SF_DIR, "documents")
    out = ev.run_to_memory(
        ev.distinct_content_stream(docs), timeout_sec=120, progress=prog
    )
    assert out.count() > 0 and prog
    assert seen["during"] == str(ev._PROGRESS_RETENTION)
    assert spark.conf.get(key) == "100"


def test_progress_dicts_raises_at_retention_cap():
    """A capture that reaches the retention cap means earlier entries
    were evicted — the collector must refuse rather than undercount."""
    from inside_vectordb_spark.streaming import events as ev

    class FakeQuery:
        recentProgress = [{"numInputRows": 1}] * ev._PROGRESS_RETENTION

    with pytest.raises(RuntimeError, match="retention cap"):
        ev._progress_dicts(FakeQuery())


# ---------------------------------------------------------------------------
# LOW: CALIB_REF ratchet guards
# ---------------------------------------------------------------------------


def _run_floor_block(tmp_path, monkeypatch, calib_start, no_report):
    """Execute bench.py's floor-ratchet logic in isolation by
    replaying its exact guard expression against a scratch
    reports/CALIB_REF.json."""
    monkeypatch.chdir(tmp_path)
    if no_report:
        monkeypatch.setenv("SPARK_GRAFT_NO_REPORT", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_NO_REPORT", raising=False)
    ref_p = os.path.join("reports", "CALIB_REF.json")
    try:
        ref = float(json.load(open(ref_p))["min_sec"])
    except (OSError, KeyError, ValueError, TypeError):
        ref = None
    floor = calib_start["min_sec"]
    confirmed = (
        floor
        and calib_start["median_sec"] <= floor * 1.5
        and not os.environ.get("SPARK_GRAFT_NO_REPORT")
    )
    if confirmed and (ref is None or floor < ref):
        os.makedirs("reports", exist_ok=True)
        with open(ref_p, "w") as f:
            json.dump({"min_sec": floor}, f)
    return ref_p


def test_calib_floor_source_matches_test_replica():
    """The replica above must stay in sync with bench.py — assert the
    guard expression appears verbatim in the source."""
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    ).read()
    assert 'calib_start["median_sec"] <= floor * 1.5' in src
    assert 'not os.environ.get("SPARK_GRAFT_NO_REPORT")' in src
    assert "if confirmed and (ref is None or floor < ref):" in src


def test_calib_floor_rejects_outlier_min(tmp_path, monkeypatch):
    """A probe batch whose median sits far off its min (single
    anomalously fast iteration) must NOT lower the committed floor."""
    p = _run_floor_block(
        tmp_path, monkeypatch,
        {"min_sec": 0.05, "median_sec": 0.2}, no_report=False,
    )
    assert not os.path.exists(p)


def test_calib_floor_respects_no_report(tmp_path, monkeypatch):
    """SPARK_GRAFT_NO_REPORT runs must not mutate the committed
    reference even with a clean confirmed probe."""
    p = _run_floor_block(
        tmp_path, monkeypatch,
        {"min_sec": 0.1, "median_sec": 0.11}, no_report=True,
    )
    assert not os.path.exists(p)


def test_calib_floor_accepts_confirmed_min(tmp_path, monkeypatch):
    p = _run_floor_block(
        tmp_path, monkeypatch,
        {"min_sec": 0.1, "median_sec": 0.11}, no_report=False,
    )
    assert json.load(open(p))["min_sec"] == 0.1


# ---------------------------------------------------------------------------
# LOW: brp bounded-batch contract
# ---------------------------------------------------------------------------


def test_ann_brp_topk_rejects_corpus_sized_query_batch(spark, monkeypatch):
    """The force-broadcast build-side pin assumes a bounded serving
    batch; a corpus-sized query set must raise at the API boundary,
    not OOM the broadcast at runtime."""
    from inside_vectordb_spark.operators import ann_mllib

    monkeypatch.setattr(ann_mllib, "_BROADCAST_QUERY_CEILING", 10, raising=False)
    q = eio.load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = eio.load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="broadcasts the query batch"):
        ann_mllib.ann_brp_topk(q, c, k=5)
