"""Edge-semantics tests for the temporal/analytics operators.

Oracle parity at testdata scale is covered by ``test_parity.py``;
these tests pin the boundary behaviors the synthetic data may never
exercise: as-of inclusivity and NULL-fill, band-gap boundaries in
the banded pair join, and the sketch accuracy bound.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.temporal import asof_join, banded_pairs
from inside_vectordb_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "l0"), (1, _ts(10), "l10"), (1, _ts(20), "l20"), (2, _ts(5), "l5")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "r10"), (1, _ts(15), "r15"), (3, _ts(0), "r0")],
        "k int, ts timestamp, rv string",
    )
    out = {
        r["lv"]: (r["asof_ts"], r["asof_rv"])
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    assert out["l0"] == (None, None)  # no right row at-or-before → NULL (left join)
    assert out["l10"] == (_ts(10), "r10")  # equal ts is INCLUSIVE
    assert out["l20"] == (_ts(15), "r15")  # latest prior wins
    assert out["l5"] == (None, None)  # key with no right rows at all


def test_asof_join_non_identifier_column_names(spark):
    """Review r7: names with dashes/dots/spaces (BEIR keeps
    'corpus-id' verbatim) must survive the struct pack/unpack — the
    old DDL-string cast and F.col refs mis-parsed them."""
    left = spark.createDataFrame(
        [(1, 10, "L1"), (2, 3, "L2")],
        "`corpus-id` long, ts long, `left val` string",
    )
    right = spark.createDataFrame(
        [(1, 5, 7.5)], "`corpus-id` long, ts long, `px.rate` double"
    )
    out = sorted(
        asof_join(left, right, "corpus-id", "ts", ["px.rate"]).collect()
    )
    assert out[0]["left val"] == "L1" and out[0]["asof_px.rate"] == 7.5
    assert out[1]["asof_px.rate"] is None


def test_asof_join_null_timestamps_never_match(spark):
    """Review r8: a NULL-ts right row sorted NULLS-FIRST used to sit
    at the head of every key partition and become the running match
    for EVERY left row. DuckDB/kdb ASOF semantics: NULL ts never
    matches — on either side."""
    left = spark.createDataFrame(
        [(1, _ts(10), "l10"), (1, None, "lnull")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "rnull"), (1, _ts(5), "r5")],
        "k int, ts timestamp, rv string",
    )
    out = {
        r["lv"]: (r["asof_ts"], r["asof_rv"])
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    assert out["l10"] == (_ts(5), "r5")  # the NULL right row is invisible
    assert out["lnull"] == (None, None)  # NULL left ts matches nothing
    # and a key whose ONLY right rows are NULL-ts yields pure NULLs
    r2 = spark.createDataFrame([(1, None, "rn")], "k int, ts timestamp, rv string")
    got = asof_join(left, r2, "k", "ts", ["rv"]).collect()
    assert all(r["asof_rv"] is None for r in got) and len(got) == 2


def test_asof_join_keeps_all_left_rows(spark):
    res = QUERIES["events_asof_join"](spark, SF_DIR)
    ev = eio.load_table(spark, SF_DIR, "events")
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    assert res.count() == n_clicks
    assert res.select("event_id").distinct().count() == n_clicks


def test_banded_pairs_boundaries(spark):
    band = 10
    events = spark.createDataFrame(
        [
            (1, 100, _ts(0.0)),
            (1, 101, _ts(10.0)),   # gap == band → included (inclusive)
            (1, 102, _ts(20.5)),   # gap 10.5 from 101 → excluded
            (2, 200, _ts(3.0)),
            (2, 201, _ts(3.0)),    # equal ts → excluded (strictly later)
        ],
        "user_id int, event_id int, ts timestamp",
    )
    rows = banded_pairs(events, "user_id", "ts", "event_id", band_sec=band).collect()
    pairs = {(r["event_id_a"], r["event_id_b"]): r["gap_sec"] for r in rows}
    assert pairs == {(100, 101): 10.0}


def test_banded_pairs_no_duplicates_across_branches(spark):
    # Pairs straddling a bin boundary must appear exactly once.
    events = spark.createDataFrame(
        [(1, i, _ts(t)) for i, t in enumerate([9.5, 10.5, 19.5, 21.0])],
        "user_id int, event_id int, ts timestamp",
    )
    rows = banded_pairs(events, "user_id", "ts", "event_id", band_sec=10).collect()
    keys = [(r["event_id_a"], r["event_id_b"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert set(keys) == {(0, 1), (0, 2), (1, 2), (2, 3)}


def test_user_sketch_within_tolerance(spark):
    res = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["events_user_sketch"](spark, SF_DIR).collect()
    }
    ev = eio.load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(res) == set(exact)
    for k, est in res.items():
        assert est == pytest.approx(exact[k], rel=0.05), (k, est, exact[k])


def test_approx_percentiles_close_to_exact(spark):
    approx = QUERIES["doc_length_percentiles_approx"](spark, SF_DIR).collect()[0]
    exact = QUERIES["doc_length_percentiles"](spark, SF_DIR).collect()[0]
    for name in ["p25", "p50", "p75", "p95"]:
        assert approx[name] == pytest.approx(exact[name], rel=0.05), name


def test_sketch_accuracy_envelope(spark):
    """The r12 driver envelope that oracle-backs the two sketch rows:
    10 rows (4 percentiles + per-type and ALL HLL), every within_tol
    true, and the exact values agree with the exact twins already
    tested above."""
    rows = QUERIES["sketch_accuracy_envelope"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["within_tol"] for r in rows), rows
    subj = {r["subject"] for r in rows}
    assert subj == {"doc_length_percentile", "hll_distinct_users"}
    exact_p = QUERIES["doc_length_percentiles"](spark, SF_DIR).collect()[0]
    env_p = {
        r["key"]: r["exact_value"]
        for r in rows
        if r["subject"] == "doc_length_percentile"
    }
    for name in ["p25", "p50", "p75", "p95"]:
        assert env_p[name] == pytest.approx(exact_p[name], abs=1e-6), name
