"""Comparison pipeline (B4-B6, A9-A10): unit math on synthetic
inputs + end-to-end value assertions on the driver data (the
reference's own acceptance style, ``005:469-503``).
"""

from __future__ import annotations

import pytest

from inside_vectordb_spark.operators.compare import (
    method_comparison,
    normalize_report,
    recall_retention,
    speedup_ratios,
    summary_extrema,
    summary_text,
)
from inside_vectordb_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _long_report(spark, rows):
    return spark.createDataFrame(rows, "metric string, k int, value double")


@pytest.fixture(scope="module")
def cmp_df(spark):
    reports = {
        "exact": _long_report(
            spark, [("recall", 10, 0.8), ("precision", 10, 0.4), ("mrr", None, 0.6)]
        ),
        "lsh": _long_report(
            spark, [("recall", 10, 0.6), ("precision", 10, 0.3), ("mrr", None, 0.5)]
        ),
    }
    return recall_retention(method_comparison(reports), baseline="exact")


# ---- B4 normalization ----------------------------------------------------


def test_normalize_report_shapes():
    nested = {"performance": {"search_latency": 0.7, "qps": 1.4}, "recall@10": 0.81}
    flat = {"search_latency_cpu": 0.5, "mrr": 0.6}
    ours = {"method": "x", "metrics": {"recall@10": 0.74}}
    a, b, c = normalize_report(nested), normalize_report(flat), normalize_report(ours)
    assert a["latency"] == 0.7 and a["recall@10"] == 0.81 and a["qps"] == 1.4
    assert b["latency"] == 0.5 and b["mrr"] == 0.6
    assert c["recall@10"] == 0.74 and "method" not in c


# ---- B5 / A10 ------------------------------------------------------------


def test_method_comparison_pivot(cmp_df):
    rows = {r["method"]: r for r in cmp_df.collect()}
    assert rows["exact"]["recall_at_10"] == 0.8
    assert rows["exact"]["recall_retention"] == 1.0
    assert rows["lsh"]["recall_retention"] == pytest.approx(0.75)
    assert rows["lsh"]["mrr"] == 0.5


def test_speedup_ratios(spark):
    perf = spark.createDataFrame(
        [("exact", 2.0), ("lsh", 0.5)], "method string, latency_sec double"
    )
    rows = {r["method"]: r for r in speedup_ratios(perf, "exact").collect()}
    assert rows["exact"]["speedup_vs_baseline"] == 1.0
    assert rows["lsh"]["speedup_vs_baseline"] == 4.0
    assert rows["lsh"]["qps"] == 2.0


# ---- A9 ------------------------------------------------------------------


def test_summary_extrema(cmp_df):
    rows = {r["stat"]: r for r in summary_extrema(cmp_df).collect()}
    assert rows["max_recall_at_10"]["method"] == "exact"
    assert rows["max_recall_at_10"]["value"] == 0.8
    assert set(rows) == {"max_recall_at_10", "max_precision_at_10", "max_mrr"}


# ---- B6 ------------------------------------------------------------------


def test_summary_text(cmp_df):
    txt = summary_text(cmp_df.collect())
    assert "METHOD COMPARISON" in txt
    assert "exact" in txt and "lsh" in txt
    assert "KEY FINDING: best recall@10 = 0.8000 (exact)" in txt


def test_absent_baseline_degrades_to_null_not_empty(spark, cmp_df):
    """Review r7: a missing baseline method must yield NULL
    retention/speedup for every row (summary prints 'n/a'), never an
    empty comparison that crashes summary_text downstream."""
    rows = recall_retention(
        method_comparison(
            {
                "lsh": _long_report(
                    spark,
                    [("recall", 10, 0.6), ("precision", 10, 0.3), ("mrr", None, 0.5)],
                )
            }
        ),
        baseline="exact",
    ).collect()
    assert len(rows) == 1 and rows[0]["recall_retention"] is None
    perf = spark.createDataFrame(
        [("lsh", 0.5)], "method string, latency_sec double"
    )
    prow = speedup_ratios(perf, "exact").collect()
    assert len(prow) == 1 and prow[0]["speedup_vs_baseline"] is None
    txt = summary_text(rows, prow)
    assert "n/a" in txt and "lsh" in txt


def test_summary_text_renders_null_metrics(cmp_df):
    """A legacy report without recall@10 yields NULL metric cells —
    the summary renders 'n/a' instead of raising on format."""
    rows = [
        {
            "method": "legacy",
            "recall_at_10": None,
            "precision_at_10": None,
            "mrr": 0.4,
            "recall_retention": None,
        }
    ]
    txt = summary_text(rows)
    assert "legacy" in txt and "n/a" in txt
    assert "best recall@10 = n/a (legacy)" in txt


def test_run_comparison_pipeline_through_files(spark, tmp_path):
    """B4/B5/B6 + S11/S12 composed: reports written to disk, re-read,
    normalized, pivoted, summarized."""
    from inside_vectordb_spark.operators.compare import run_comparison_pipeline

    per_method = {
        "exact": _long_report(
            spark, [("recall", 10, 0.8), ("precision", 10, 0.4), ("mrr", None, 0.6)]
        ),
        "lsh": _long_report(
            spark, [("recall", 10, 0.6), ("precision", 10, 0.3), ("mrr", None, 0.5)]
        ),
    }
    txt = run_comparison_pipeline(per_method, str(tmp_path))
    assert "exact" in txt and "lsh" in txt
    assert "75.0%" in txt  # lsh retention from the file round-trip
    assert (tmp_path / "exact").is_dir() and (tmp_path / "lsh").is_dir()


# ---- end-to-end on driver data -------------------------------------------


def test_registry_comparison_values(spark):
    rows = {r["method"]: r for r in QUERIES["method_comparison"](spark, SF_DIR).collect()}
    assert set(rows) == {"exact", "signlsh", "ivfdet"}
    assert rows["exact"]["recall_retention"] == pytest.approx(1.0)
    for m, r in rows.items():
        # qrels-based recall is NOT upper-bounded by exact (judgments
        # are independent of cosine rank); neighbor-recall retention
        # bounds live in tests/test_ann.py. Here the contract is the
        # arithmetic: all metrics in [0,1], retention = recall/base.
        for col in ("recall_at_10", "precision_at_10", "mrr"):
            assert 0.0 <= r[col] <= 1.0
        assert r["recall_retention"] == pytest.approx(
            round(r["recall_at_10"] / rows["exact"]["recall_at_10"], 6), abs=1e-9
        )


def test_registry_speedups_shape(spark):
    rows = QUERIES["method_speedups"](spark, SF_DIR).collect()
    assert {r["method"] for r in rows} == {"exact", "signlsh", "ivfdet"}
    assert all(r["latency_sec"] > 0 and r["qps"] > 0 for r in rows)
    exact = [r for r in rows if r["method"] == "exact"][0]
    assert exact["speedup_vs_baseline"] == pytest.approx(1.0)
