"""Report sink/scan (S11/S12) — the only sources not covered by the
oracle round-trip queries (timestamps/mtime aren't SQL-expressible).
"""

from __future__ import annotations

import os
import time

from inside_vectordb_spark.sources import load_latest_reports, save_metrics_report


def test_report_roundtrip_and_latest(tmp_path):
    d = str(tmp_path)
    p1 = save_metrics_report("brute_force", {"recall@10": 0.81}, d, stamp="20250101_000000")
    # ensure distinct mtimes even on coarse filesystems
    time.sleep(0.05)
    os.utime(p1, (time.time() - 60, time.time() - 60))
    p2 = save_metrics_report("brute_force", {"recall@10": 0.83}, d, stamp="20250102_000000")
    save_metrics_report("hnswlib", {"recall@10": 0.74}, d, stamp="20250101_000000")

    assert os.path.basename(p2) == "brute_force_20250102_000000.json"
    latest = load_latest_reports(d)
    assert set(latest) == {"brute_force", "hnswlib"}
    assert latest["brute_force"]["metrics"]["recall@10"] == 0.83
    assert latest["hnswlib"]["method"] == "hnswlib"


def test_load_latest_reports_empty(tmp_path):
    assert load_latest_reports(str(tmp_path)) == {}


def test_queries_jsonl_roundtrip(spark, tmp_path):
    """S4: queries JSONL reader round-trip."""
    import pandas as pd
    from pyspark.sql import functions as F

    from inside_vectordb_spark.sources import read_queries_jsonl

    src_df = spark.createDataFrame(
        pd.DataFrame({"_id": ["q1", "q2"], "text": ["what is spark", "how to join"]})
    )
    path = str(tmp_path / "queries.jsonl")
    src_df.write.json(path)
    back = read_queries_jsonl(spark, path)
    assert {(r["query_id"], r["text"]) for r in back.collect()} == {
        ("q1", "what is spark"),
        ("q2", "how to join"),
    }


def test_beir_download_url_and_cache(tmp_path):
    """S1: URL construction + already-downloaded short-circuit (the
    network fetch itself is an environment concern)."""
    from inside_vectordb_spark.sources.beir import (
        beir_dataset_url,
        download_beir_dataset,
    )

    assert beir_dataset_url("msmarco").endswith("/BEIR/datasets/msmarco.zip")
    cached = tmp_path / "msmarco"
    cached.mkdir()
    assert download_beir_dataset("msmarco", str(tmp_path)) == str(cached)
