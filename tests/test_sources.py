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


def test_beir_extract_is_atomic(tmp_path, monkeypatch):
    """Review r7: a killed extraction must not leave a directory the
    isdir cache check mistakes for a complete dataset — extraction
    stages to a temp dir and renames into place on success only."""
    import zipfile

    from inside_vectordb_spark.sources import beir

    def fake_fetch(url, zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            zf.writestr("scifact/corpus.jsonl", '{"_id": "MED-10"}\n')

    monkeypatch.setattr(beir.urllib.request, "urlretrieve", fake_fetch)
    out = beir.download_beir_dataset("scifact", str(tmp_path))
    assert out == str(tmp_path / "scifact")
    assert (tmp_path / "scifact" / "corpus.jsonl").exists()
    # no staging droppings, zip consumed
    assert sorted(p.name for p in tmp_path.iterdir()) == ["scifact"]

    def boom(url, zip_path):
        with open(zip_path, "wb") as f:
            f.write(b"not a zip")

    monkeypatch.setattr(beir.urllib.request, "urlretrieve", boom)
    import pytest as _pytest

    with _pytest.raises(zipfile.BadZipFile):
        beir.download_beir_dataset("nfcorpus", str(tmp_path))
    # the failed dataset did NOT commit: a retry will re-download
    assert not (tmp_path / "nfcorpus").exists()


def test_pyds_reads_non_numeric_beir_ids(spark, tmp_path):
    """Review r7: real BEIR corpus ids are strings ('MED-10') — the
    custom Python DataSource must keep `_id` as STRING like the
    JVM-native reader, and tolerate a missing _id as null."""
    from inside_vectordb_spark.sources.pyds import (
        register_jsonl_corpus_source,
    )

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"_id": "MED-10", "title": "t", "text": "x"}\n'
        '{"_id": 7, "text": "y"}\n'
        '{"text": "orphan"}\n'
    )
    register_jsonl_corpus_source(spark)
    rows = {
        r["_id"]: r["text"]
        for r in spark.read.format("jsonl_corpus").load(str(p)).collect()
    }
    assert rows == {"MED-10": "x", "7": "y", None: "orphan"}


def test_zorder_layout_skipping_property(spark, tmp_path):
    """Z-order clustering must make BOTH key columns' per-file value
    ranges narrow — the data-skipping property itself, measured on the
    written files via pyarrow footer statistics."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.layout import zorder_write
    from tests.conftest import SF_DIR
    from inside_vectordb_spark import io as eio

    ev = eio.load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value", F.hour("ts").alias("hod")
    )
    zpath = str(tmp_path / "z")
    upath = str(tmp_path / "u")
    zorder_write(ev, zpath, "user_id", "hod", n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(upath)

    def mean_spread(path: str, col: str) -> float:
        spreads = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    c = row.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                        hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
            if lo is not None:
                spreads.append(hi - lo)
        assert spreads, f"no stats found for {col} under {path}"
        return sum(spreads) / len(spreads)

    # round-robin files span the whole domain; z-ordered files must
    # cover a strictly smaller tile on BOTH columns
    assert mean_spread(zpath, "user_id") < 0.75 * mean_spread(upath, "user_id")
    assert mean_spread(zpath, "hod") < 0.75 * mean_spread(upath, "hod")


def test_zorder_wide_range_bigint_no_overflow(spark, tmp_path):
    """Regression (review r9-3): a bigint key whose range exceeds
    ~2^63/65535 (epoch-MICROSECOND timestamps spanning a few years)
    overflowed the integer-domain (col - lo) * span multiply, so the
    Morton key interleaved garbage bits and the files silently
    stopped covering compact tiles. The scaled() difference now
    leaves integer domain before the multiply; the skipping property
    must hold at this range too."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # 4 years of epoch-microseconds: range ≈ 1.26e14, * 65535 ≈ 8.3e18
    # — just past 2^63 ≈ 9.2e18 with any value headroom, and far past
    # it for longer spans; use 8 years to be decisive (wraps for sure)
    base = 1_600_000_000_000_000
    span_us = 8 * 365 * 24 * 3600 * 1_000_000
    step = span_us // 4096
    df = (
        spark.range(0, 4096)
        .select(
            # a permutation of the id space spread across the FULL
            # 8-year span (the range, not the values, is what wraps)
            (F.lit(base) + ((F.col("id") * 2039) % 4096) * F.lit(step)).alias(
                "ts_us"
            ),
            (F.col("id") % 97).alias("grp"),
        )
    )
    zpath = str(tmp_path / "zwide")
    upath = str(tmp_path / "uwide")
    from inside_vectordb_spark.operators.layout import zorder_write

    zorder_write(df, zpath, "ts_us", "grp", n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(upath)

    def mean_spread(path: str, col: str) -> float:
        spreads = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    c = row.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                        hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
            if lo is not None:
                spreads.append(hi - lo)
        assert spreads, f"no stats found for {col} under {path}"
        return sum(spreads) / len(spreads)

    assert mean_spread(zpath, "ts_us") < 0.75 * mean_spread(upath, "ts_us")
    assert mean_spread(zpath, "grp") < 0.75 * mean_spread(upath, "grp")


def test_compaction_collapses_files(spark, tmp_path):
    """Compaction rewrites 64 fragments into ~target-size files with
    identical contents and an order-of-magnitude fewer files."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.layout import compact_small_files
    from tests.conftest import SF_DIR_MED

    docs = eio.load_table(spark, SF_DIR_MED, "documents")
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    docs.repartition(64).write.parquet(frag)
    stats = compact_small_files(spark, frag, out, target_file_bytes=8 << 20)
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 4
    before = {r.doc_id for r in docs.collect()}
    after = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert before == after
