"""Streaming/batch parity: draining the streaming plans over the
static events files must reproduce the batch twins. (Oracle parity
for the streaming queries themselves runs in test_parity.py — they
carry full DuckDB oracles.)
"""

from __future__ import annotations

from inside_vectordb_spark.registry import QUERIES
from inside_vectordb_spark.streaming import (
    hourly_stream,
    read_events_stream,
    run_to_memory,
    sessionized_stream,
)
from tests.conftest import SF_DIR


def test_hourly_stream_equals_batch(spark):
    stream = run_to_memory(hourly_stream(read_events_stream(spark, SF_DIR)))
    batch = QUERIES["events_hourly"](spark, SF_DIR)
    a = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b


def test_sessionized_stream_matches_batch_sessions(spark):
    """session_window sessions must agree with the lag-based batch
    sessionization on (user_id, session_start, n_events) — the
    testdata has no gap exactly at the 30-min boundary, so the >= /
    > semantic difference is invisible here."""
    stream = run_to_memory(sessionized_stream(read_events_stream(spark, SF_DIR)))
    batch = QUERIES["events_sessionized"](spark, SF_DIR)
    a = {(r["user_id"], r["session_start"], r["n_events"]) for r in stream.collect()}
    b = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()}
    assert a == b


def test_stream_is_incremental(spark):
    """The plan really is a streaming plan (not a batch rewrite)."""
    s = hourly_stream(read_events_stream(spark, SF_DIR))
    assert s.isStreaming


def test_run_to_memory_auto_mode_handles_non_aggregating_plans(spark):
    """Review r7: the default drain mode must work for plans that
    reject 'complete' (dropDuplicates here) by falling back to
    append — callers should not need to know each plan's supported
    modes for the generic batch-gate bridge."""
    dedup = read_events_stream(spark, SF_DIR).select("user_id").dropDuplicates(
        ["user_id"]
    )
    out = run_to_memory(dedup)  # no output_mode → auto
    batch = QUERIES["events_user_distinct"](spark, SF_DIR)
    assert out.count() == batch.collect()[0]["n_users"]


def test_minhash_stream_pairs_equals_batch(spark):
    """The incremental near-dup drain must produce exactly the batch
    operator's pair set over the full corpus (the sharing-the-oracle
    exactness claim, re-proven in-suite at sf0.001)."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators import dedup as dd
    from inside_vectordb_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in QUERIES["minhash_stream_pairs"](spark, SF_DIR).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dd.minhash_near_duplicates(
            eio.load_table(spark, SF_DIR, "documents"), threshold=0.2
        ).collect()
    }
    assert got == want and len(want) > 0


def test_incremental_near_dup_batch_fn_stays_distributed():
    """Round-5 advisory: the per-micro-batch band-key materialization
    must stay on the executors (localCheckpoint), not round-trip
    through the driver — collect()+createDataFrame serializes
    O(batch_docs × n_bands) rows through the driver on EVERY batch."""
    import inspect

    from inside_vectordb_spark.streaming.dedup_stream import (
        run_incremental_near_dup,
    )

    src = inspect.getsource(run_incremental_near_dup)
    assert ".collect()" not in src
    assert "localCheckpoint" in src


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Restart semantics, pinned: a second AvailableNow drain against
    the SAME checkpoint must process only files that arrived after
    the first drain — no reprocessing, no duplicates — and the file
    sink's transaction log must read back exactly once per row. This
    is the property that makes the engine's streaming maintenance
    paths (index upserts, CDC merges) restartable at 100 TB: state
    and source progress live in the checkpoint, not in the job."""
    import pandas as pd

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "val": [10.0, 20.0, 30.0]})
    ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, val double").parquet(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    drain()
    got1 = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert got1 == [1, 2, 3]
    # new files land; the old ones must NOT be reprocessed
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [4, 5], "val": [40.0, 50.0]})
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    got2 = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert got2 == [1, 2, 3, 4, 5]  # exactly once per row, no dups
