"""Structured Streaming over the events table.

The batch twins live in ``registry/relational.py``
(``events_hourly`` / ``events_sessionized``); these streaming
versions produce the SAME results when drained over the same files
(asserted in ``tests/test_streaming.py``, oracle-checked via the
registered ``*_stream`` queries).

Semantics:

- hourly: tumbling ``window(ts, '1 hour')`` + watermark — late rows
  beyond the watermark are dropped in a live run; draining a static
  directory with ``Trigger.AvailableNow`` processes everything, so
  batch parity holds.
- sessions: native ``session_window(ts, '30 min')`` gap windows.
  Boundary note: ``session_window`` starts a new session when the
  gap is ≥ the duration, the batch lag-based twin when it is
  strictly >; the two differ only for a gap equal to the boundary
  at microsecond precision.

Scale notes: state is keyed by (window/session, group keys) and
expired by the watermark, so executor state stays bounded by the
number of OPEN windows, not history; the file source feeds
``maxFilesPerTrigger``-sized micro-batches for backpressure.
"""

from __future__ import annotations

import uuid
from contextlib import ExitStack, contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def _pinned_state_partitions(spark: SparkSession, n: int | None):
    """Pin ``spark.sql.shuffle.partitions`` for a stream's lifetime
    and restore it afterward — in Structured Streaming this is THE
    state knob (state-store count per stateful operator, frozen into
    the checkpoint at first start). ONE implementation: the pin/
    restore block used to be copy-pasted across the three drains, and
    copy variation is exactly how their checkpoint-retention rules
    diverged (review r8)."""
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def read_table_stream(
    spark: SparkSession, sf_dir: str, name: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over one testdata parquet table. The file
    stream source requires a DIRECTORY (its basePath); the testdata
    lays tables out as single files, so stage a directory containing
    a link to the file. In production the ingest directory is already
    the landing zone new files arrive in."""
    import os
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    raw_schema = spark.read.parquet(path).schema
    from inside_vectordb_spark import _meta_io as mio

    # keyed by a hash of the RESOLVED source dir, not its basename:
    # two datasets .../a/sf0.1 and .../b/sf0.1 must not share a stage
    # dir — re-pointing the symlink under a running stream makes its
    # next micro-batch read the other dataset (review r8)
    import hashlib

    src_key = hashlib.md5(
        os.path.realpath(sf_dir).encode()
    ).hexdigest()[:10]
    stage = os.path.join(
        mio.artifacts_root(),
        "stream_src",
        f"{name}_{src_key}",
    )
    os.makedirs(stage, exist_ok=True)
    # a table may be ONE parquet file (driver testdata) or a DIRECTORY
    # of part files (engine-written, e.g. the scale-soak replicas);
    # the file source does not recurse into a linked subdirectory, so
    # a directory source stages one link PER part file — which also
    # gives maxFilesPerTrigger its micro-batch granularity (r11: the
    # dir case silently streamed ZERO rows before)
    if os.path.isdir(path):
        import glob as _glob

        srcs = sorted(_glob.glob(os.path.join(path, "part-*.parquet")))
        if not srcs:
            raise FileNotFoundError(f"no part files under {path}")
        pairs = [
            (s, os.path.join(stage, f"{name}_{i}.parquet"))
            for i, s in enumerate(srcs)
        ]
        # drop stale links from a previous (larger or single-file)
        # layout of the same resolved source dir
        keep = {os.path.basename(dst) for _, dst in pairs}
        for existing in os.listdir(stage):
            if existing not in keep:
                os.remove(os.path.join(stage, existing))
    else:
        pairs = [(path, os.path.join(stage, f"{name}.parquet"))]
        # same stale-link cleanup when a source flips dir -> file
        for existing in os.listdir(stage):
            if existing != f"{name}.parquet":
                os.remove(os.path.join(stage, existing))
    # Symlinks track source updates for free; a copy fallback must be
    # refreshed when the source changes (mtime/size drift), or the
    # stream silently replays stale data forever.
    for src, staged in pairs:
        if os.path.islink(staged):
            if os.path.realpath(staged) != os.path.realpath(src):
                os.remove(staged)
        elif os.path.exists(staged):
            src_st, cp_st = os.stat(src), os.stat(staged)
            if (src_st.st_mtime, src_st.st_size) != (
                cp_st.st_mtime,
                cp_st.st_size,
            ):
                os.remove(staged)
        if not os.path.exists(staged):
            try:
                os.symlink(src, staged)
            except OSError:
                shutil.copyfile(src, staged)
                shutil.copystat(src, staged)
    return (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Events stream; the nanos timestamp is read as a raw long
    (``nanosAsLong``, as in ``io.load_table``) and floor-divided to
    microseconds — identical truncation to the batch reader, keeping
    parity."""
    df = read_table_stream(spark, sf_dir, "events", max_files_per_trigger)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # Writer-flavor drift (see io._tz_normalize): cast to TIMESTAMP
        # under the UTC session so watermarks/windows match the batch twin.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def distinct_content_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: emit each content hash the FIRST time
    it is seen (``dropDuplicates`` keeps per-key state across
    micro-batches). A live deployment adds ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` to bound state; draining a
    static directory keeps exact semantics."""
    return docs.select(F.md5(F.col(text_col)).alias("text_hash")).dropDuplicates(
        ["text_hash"]
    )


def hourly_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``events_hourly``: tumbling 1-hour windows
    per event_type; same output schema as the batch query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``events_sessionized`` via native gap-based
    ``session_window``; emits (user_id, session_start, n_events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


@contextmanager
def _pinned_conf(spark: SparkSession, key: str, value: str):
    """Pin one session conf for a block and restore it (unset if it
    had no explicit value)."""
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# recentProgress retention pinned for drains that CAPTURE progress
# (advice r11): Spark keeps only the last
# spark.sql.streaming.numRecentProgressUpdates entries (default 100),
# so a maxFilesPerTrigger=1 drain over >100 part files would silently
# drop its earliest micro-batches and undercount rows_read. 10k
# micro-batches is far past any drain this engine runs; the collector
# still hard-fails if the cap is ever reached rather than undercount.
_PROGRESS_RETENTION = 10_000


def _progress_dicts(q) -> list[dict]:
    """Normalize StreamingQuery.recentProgress across PySpark versions
    (plain dicts in some, StreamingQueryProgress objects in others).
    Raises rather than return a silently-truncated capture when the
    retention cap was reached (advice r11)."""
    import json as _json

    out = []
    for p in q.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:
            out.append(_json.loads(p.json))
    if len(out) >= _PROGRESS_RETENTION:
        raise RuntimeError(
            f"recentProgress hit the retention cap ({_PROGRESS_RETENTION}); "
            "earliest micro-batches were evicted, so progress totals would "
            "undercount — raise _PROGRESS_RETENTION or coalesce the source"
        )
    return out


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str | None = None,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
    progress: list | None = None,
) -> DataFrame:
    """Drain a streaming aggregation with Trigger.AvailableNow into a
    memory sink; returns the result as a BATCH DataFrame. This is the
    bridge that lets the driver's (batch) correctness gate
    oracle-check the streaming plans.

    ``output_mode=None`` (default) resolves per plan: ``complete``
    for aggregations, falling back to ``append`` when Spark rejects
    it at ``start()`` (stream-stream joins and ``dropDuplicates``
    don't support complete; the rejection happens before any
    processing, so the retry is clean). Pass a mode explicitly to
    pin it — ``update`` is never auto-chosen.

    ``progress`` (optional list) receives the drain's per-micro-batch
    StreamingQueryProgress dicts on success — input rows and
    state-store totals that the memory-sink bridge otherwise hides
    from plan-level counters (the scale soak's state-growth subject
    reads these).

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    stream's lifetime — in Structured Streaming this is THE state
    knob: it fixes the number of state stores per stateful operator
    (frozen into the checkpoint at first start), and every micro-batch
    pays per-store open/commit overhead, so it must be sized to stream
    VOLUME, not cluster width. A stream-stream join at 32 stores costs
    ~3× the wall-clock of the same join at 8 on this data (measured);
    a production deployment at real volume would set it to
    hundreds/thousands before the first start. ``None`` leaves the
    session value untouched. Results are partition-count-invariant.
    """
    spark = streaming_df.sparkSession
    name = f"stream_{uuid.uuid4().hex[:12]}"
    with ExitStack() as _stack:
        if progress is not None:
            # capture requested: raise the progress-retention cap for
            # the drain's lifetime so a many-micro-batch drain can't
            # silently evict its earliest entries (advice r11)
            _stack.enter_context(
                _pinned_conf(
                    spark,
                    "spark.sql.streaming.numRecentProgressUpdates",
                    str(_PROGRESS_RETENTION),
                )
            )
        _stack.enter_context(_pinned_state_partitions(spark, state_partitions))
        def _start(mode: str):
            return (
                streaming_df.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )

        if output_mode is None:
            from pyspark.errors import AnalysisException

            try:
                q = _start("complete")
            except AnalysisException:
                # non-aggregating plan (stream-stream join,
                # dropDuplicates): complete is rejected at start(),
                # before any processing — append is the right mode
                q = _start("append")
        else:
            q = _start(output_mode)
        try:
            if not q.awaitTermination(timeout_sec):
                raise TimeoutError(
                    f"stream drain exceeded {timeout_sec}s; refusing to return "
                    f"a partially-drained memory table ({name})"
                )
        except BaseException:
            # the failure path must not leak the partially-drained
            # memory table either (review r10-2 — the success path has
            # dropped it since r8, so repeated FAILED drains were the
            # one remaining growth vector). Each cleanup step runs
            # even if the other raises, and neither's failure may
            # replace the ORIGINAL exception (advice r11: a q.stop()
            # raise used to skip dropTempView entirely, and a
            # dropTempView raise masked the drain error).
            for _cleanup in (q.stop, lambda: spark.catalog.dropTempView(name)):
                try:
                    _cleanup()
                except Exception:
                    pass
            raise
        else:
            if progress is not None:
                # per-micro-batch progress (input rows, state-store
                # totals): the memory-sink drain hides this work from
                # plan-level counters, so observers (the scale soak)
                # read it here. Collected BEFORE stop() — stopping
                # clears nothing, but keeps the contract obvious.
                progress.extend(_progress_dicts(q))
            q.stop()
    # Detach the result from the memory sink and DROP the sink table:
    # every drain otherwise leaves its full result registered (and
    # driver-resident) for the session lifetime — unbounded growth
    # over repeated gate runs (review r8). localCheckpoint moves the
    # (small, aggregated) rows to executor block storage.
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def click_purchase_join_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "10 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stream-stream interval join: every (click, purchase) pair of
    the same user with the purchase inside ``window`` after the click
    — the attribution-join shape (conversion tracking), expressed as
    two watermarked streams over the same source.

    Both sides carry watermarks and the join condition bounds purchase
    time to [click, click + window], so Spark derives a state-eviction
    horizon for BOTH join buffers — state stays O(watermark-width of
    in-flight events), not O(stream length); without the time bound
    the buffers would grow forever. Append output mode: each matched
    pair emits exactly once, when the watermark passes it."""
    # ONE source, both sides (optimization r12): a stream-stream
    # SELF-join over a shared reader is fully supported, and the two
    # separate read_events_stream sources each scanned the whole
    # events table per micro-batch — numInputRows 200k for a 100k
    # table, measured. Deriving both sides from one streaming frame
    # halves the per-batch scan and the source bookkeeping; the rows
    # entering the join (and therefore the emitted pairs) are
    # byte-identical.
    src = read_events_stream(spark, sf_dir, max_files_per_trigger)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""
            p_user_id = user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + interval {window}
            """
        ),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("delay_us"),
    )


def run_to_parquet_overwrite(
    streaming_df: DataFrame,
    path: str,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
) -> None:
    """Drain a complete-mode streaming aggregation through
    ``foreachBatch`` with a full-overwrite parquet write — the
    idempotent-sink pattern: a retried micro-batch rewrites the same
    result instead of appending a duplicate, so the sink holds
    exactly-once OUTPUT semantics on top of Spark's at-least-once
    batch delivery. (Per-batch atomic overwrite is what production
    jobs pair with `replaceWhere`/partition overwrite at scale.)"""
    import os
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="ck_", dir=os.path.dirname(path) or None)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(path)

    spark = streaming_df.sparkSession
    with _pinned_state_partitions(spark, state_partitions):
        q = (
            streaming_df.writeStream.foreachBatch(write_batch)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_sec):
                raise TimeoutError(f"stream sink drain exceeded {timeout_sec}s")
        finally:
            q.stop()
            # deleting the checkpoint unconditionally is SAFE here —
            # and only here: the sink is a complete-mode full
            # overwrite, so a from-scratch replay rewrites the
            # identical result (unlike the merge/upsert drains, whose
            # checkpoints must survive failure)
            shutil.rmtree(ckpt, ignore_errors=True)


def run_merge_to_snapshot(
    changes_stream: DataFrame,
    snapshot_path: str,
    key: str = "doc_id",
    op_col: str = "op",
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
    checkpoint_dir: str | None = None,
) -> None:
    """CDC apply — the lakehouse streaming-MERGE pattern (Delta's
    ``foreachBatch`` + ``MERGE INTO`` upsert recipe): every micro-batch
    of change rows (insert/update/delete + the base columns) is merged
    into the copy-on-write snapshot as one new committed version. The
    per-batch plan is the broadcast-anti CoW merge (the base never
    shuffles; only changed rows move), and because each commit is the
    snapshot log's atomic rename, a crashed batch leaves the previous
    version intact and the checkpoint replays it — at-least-once
    delivery composes with the idempotent last-log-wins commit into
    exactly-once TABLE state per batch id.

    MERGE's cardinality contract (a key at most once) must hold PER
    MICRO-BATCH; cross-batch re-updates of the same key are fine (the
    later batch supersedes, exactly like sequential MERGEs).

    Delivery contract (review r8 — previously this drain deleted its
    checkpoint even on failure, making its own replay story
    impossible): a FAILED/timed-out drain KEEPS the checkpoint, and
    the TimeoutError names it; pass the same ``checkpoint_dir`` to
    resume without re-merging applied micro-batches (a from-scratch
    replay would commit one spurious snapshot version per
    already-applied file — MERGE commits are idempotent in table
    STATE but not in version history). The auto-created directory is
    removed only after a successful drain — the same rule as
    ``run_upsert_to_sign_index``."""
    import os
    import shutil
    import tempfile

    from inside_vectordb_spark.operators.merge import merge_into_snapshot

    auto_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(
        prefix="ck_", dir=os.path.dirname(snapshot_path) or None
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into_snapshot(
            batch_df.sparkSession, snapshot_path, batch_df, key=key, op_col=op_col
        )

    spark = changes_stream.sparkSession
    with _pinned_state_partitions(spark, state_partitions):
        q = (
            changes_stream.writeStream.foreachBatch(apply_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_sec)
            if not finished:
                raise TimeoutError(
                    f"merge stream drain still running after {timeout_sec}s; "
                    f"resume with checkpoint_dir={ckpt!r}"
                )
        except BaseException:
            if q.isActive:
                q.stop()
            raise  # keep the checkpoint: the retry must not replay
        else:
            if q.isActive:
                q.stop()
            if auto_ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)


def run_index_maintenance(
    changes_stream: DataFrame,
    index_path: str,
    upsert_fn,
    timeout_sec: int = 300,
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming index maintenance — the vector-store ingest loop
    (hnswlib ``add_items`` fed by a stream), generalized over the
    tier: every micro-batch of new rows is applied by
    ``upsert_fn(spark, batch_df, index_path)`` via ``foreachBatch``
    (each tier's upsert is O(delta) and commit-locked, so concurrent
    readers/maintainers stay safe). One harness serves every
    maintained index — sign-LSH (bit-identical-to-batch-build, the
    oracle-certified registered query), the HNSW graph tier, or any
    future artifact (review r9 generalization).

    Delivery contract: delta ids disjoint across batches and from the
    base (the FAISS ``add`` contract); at-least-once replays are
    guarded by the checkpoint, so a FAILED drain must keep its
    checkpoint: pass the same ``checkpoint_dir`` to resume without
    reprocessing applied micro-batches (the path is in the
    TimeoutError message when the default fresh directory was used —
    deleting it on failure, the pre-r7 behavior, made every retry
    replay batch 0 into an append-only index). The auto-created
    directory is removed only after a SUCCESSFUL drain."""
    import os
    import shutil
    import tempfile

    auto_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(
        prefix="ck_", dir=os.path.dirname(index_path) or None
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_fn(batch_df.sparkSession, batch_df, index_path)

    q = (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            # surface the partial drain — returning silently would
            # serve an index missing the undrained micro-batches
            raise TimeoutError(
                f"index upsert drain still running after "
                f"{timeout_sec}s; resume with checkpoint_dir={ckpt!r}"
            )
    except BaseException:
        if q.isActive:
            q.stop()
        raise  # keep the checkpoint: the retry must not replay
    else:
        if q.isActive:
            q.stop()
        if auto_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def run_upsert_to_sign_index(
    changes_stream: DataFrame,
    index_path: str,
    timeout_sec: int = 300,
    checkpoint_dir: str | None = None,
) -> None:
    """Sign-LSH instantiation of :func:`run_index_maintenance` —
    because the bucket function is deterministic and upsert ==
    batch-build is exact, an index maintained from N micro-batches
    answers BIT-IDENTICALLY to one built from the full corpus, which
    the registered query's shared search oracle certifies."""
    from inside_vectordb_spark.operators.ann_sign import upsert_sign_index

    run_index_maintenance(
        changes_stream,
        index_path,
        upsert_fn=lambda spark, batch, path: upsert_sign_index(
            spark, batch, path
        ),
        timeout_sec=timeout_sec,
        checkpoint_dir=checkpoint_dir,
    )
