"""Streaming registry: each query RUNS a Structured Streaming plan
(AvailableNow drain → memory sink) and returns the batch result, so
the driver's DuckDB gate oracle-checks the streaming execution path
itself — watermarking, incremental state, and window assignment
included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.registry import register


def _stage_batches(root: str, inbox: str, batches: list[DataFrame]):
    """Land each batch DataFrame as ONE parquet file in ``inbox``
    (the micro-batch fixture every file-source stream here reads);
    returns the schema for the readStream declaration. One helper —
    review r7 found this block copy-pasted three times — with a loud
    error when a batch writes no part file instead of a bare
    IndexError."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    _os.makedirs(inbox, exist_ok=True)
    schema = None
    for i, b in enumerate(batches):
        tmp = _os.path.join(root, f"__b{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = _glob.glob(_os.path.join(tmp, "part-*.parquet"))
        if not parts:
            raise RuntimeError(f"batch {i} wrote no part file under {tmp}")
        _shutil.move(parts[0], _os.path.join(inbox, f"batch_{i}.parquet"))
        _shutil.rmtree(tmp, ignore_errors=True)
        schema = b.schema if schema is None else schema
    return schema


from inside_vectordb_spark.streaming import (  # noqa: E402
    distinct_content_stream,
    hourly_stream,
    read_events_stream,
    read_table_stream,
    run_to_memory,
    running_user_totals,
    sessionized_stream,
)


@register(
    "events_hourly_stream",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts drained over the static
    events files — must equal the batch ``events_hourly`` exactly."""
    out = run_to_memory(hourly_stream(read_events_stream(spark, sf_dir)))
    return out.orderBy("window_start", "event_type")


@register(
    "events_sessionized_stream",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM w)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start
    """,
)
def events_sessionized_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap-based ``session_window`` sessions. The oracle uses
    the ``>=`` boundary (session_window semantics: a gap EQUAL to the
    duration starts a new session, unlike the batch twin's strict
    ``>``)."""
    out = run_to_memory(sessionized_stream(read_events_stream(spark, sf_dir)))
    return out.orderBy("user_id", "session_start")


@register(
    "events_user_totals_stream",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def events_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): running
    per-user totals. Draining the static directory in one AvailableNow
    batch makes the last update per user equal the batch aggregate —
    the oracle checks the arbitrary-state path end to end."""
    out = run_to_memory(
        running_user_totals(read_events_stream(spark, sf_dir)),
        output_mode="update",
    )
    # update mode may emit a row per (user, micro-batch): keep the
    # final (max n_events) row per user for the stable batch view
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    return (
        out.withColumn("__rn", w)
        .filter(F.col("__rn") == 1)
        .select(
            "user_id", "n_events", F.round("total_value", 6).alias("total_value")
        )
        .orderBy("user_id")
    )


@register(
    "dedup_exact_stream",
    oracle="SELECT DISTINCT md5(text) AS text_hash FROM documents",
)
def dedup_exact_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (stateful dropDuplicates): draining the
    static corpus must emit exactly the distinct content hashes —
    the streaming twin of dedup_exact's hash universe."""
    docs = read_table_stream(spark, sf_dir, "documents")
    out = run_to_memory(distinct_content_stream(docs), output_mode="append")
    return out.orderBy("text_hash")


@register(
    "events_click_purchase_stream",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def events_click_purchase_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (conversion attribution): clicks
    joined to same-user purchases within 10 minutes, both sides
    watermarked so join-buffer state is evicted as the watermark
    advances. Drained with AvailableNow in append mode; the oracle is
    the equivalent batch interval join."""
    from inside_vectordb_spark.streaming import click_purchase_join_stream

    out = run_to_memory(
        click_purchase_join_stream(spark, sf_dir), output_mode="append"
    )
    return out.orderBy("click_id", "purchase_id")


@register(
    "events_stream_enriched",
    oracle="""
    WITH dim AS (
      SELECT event_type, count(*) AS type_total,
             round(avg(value), 6) AS type_avg
      FROM events GROUP BY event_type)
    SELECT e.event_type, d.type_total,
           count(*) AS n_events,
           round(sum(e.value - d.type_avg), 6) + 0.0 AS total_deviation
    FROM events e JOIN dim d USING (event_type)
    GROUP BY 1, 2
    """,
)
def events_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the live event stream enriched against a
    BATCH dimension (per-type totals/averages computed from the same
    table, the lookup-table pattern). The static side is re-read per
    micro-batch and broadcast; no state is kept for it — the shape
    that replaces a stateful join whenever one side is slowly
    changing reference data."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.streaming import read_events_stream

    static_dim = (
        eio.load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("type_total"),
            F.round(F.avg("value"), 6).alias("type_avg"),
        )
    )
    stream = read_events_stream(spark, sf_dir)
    joined = stream.join(F.broadcast(static_dim), "event_type")
    agg = joined.groupBy("event_type", "type_total").agg(
        F.count("*").alias("n_events"),
        # + 0.0 normalizes IEEE -0.0 (sum of deviations straddles 0)
        (F.round(F.sum(F.col("value") - F.col("type_avg")), 6) + F.lit(0.0)).alias(
            "total_deviation"
        ),
    )
    return run_to_memory(agg).orderBy("event_type")


@register(
    "events_hourly_stream_sink",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly streaming aggregation drained through a
    ``foreachBatch`` idempotent parquet sink (full overwrite per
    micro-batch — retry-safe exactly-once output), then read back
    from the files: the END-TO-END streaming write path, not just the
    memory-sink bridge. Oracle = the batch aggregation."""
    import os

    from inside_vectordb_spark.streaming import hourly_stream, read_events_stream
    from inside_vectordb_spark.streaming.events import run_to_parquet_overwrite

    art = os.path.join(mio.artifacts_root(), "stream_sink")
    os.makedirs(art, exist_ok=True)
    sf = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(art, f"hourly_{sf}")
    run_to_parquet_overwrite(hourly_stream(read_events_stream(spark, sf_dir)), path)
    return spark.read.parquet(path)


@register(
    "snapshot_stream_merge",
    oracle="""
    WITH chg AS (
      SELECT doc_id, lang, 'edited_stream' AS source, n_chars, 'update' AS op
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id, lang, source, n_chars, 'delete' AS op
      FROM documents WHERE doc_id % 10 = 7
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, lang, 'stream_ingest' AS source,
             n_chars, 'insert' AS op
      FROM documents WHERE doc_id % 10 = 1),
    keys AS (SELECT DISTINCT doc_id FROM chg)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d ANTI JOIN keys k ON d.doc_id = k.doc_id
    UNION ALL
    SELECT doc_id, lang, source, n_chars FROM chg WHERE op <> 'delete'
    """,
)
def snapshot_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply into a copy-on-write snapshot (the Delta
    foreachBatch + MERGE INTO recipe, `streaming/events.py:
    run_merge_to_snapshot`): three change files — updates, deletes,
    inserts on disjoint key sets — land in a watched directory, the
    file stream feeds them one micro-batch each, and every batch
    commits one snapshot version via the broadcast-anti CoW merge.
    After the drain the log holds v1..v4 and the final state equals
    ONE batch merge of all changes (disjoint keys ⇒ batch-order
    independent), which is exactly what the oracle restates. The
    driver-green hash match therefore certifies the whole chain:
    file-stream delivery → per-batch MERGE → atomic version commits."""
    import os

    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.operators.merge import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )
    from inside_vectordb_spark.streaming.events import run_merge_to_snapshot

    docs = eio.load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    root = mio.art_path("stream_merge", sf_dir)
    snap = os.path.join(root, "snapshot")
    inbox = os.path.join(root, "inbox")
    # the query IS the full ingest story; reset state each run so the
    # drained checkpoint/log don't replay into a stale table
    mio.remove_tree(root)
    write_snapshot(docs, snap, 1)

    batches = [
        docs.filter(F.col("doc_id") % 10 == 3)
        .withColumn("source", F.lit("edited_stream"))
        .withColumn("op", F.lit("update")),
        docs.filter(F.col("doc_id") % 10 == 7).withColumn("op", F.lit("delete")),
        docs.filter(F.col("doc_id") % 10 == 1)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("source", F.lit("stream_ingest"))
        .withColumn("op", F.lit("insert")),
    ]
    schema = _stage_batches(root, inbox, batches)

    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    run_merge_to_snapshot(changes, snap)
    got = snapshot_versions(snap)
    if got != [1, 2, 3, 4]:
        # explicit, not a bare assert: maxFilesPerTrigger=1 must have
        # delivered one file per micro-batch (one CoW commit each); a
        # mis-batched drain would otherwise read as a wrong-but-green
        # fixture, and `python -O` would strip an assert entirely
        raise RuntimeError(
            f"stream merge committed versions {got}, expected [1, 2, 3, 4] "
            "(micro-batch delivery drifted from maxFilesPerTrigger=1)"
        )
    return read_snapshot(spark, snap)


from inside_vectordb_spark.registry.ann import _SIGN_ORACLE as _SIGN_STREAM_ORACLE  # noqa: E402


@register("ann_signlsh_stream_upsert", oracle=_SIGN_STREAM_ORACLE)
def ann_signlsh_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN-index maintenance on the hard signal: build the
    persisted sign-LSH index on 80% of the corpus, feed the other 20%
    through a file stream (one micro-batch per file,
    ``foreachBatch`` → O(delta) upsert), then search the maintained
    index over the FULL corpus. Shares the plain sign-LSH search
    oracle — the green hash certifies file-stream delivery →
    per-batch index upsert → bit-identical-to-batch-build serving
    (streaming/events.py:run_upsert_to_sign_index)."""
    import os

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint
    from inside_vectordb_spark.operators.ann_sign import (
        ann_sign_topk_indexed,
        ensure_sign_index,
    )
    from inside_vectordb_spark.streaming.events import run_upsert_to_sign_index

    emb = eio.load_table(spark, sf_dir, "embeddings")
    root = mio.art_path("stream_sign_upsert", sf_dir)
    art = os.path.join(root, "index")
    inbox = os.path.join(root, "inbox")
    mio.remove_tree(root)
    base = emb.filter(~((F.col("vec_id") % 10).isin(3, 7)))
    ensure_sign_index(spark, base, art)

    batches = [
        emb.filter(F.col("vec_id") % 10 == 3),
        emb.filter(F.col("vec_id") % 10 == 7),
    ]
    schema = _stage_batches(root, inbox, batches)

    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    run_upsert_to_sign_index(changes, art)
    meta = mio.read_json(mio.join(art, "meta.json"))
    want = _corpus_fingerprint(emb, "vec_id")
    if meta.get("corpus") != want:
        raise RuntimeError(
            f"maintained index fingerprint {meta.get('corpus')} != full "
            f"corpus {want} (micro-batch delivery drifted)"
        )
    return ann_sign_topk_indexed(
        spark, eio.query_vectors(spark, sf_dir), emb, art, k=10
    )


from inside_vectordb_spark.registry.pipeline import (  # noqa: E402
    _JACCARD as _MH_JACCARD,
    _PAIRS_CTE as _MH_PAIRS_CTE,
    _SIG_CTE as _MH_SIG_CTE,
)

_MINHASH_STREAM_ORACLE = f"""
    WITH {_MH_SIG_CTE}, {_MH_PAIRS_CTE}
    SELECT p.doc_a, p.doc_b, round({_MH_JACCARD}, 6) AS jaccard
    FROM pairs p
    JOIN shs sa ON sa.doc_id = p.doc_a
    JOIN shs sb ON sb.doc_id = p.doc_b
    WHERE round({_MH_JACCARD}, 6) >= 0.2
    """


@register("minhash_stream_pairs", oracle=_MINHASH_STREAM_ORACLE)
def minhash_stream_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming INCREMENTAL near-dup detection: build the MinHash
    band table + base pairs on 80% of the corpus, feed the other 20%
    through a file stream in two micro-batches (foreachBatch:
    batch-vs-stored band join ∪ batch-internal join → exact-Jaccard
    verify → append pairs, append band keys — the O(delta)
    maintenance production dedup runs per crawl), then return every
    pair found. The union across base + batches provably equals the
    one-shot batch near-dup over the full corpus (see
    streaming/dedup_stream.py), so this query SHARES the batch
    minhash oracle — the green hash certifies stream delivery →
    incremental index maintenance → batch-identical pairs."""
    import os

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.streaming.dedup_stream import (
        base_near_dup_build,
        run_incremental_near_dup,
    )

    docs = eio.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = mio.art_path("stream_neardup", sf_dir)
    band_store = os.path.join(root, "bands")
    pairs_store = os.path.join(root, "pairs")
    inbox = os.path.join(root, "inbox")
    mio.remove_tree(root)
    os.makedirs(inbox, exist_ok=True)

    base = docs.filter(F.col("doc_id") % 5 != 0)
    base_near_dup_build(base, band_store, pairs_store, threshold=0.2)

    deltas = [
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 == 5),
    ]
    schema = _stage_batches(root, inbox, deltas)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    run_incremental_near_dup(
        stream,
        os.path.join(sf_dir, "documents.parquet"),
        band_store,
        pairs_store,
        threshold=0.2,
    )
    # DISTINCT at read: foreachBatch appends are at-least-once, so a
    # replayed batch may duplicate rows — never produce wrong pairs
    return spark.read.parquet(pairs_store).distinct().orderBy("doc_a", "doc_b")
