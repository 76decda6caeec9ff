"""Streaming incremental near-duplicate detection.

Production corpora don't re-dedupe from scratch per crawl: new
documents arrive continuously and must be checked against EVERYTHING
already ingested. This module maintains a persisted MinHash BAND
TABLE (doc_id, band_idx, band_key — the LSH index of the ingested
corpus) and, per micro-batch of new docs:

1. computes the batch's band keys (the same 12-hash / 4-band family
   as the batch operator, `operators/dedup.py`);
2. generates candidates = batch-vs-stored band join ∪ batch-internal
   band self-join (the stored side is a (band_idx)-partitioned
   parquet band table; the delta side broadcasts, so the join is a
   broadcast-hash probe of the stored table — new docs never rescan
   old TEXT, only the O(index) band table);
3. verifies candidates by exact shingle-set Jaccard and appends the
   surviving pairs to the result store;
4. appends the batch's band keys to the band table (the O(delta)
   index maintenance step).

EXACTNESS: the union of pairs across the initial build and all
micro-batches equals the one-shot batch `minhash_near_duplicates`
over the full corpus. Proof shape: a banded pair (a, b) with a
ingested no later than b is emitted exactly when b's batch runs —
a's bands are in the table by then (base build or an earlier append),
b's are in the batch — and batch-internal pairs are covered by the
self-join; no other emission site exists, and the verify filter is
the same exact-Jaccard rule both times. That's why the registered
streaming query can SHARE the batch operator's DuckDB oracle: a green
hash certifies file-stream delivery → per-batch candidate generation
against the maintained index → verification → the batch-identical
pair set.

Delivery contract (same as the CDC merge and sign-LSH upsert
streams): doc ids are disjoint across batches and from the base.
``foreachBatch`` is at-least-once: a batch that crashes between the
two appends and the checkpoint commit can replay, so the stores may
hold duplicate ROWS (never wrong pairs — both sinks are append-only
sets); readers take ``DISTINCT`` (the registered query does), which
makes the pipeline idempotent-at-read, the standard contract for
at-least-once appends. Each drain call uses a caller-suppliable
checkpoint (``checkpoint_dir``) — pass the same directory to resume
an interrupted drain without reprocessing its finished files.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inside_vectordb_spark.operators.dedup import (
    band_pairs,
    minhash_band_keys,
    minhash_signatures,
    ngram_jaccard,
)


def base_near_dup_build(
    base_docs: DataFrame,
    band_store: str,
    pairs_store: str,
    threshold: float = 0.2,
) -> None:
    """Initialize the stores: band table + base-internal verified
    pairs (the one-time full build the stream then maintains)."""
    keys = minhash_band_keys(minhash_signatures(base_docs))
    keys.write.mode("overwrite").partitionBy("band_idx").parquet(band_store)
    cand = band_pairs(keys)
    verified = ngram_jaccard(base_docs, cand).filter(
        F.col("jaccard") >= threshold
    )
    verified.write.mode("overwrite").parquet(pairs_store)


def run_incremental_near_dup(
    delta_stream: DataFrame,
    all_docs_path: str,
    band_store: str,
    pairs_store: str,
    threshold: float = 0.2,
    timeout_sec: int = 300,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain the delta stream with Trigger.AvailableNow, applying the
    incremental near-dup step per micro-batch. ``all_docs_path`` is
    the document table candidates verify against (in production the
    snapshot the ingest also appends to). Pass the same
    ``checkpoint_dir`` to RESUME an interrupted drain (finished files
    are not reprocessed); the default fresh directory is the
    one-shot-fixture mode. Raises TimeoutError if the drain outlives
    ``timeout_sec`` — the query is stopped first, so a timeout never
    leaks a live stream mutating the stores behind the caller."""
    auto_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(
        prefix="ck_", dir=os.path.dirname(band_store) or None
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        keys_new = minhash_band_keys(minhash_signatures(batch_df))
        # materialize the delta's band keys ONCE, on the executors:
        # they feed the old-vs-new join, the internal self-join, and
        # the append. localCheckpoint keeps the materialized blocks
        # executor-side (band keys are O(batch_docs × n_bands) — a
        # driver collect() here would bottleneck every micro-batch at
        # crawl-scale batch sizes); the downstream F.broadcast handles
        # the small-side shipping.
        keys_new = keys_new.localCheckpoint(eager=True)
        stored = spark.read.parquet(band_store)
        cand = band_pairs(stored, keys_new).unionByName(
            band_pairs(keys_new)
        ).distinct()
        # shingle ONLY candidate endpoints — the verify step must not
        # rescan the whole corpus text per micro-batch
        ids = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        docs_needed = spark.read.parquet(all_docs_path).join(
            F.broadcast(ids), "doc_id"
        )
        verified = ngram_jaccard(docs_needed, cand).filter(
            F.col("jaccard") >= threshold
        )
        verified.write.mode("append").parquet(pairs_store)
        keys_new.write.mode("append").partitionBy("band_idx").parquet(band_store)

    q = (
        delta_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        # name the checkpoint so the resume contract is honorable
        # even when the caller used the auto-created default — a
        # fresh-checkpoint retry would replay every inbox file and
        # re-append all band keys and pairs (review r7; same fix as
        # run_upsert_to_sign_index)
        raise TimeoutError(
            f"incremental near-dup drain still running after "
            f"{timeout_sec}s; resume with checkpoint_dir={ckpt!r}"
        )
    # successful one-shot drain: remove the auto-created checkpoint
    # (same rule as run_upsert_to_sign_index — review r8: these used
    # to accumulate ck_* dirs beside band_store forever); a
    # caller-provided checkpoint_dir is the caller's to manage
    if auto_ckpt:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
