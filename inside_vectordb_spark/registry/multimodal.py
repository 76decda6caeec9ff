"""Multimodal registry: binary-column pipelines with full oracles.

The fake payloads are deterministic md5 arithmetic
(``operators/multimodal.py``), so DuckDB can re-derive byte counts,
checksums, and pixel statistics in pure SQL — the binary plumbing
(mapInPandas decode, struct parsing, chunking) is hash-match
verified end to end.

The chunk oracle relies on the synthetic documents being ASCII
(byte offsets == char offsets); the manifest oracle does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.multimodal import (
    chunk_binary,
    decode_image_features,
    with_image_payloads,
)
from inside_vectordb_spark.registry import register


@register(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id, 'text/utf-8' AS modality,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary manifest: payload bytes + typed metadata
    (modality, size, checksum) — the catalog row a multimodal lake
    keeps per asset. Payload here is the utf-8 text bytes; the
    checksum/size are computed ON the binary column."""
    docs = eio.load_table(spark, sf_dir, "documents")
    with_bin = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return with_bin.select(
        "doc_id",
        F.lit("text/utf-8").alias("modality"),
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


@register(
    "image_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(1 + doc_id % 16 AS INT) AS width,
             CAST(1 + (doc_id // 16) % 16 AS INT) AS height,
             CAST(3 AS INT) AS channels
      FROM documents),
    bytes AS (
      SELECT d.doc_id, i.i,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), i.i * 2 + 1, 2))::BIGINT AS b
      FROM documents d CROSS JOIN (SELECT unnest(range(16)) AS i) i),
    agg AS (
      SELECT doc_id, sum(b) AS sum16, list(b ORDER BY i) AS bl
      FROM bytes GROUP BY doc_id),
    n AS (SELECT doc_id, width, height, channels,
                 width * height * channels AS npx FROM dims)
    SELECT n.doc_id, n.width, n.height, n.channels,
           CAST(n.npx AS INT) AS n_pixel_bytes,
           round((CAST(n.npx // 16 AS DOUBLE) * a.sum16
                  + CASE WHEN n.npx % 16 = 0 THEN 0
                         ELSE list_sum(a.bl[1:(n.npx % 16)]) END)
                 / n.npx, 6) AS mean_pixel,
           CAST(CASE WHEN n.npx >= 16 THEN list_max(a.bl)
                ELSE list_max(a.bl[1:n.npx]) END AS INT) AS max_pixel
    FROM n JOIN agg a USING (doc_id)
    """,
)
def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode + feature extraction: build the fake image
    containers, then PARSE them (magic, header struct, pixel buffer)
    in a second mapInPandas stage — the full decode pipeline a real
    image corpus runs, with the codec swapped for a deterministic
    fake. The oracle re-derives every feature from md5 arithmetic."""
    docs = eio.load_table(spark, sf_dir, "documents")
    feats = decode_image_features(with_image_payloads(docs))
    return feats.select(
        "doc_id", "width", "height", "channels", "n_pixel_bytes",
        F.round("mean_pixel", 6).alias("mean_pixel"), "max_pixel",
    )


@register(
    "media_chunks",
    oracle="""
    WITH n AS (
      SELECT doc_id, text, octet_length(encode(text)) AS len
      FROM documents),
    idx AS (
      SELECT doc_id, text, len,
             unnest(range(CAST(ceil(greatest(len, 1) / 64.0) AS BIGINT))) AS ci
      FROM n)
    SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
           CAST(least(64, len - ci * 64) AS INT) AS n_bytes,
           md5(substr(text, CAST(ci * 64 + 1 AS INT), 64)) AS chunk_md5
    FROM idx
    """,
)
def media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size binary chunking with per-chunk checksums (the
    upload/dedup unit for large blobs). Runs on real bytes in the
    UDF; the oracle uses char offsets, valid because the synthetic
    text is ASCII."""
    docs = eio.load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return chunk_binary(blobs, chunk_size=64)


@register(
    "audio_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
             CAST(800 + doc_id % 800 AS INT) AS n_samples
      FROM documents),
    bytes AS (
      SELECT d.doc_id, i.i,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), i.i * 2 + 1, 2))::BIGINT AS b
      FROM documents d CROSS JOIN (SELECT unnest(range(16)) AS i) i),
    agg AS (
      SELECT doc_id, sum(b * b) AS sumsq16, list(b * b ORDER BY i) AS sql_
      FROM bytes GROUP BY doc_id)
    SELECT m.doc_id, m.sample_rate, m.n_samples,
           round(CAST(m.n_samples AS DOUBLE) / m.sample_rate, 6) AS duration_sec,
           round(sqrt((CAST(m.n_samples // 16 AS DOUBLE) * a.sumsq16
                       + CASE WHEN m.n_samples % 16 = 0 THEN 0
                              ELSE list_sum(a.sql_[1:(m.n_samples % 16)]) END)
                      / m.n_samples), 6) AS rms
    FROM dims m JOIN agg a USING (doc_id)
    """,
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second modality through the same binary plumbing: build fake
    audio containers, decode (header struct + sample buffer), extract
    duration + RMS. Sum-of-squares is integer-exact in both engines,
    so even sqrt/round hash-match."""
    from inside_vectordb_spark.operators.multimodal import (
        decode_audio_features,
        with_audio_payloads,
    )

    docs = eio.load_table(spark, sf_dir, "documents")
    feats = decode_audio_features(with_audio_payloads(docs))
    return feats.select(
        "doc_id", "sample_rate", "n_samples",
        F.round("duration_sec", 6).alias("duration_sec"),
        F.round("rms", 6).alias("rms"),
    )


@register(
    "video_frame_sample",
    oracle="""
    WITH n AS (
      SELECT doc_id, text, octet_length(encode(text)) AS len
      FROM documents),
    f AS (
      SELECT doc_id, text, len,
             unnest(range(0, CAST(ceil(greatest(len, 1) / 32.0) AS BIGINT), 4)) AS fi
      FROM n)
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           CAST(least(32, len - fi * 32) AS INT) AS n_bytes,
           md5(substr(text, CAST(fi * 32 + 1 AS INT), 32)) AS frame_md5
    FROM f
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-style sampling: every 4th 32-byte frame of each
    binary stream (the frame-decimation shape of a video ingest
    pipeline; a real one swaps the byte slicer for an ffmpeg-gated
    decoder, same mapInPandas contract). Oracle uses char offsets —
    valid because the synthetic text is ASCII."""
    from inside_vectordb_spark.operators.multimodal import sample_frames

    docs = eio.load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return sample_frames(blobs, frame_size=32, stride=4)
