"""Multimodal (binary) column plumbing for training-data pipelines.

Beyond-reference extension: treat images/audio/video as opaque
``BINARY`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages. The container has no codec libraries, so the
REAL decode step is stubbed behind an import gate
(``decode_image_real``); everything Spark-side — schemas, batch
shapes, UDF signatures, partitioning — is real and tested, and the
deterministic fake payloads are built from md5 arithmetic so even
the decode/feature stage is DuckDB-oracle-checkable.

Payload format (fake image container):

    b"FIMG" | width:uint16be | height:uint16be | channels:uint8 |
    pixels: md5(str(doc_id)).digest() repeated to width*height*channels

with ``width = 1 + doc_id % 16``, ``height = 1 + (doc_id // 16) % 16``,
``channels = 3`` — header fields are pure id arithmetic, pixel stats
are functions of one md5 digest, so SQL can re-derive every feature.

Scale notes: binary columns ride parquet like any other column
(stored inline; at 100 TB you'd point the column at object-store
keys instead and fetch inside the UDF — same plumbing, different
fetch). All stages are narrow maps: no shuffle until an aggregation
asks for one. Arrow batch size bounds executor memory at
O(batch × payload).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"FIMG"
CHANNELS = 3


# ---------------------------------------------------------------------------
# payload build (the "ingest" side: bytes arrive from somewhere)
# ---------------------------------------------------------------------------


def fake_image_payload(doc_id: int) -> bytes:
    """Deterministic fake image container for one doc."""
    w = 1 + doc_id % 16
    h = 1 + (doc_id // 16) % 16
    n = w * h * CHANNELS
    digest = hashlib.md5(str(doc_id).encode("utf-8")).digest()
    pixels = (digest * (n // 16 + 1))[:n]
    return MAGIC + struct.pack(">HHB", w, h, CHANNELS) + pixels


# modality-generic (doc_id, modality, payload) contract shared by the
# image and audio builders — previously named _IMAGE_SCHEMA although
# the audio path reused it (review r8)
_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def with_image_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the fake binary image column: (doc_id, modality,
    payload BINARY). Narrow map, no shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "modality": "image/fake",
                    "payload": [fake_image_payload(int(i)) for i in ids],
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        build, schema=_PAYLOAD_SCHEMA
    )


# ---------------------------------------------------------------------------
# decode / feature extraction
# ---------------------------------------------------------------------------

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_pixel_bytes", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("max_pixel", IntegerType()),
    ]
)


def decode_image_features(images: DataFrame) -> DataFrame:
    """Parse the binary container and extract per-image features —
    the decode/feature-extract stage a real pipeline runs with PIL/
    ffmpeg; here the parse is a real binary decode (struct unpack +
    frombuffer), only the codec is fake."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != MAGIC:
                    raise ValueError(f"bad magic for doc {doc_id}: {buf[:4]!r}")
                if len(buf) < 9:
                    # struct.error carries no doc id — every degenerate
                    # header must fail through the module's diagnostic
                    # path (review r8)
                    raise ValueError(
                        f"doc {doc_id}: truncated image header "
                        f"({len(buf)} bytes, need >= 9)"
                    )
                w, h, c = struct.unpack(">HHB", buf[4:9])
                if w * h * c == 0:
                    raise ValueError(
                        f"doc {doc_id}: degenerate image header "
                        f"(w={w}, h={h}, c={c}) — zero-area payloads have "
                        "no mean/max"
                    )
                pixels = np.frombuffer(buf[9:], dtype=np.uint8)
                if len(pixels) != w * h * c:
                    raise ValueError(
                        f"doc {doc_id}: expected {w * h * c} pixel bytes, got {len(pixels)}"
                    )
                # mean left unrounded: callers round with F.round so
                # the HALF_UP convention matches the SQL oracles
                rows.append(
                    (
                        int(doc_id), w, h, c, len(pixels),
                        float(pixels.mean()), int(pixels.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURE_SCHEMA.fields])

    return images.mapInPandas(decode, schema=_FEATURE_SCHEMA)


def resize_image_stub(images: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage. REAL decode/resize needs a codec library that is
    not in this container — the Spark-side contract (signature,
    schema, batching) is final; the kernel raises until PIL exists."""
    try:  # pragma: no cover - container has no PIL
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires a codec library (PIL) not present in "
            "this container; the mapInPandas plumbing is identical to "
            "decode_image_features with a resample kernel"
        ) from exc
    raise NotImplementedError("real resize kernel lands with the codec")  # pragma: no cover


# ---------------------------------------------------------------------------
# chunking (blob → fixed-size blocks, e.g. for upload/dedup/hashing)
# ---------------------------------------------------------------------------

_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("chunk_md5", StringType()),
    ]
)


def chunk_binary(
    blobs: DataFrame, chunk_size: int = 64, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Split a binary column into fixed-size chunks with per-chunk
    checksums — one row per chunk. Explodes row counts by
    ceil(len/chunk), still a narrow map."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for idx in range(0, max(len(buf), 1), chunk_size):
                    piece = buf[idx : idx + chunk_size]
                    rows.append(
                        (
                            int(doc_id),
                            idx // chunk_size,
                            len(piece),
                            hashlib.md5(piece).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _CHUNK_SCHEMA.fields])

    return blobs.select(
        F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload")
    ).mapInPandas(chunk, schema=_CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# audio (second modality: same plumbing, different container + features)
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"FAUD"


def fake_audio_payload(doc_id: int) -> bytes:
    """Deterministic fake audio container:
    ``b"FAUD" | rate:uint16be | n_samples:uint32be | samples``
    with ``rate = 8000 + (doc_id % 4) * 4000``,
    ``n_samples = 800 + doc_id % 800``, samples = md5 digest repeated
    — every derived feature is md5/id arithmetic, so SQL re-derives it."""
    rate = 8000 + (doc_id % 4) * 4000
    n = 800 + doc_id % 800
    digest = hashlib.md5(str(doc_id).encode("utf-8")).digest()
    samples = (digest * (n // 16 + 1))[:n]
    return AUDIO_MAGIC + struct.pack(">HI", rate, n) + samples


def with_audio_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the fake binary audio column (doc_id, modality, payload).
    Narrow map, no shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "modality": "audio/fake",
                    "payload": [fake_audio_payload(int(i)) for i in ids],
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        build, schema=_PAYLOAD_SCHEMA
    )


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def decode_audio_features(audio: DataFrame) -> DataFrame:
    """Parse the audio container and extract (rate, length, duration,
    RMS amplitude) — the real decode is the struct/frombuffer parse;
    only the codec is fake. Sum-of-squares accumulates in int64, so
    the value is exact and engine-order-independent (oracle parity)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != AUDIO_MAGIC:
                    raise ValueError(f"bad audio magic for doc {doc_id}: {buf[:4]!r}")
                if len(buf) < 10:
                    raise ValueError(
                        f"doc {doc_id}: truncated audio header "
                        f"({len(buf)} bytes, need >= 10)"
                    )
                rate, n = struct.unpack(">HI", buf[4:10])
                if rate == 0 or n == 0:
                    # header fields are ingest-controlled: a zero rate
                    # or sample count must name the doc, not surface
                    # as a ZeroDivisionError task failure (review r8)
                    raise ValueError(
                        f"doc {doc_id}: degenerate audio header "
                        f"(rate={rate}, n={n})"
                    )
                samples = np.frombuffer(buf[10:], dtype=np.uint8)
                if len(samples) != n:
                    raise ValueError(
                        f"doc {doc_id}: expected {n} samples, got {len(samples)}"
                    )
                sq_sum = int((samples.astype(np.int64) ** 2).sum())
                rows.append(
                    (
                        int(doc_id), int(rate), int(n),
                        float(n) / float(rate),
                        float(np.sqrt(sq_sum / n)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_SCHEMA.fields])

    return audio.mapInPandas(decode, schema=_AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling (video analogue: every stride-th fixed-size frame)
# ---------------------------------------------------------------------------

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    blobs: DataFrame,
    frame_size: int = 32,
    stride: int = 4,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Frame sampling: treat a binary stream as fixed-size frames and
    keep every ``stride``-th one (the video keyframe-sampling shape —
    a real pipeline decodes containers with ffmpeg; the slicing,
    batching, and fan-out here are the production plumbing). Emits
    (doc_id, frame_idx, n_bytes, frame_md5); narrow map, row fan-out
    bounded by len/(frame_size·stride)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n_frames = max((len(buf) + frame_size - 1) // frame_size, 1)
                for fi in range(0, n_frames, stride):
                    piece = buf[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        (int(doc_id), fi, len(piece), hashlib.md5(piece).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return blobs.select(
        F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload")
    ).mapInPandas(sample, schema=_FRAME_SCHEMA)
