"""Multimodal plumbing unit tests (cross-engine math is covered by
the parity suite: multimodal_manifest / image_features / media_chunks
all carry full oracles).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from inside_vectordb_spark.operators.multimodal import (
    MAGIC,
    chunk_binary,
    decode_image_features,
    fake_image_payload,
    resize_image_stub,
    with_image_payloads,
)


def test_payload_deterministic_and_parseable():
    a, b = fake_image_payload(37), fake_image_payload(37)
    assert a == b and a[:4] == MAGIC
    # width=1+37%16=6, height=1+(37//16)%16=3, channels=3 → 54 pixel bytes
    assert len(a) == 4 + 5 + 6 * 3 * 3


def test_decode_roundtrip(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 5, 255]}))
    feats = {r["doc_id"]: r for r in decode_image_features(with_image_payloads(docs)).collect()}
    assert feats[0]["width"] == 1 and feats[0]["height"] == 1 and feats[0]["channels"] == 3
    assert feats[255]["width"] == 16 and feats[255]["height"] == 16
    for r in feats.values():
        assert r["n_pixel_bytes"] == r["width"] * r["height"] * r["channels"]
        assert 0.0 <= r["mean_pixel"] <= 255.0 and 0 <= r["max_pixel"] <= 255


def test_decode_rejects_bad_magic(spark):
    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "modality": ["image/fake"], "payload": [b"JUNKxxxx"]})
    )
    with pytest.raises(Exception, match="bad magic"):
        decode_image_features(bad).collect()


def test_chunking_edges(spark):
    blobs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "payload": [b"a" * 130, b"xy", b""]})
    )
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["n_bytes"], r["chunk_md5"])
         for r in chunk_binary(blobs, chunk_size=64).collect())
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    assert [c[2] for c in by_doc[1]] == [64, 64, 2]  # 130 bytes → 64+64+2
    assert [c[2] for c in by_doc[2]] == [2]
    assert [c[2] for c in by_doc[3]] == [0]  # empty blob → one empty chunk
    assert by_doc[3][0][3] == hashlib.md5(b"").hexdigest()


def test_resize_stub_gated(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(NotImplementedError, match="codec"):
        resize_image_stub(with_image_payloads(docs), 8, 8)


def test_decode_rejects_degenerate_headers(spark):
    """Review r8: zero-area images and zero-rate/zero-sample audio
    must fail through the module's doc-naming ValueError path, never
    as a raw numpy/struct/ZeroDivision task failure."""
    import struct

    from inside_vectordb_spark.operators.multimodal import (
        AUDIO_MAGIC,
        MAGIC,
        decode_audio_features,
    )

    zero_area = MAGIC + struct.pack(">HHB", 0, 5, 3)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "modality": ["image/fake"], "payload": [zero_area]})
    )
    with pytest.raises(Exception, match="doc 7.*degenerate image"):
        decode_image_features(df).collect()
    short = MAGIC + b"\x00\x01"
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [8], "modality": ["image/fake"], "payload": [short]})
    )
    with pytest.raises(Exception, match="doc 8.*truncated image"):
        decode_image_features(df2).collect()
    zero_rate = AUDIO_MAGIC + struct.pack(">HI", 0, 0)
    df3 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "modality": ["audio/fake"], "payload": [zero_rate]})
    )
    with pytest.raises(Exception, match="doc 9.*degenerate audio"):
        decode_audio_features(df3).collect()
