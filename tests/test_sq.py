"""SQ8 scalar-quantization tier: oracle parity is covered by
tests/test_parity.py (ann_sq_topk carries a FULL DuckDB oracle —
unique among the ANN tiers); here we pin retention, the refine knob,
the encode/decode contract, zero-span dims, and stored==fresh
equivalence of the persisted index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.sq import (
    ann_sq_topk,
    sq_decode_col,
    sq_encode_col,
    sq_train,
)
from inside_vectordb_spark.operators.topk import exact_cosine_topk
from tests.conftest import SF_DIR_MED
from tests.test_ann import _recall_vs_exact, _topk_sets

from pyspark.sql import functions as F

K = 10


@pytest.fixture(scope="module")
def exact_sets(spark):
    q = eio.query_vectors(spark, SF_DIR_MED)
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    return _topk_sets(exact_cosine_topk(q, c, k=K))


def test_sq_recall_retention(spark, exact_sets):
    """8-bit codes lose almost nothing: SQ8 + small refine must beat
    the coarser tiers' floor comfortably (measured ≈1.0)."""
    q = eio.query_vectors(spark, SF_DIR_MED)
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    ann = ann_sq_topk(q, c, k=K, refine=5)
    recall = _recall_vs_exact(ann, exact_sets)
    assert recall >= 0.9, f"SQ8 retention {recall:.3f} < 0.9"


def test_sq_refine_sweep_monotone(spark, exact_sets):
    q = eio.query_vectors(spark, SF_DIR_MED)
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    rs = []
    for refine in (1, 2, 8):
        ann = ann_sq_topk(q, c, k=K, refine=refine)
        rs.append(_recall_vs_exact(ann, exact_sets))
    assert rs == sorted(rs), f"refine sweep not monotone: {rs}"


def test_sq_encode_contract(spark):
    """codes: length d, every entry an int in [0, 255]; min/max of
    each dimension map to 0 / 255."""
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    mins, spans = sq_train(c)
    rows = (
        c.select("vec_id", sq_encode_col("embedding", mins, spans).alias("codes"))
        .collect()
    )
    assert len(rows) == c.count()
    mat = np.array([r["codes"] for r in rows])
    assert mat.shape[1] == len(mins)
    assert mat.min() == 0 and mat.max() == 255


def test_sq_decode_bounded_error(spark):
    """Reconstruction error per dimension is bounded by half a bucket
    (span/512), the quantizer's contract."""
    c = eio.load_table(spark, SF_DIR_MED, "embeddings").filter("vec_id < 100")
    mins, spans = sq_train(c)
    enc = c.select(
        "vec_id",
        F.col("embedding").alias("orig"),
        sq_encode_col("embedding", mins, spans).alias("codes"),
    )
    dec = enc.select("vec_id", "orig", sq_decode_col("codes", mins, spans).alias("dv"))
    for r in dec.collect():
        err = np.abs(np.array(r["orig"], dtype=np.float64) - np.array(r["dv"]))
        assert (err <= spans / 512.0 + 1e-12).all()


def test_sq_zero_span_dim(spark):
    """A constant dimension encodes to 0 and reconstructs exactly."""
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[1.0, 5.0], [2.0, 5.0], [3.0, 5.0]],
        }
    )
    df = spark.createDataFrame(pdf)
    mins, spans = sq_train(df)
    assert spans[1] == 0.0
    rows = (
        df.select(sq_decode_col(sq_encode_col("embedding", mins, spans), mins, spans).alias("dv"))
        .collect()
    )
    for r in rows:
        assert r["dv"][1] == 5.0


def test_sq_indexed_matches_fresh(spark, tmp_path):
    """Deterministic training ⇒ persisted-index search returns exactly
    the fresh-build results."""
    from inside_vectordb_spark.operators.ann_index import (
        ann_sq_topk_indexed,
        build_sq_index,
    )

    q = eio.query_vectors(spark, SF_DIR_MED)
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    fresh = {
        (r.query_id, r.doc_id, r.rank)
        for r in ann_sq_topk(q, c, k=K, refine=5).collect()
    }
    path = str(tmp_path / "sq_idx")
    build_sq_index(c, path)
    stored = {
        (r.query_id, r.doc_id, r.rank)
        for r in ann_sq_topk_indexed(q, c, path, k=K, refine=5).collect()
    }
    assert fresh == stored


def test_sq_delete_tombstones(spark, tmp_path):
    """FAISS remove_ids analogue: deleted ids vanish from results,
    survivors' ranking equals a fresh search over the filtered corpus,
    and re-deleting is idempotent (no tombstone growth)."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.ann_index import (
        ann_sq_topk_indexed,
        build_sq_index,
        delete_from_sq_index,
        deleted_ids,
    )

    q = eio.query_vectors(spark, SF_DIR_MED)
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    path = str(tmp_path / "sq_del")
    build_sq_index(c, path)
    dels = [5, 7, 11]
    delete_from_sq_index(spark, path, dels)
    got = ann_sq_topk_indexed(q, c, path, k=K, refine=5).collect()
    assert not {r.doc_id for r in got} & set(dels)
    # equivalent to searching an index built WITHOUT the deleted rows
    # (stats still train on the full corpus, matching frozen-at-build)
    from inside_vectordb_spark.operators.sq import ann_sq_topk, sq_train

    stats = sq_train(c, "embedding")
    filtered = c.filter(~F.col("vec_id").isin(dels))
    want = {
        (r.query_id, r.doc_id, r.rank)
        for r in ann_sq_topk(q, filtered, k=K, refine=5, stats=stats).collect()
    }
    assert {(r.query_id, r.doc_id, r.rank) for r in got} == want
    # idempotency
    delete_from_sq_index(spark, path, dels)
    assert deleted_ids(spark, path) == set(dels)


def test_sq_rebuild_clears_tombstones(spark, tmp_path):
    """A rebuild starts a fresh index lifecycle: tombstones from the
    previous index must NOT survive into the rebuilt one (deletes are
    compacted away by the rebuild — the contract delete_from_sq_index
    documents)."""
    from inside_vectordb_spark.operators.ann_index import (
        ann_sq_topk_indexed,
        build_sq_index,
        delete_from_sq_index,
        deleted_ids,
    )

    q = eio.query_vectors(spark, SF_DIR_MED)
    c = eio.load_table(spark, SF_DIR_MED, "embeddings")
    path = str(tmp_path / "sq_rebuild")
    build_sq_index(c, path)
    delete_from_sq_index(spark, path, [5, 7])
    assert deleted_ids(spark, path) == {5, 7}
    meta = build_sq_index(c, path)  # rebuild (e.g. changed corpus)
    assert deleted_ids(spark, path) == set()
    assert "n_deleted" not in meta
    got_ids = {
        r.doc_id
        for r in ann_sq_topk_indexed(q, c, path, k=K, refine=5).collect()
    }
    # queries 5 and 7 retrieve themselves again post-rebuild
    assert {5, 7} <= got_ids
