"""Real-dependency branches of the import-gated operators.

The container ships neither hnswlib nor sentence-transformers (and the
build environment does not allow installing them), so these tests
skip cleanly here — but on a cluster image WITH the deps they run the
exact code paths the deterministic twins stand in for, closing the
only remaining never-executed branches (partitioned_ann.py hnswlib
kernel; embed.py sentence-transformers encoder).

Blocker re-verified round 11 (2026-08-16): the package index is
unreachable from this container (pip resolves no distribution for
hnswlib — DNS failure on the index host), and installs remain
prohibited by the environment contract regardless. The vendored NumPy
kernel (operators/hnsw_kernel.py) continues to cover the HNSW
algorithm semantics; only the BINDING-level parity stays untested
in-container."""

from __future__ import annotations

import pytest

from inside_vectordb_spark import io as eio
from tests.conftest import SF_DIR


def test_hnswlib_kernel_matches_vendored_contract(spark):
    """Native hnswlib as the partition kernel must satisfy the same
    output contract and clustered-recall floor as the vendored NumPy
    kernel (which mirrors its algorithm)."""
    pytest.importorskip("hnswlib")
    from inside_vectordb_spark.operators.partitioned_ann import (
        ann_hnsw_partitioned_topk,
    )

    q = eio.query_vectors(spark, SF_DIR)
    c = eio.load_table(spark, SF_DIR, "embeddings")
    out = (
        ann_hnsw_partitioned_topk(q, c, k=10, kernel="hnswlib")
        .orderBy("query_id", "rank")
        .toPandas()
    )
    per_q = out.groupby("query_id")
    assert (per_q.size() == 10).all()
    for _, g in per_q:
        assert list(g["rank"]) == list(range(1, 11))
        assert (g["score"].diff().dropna() <= 1e-9).all()
    # every query's own vector is in the corpus: self must be retrieved
    assert all(
        qid in set(g["doc_id"]) for qid, g in per_q
    ), "hnswlib kernel missed trivial self-neighbors"


def test_sentence_transformer_encoder_plumbing(spark):
    """The real-model branch of encode_documents runs through the same
    mapInPandas plumbing as the hash twin: stable schema, row-aligned
    ids, model-dim embeddings."""
    pytest.importorskip("sentence_transformers")
    from inside_vectordb_spark.operators.embed import encode_documents

    docs = eio.load_table(spark, SF_DIR, "documents").limit(8)
    out = encode_documents(docs, encoder="sentence-transformers").toPandas()
    assert list(out.columns) == ["doc_id", "embedding", "n_tokens"]
    assert len(out) == 8
    dims = {len(e) for e in out["embedding"]}
    assert len(dims) == 1 and dims.pop() > 0
    assert (out["n_tokens"] >= 0).all()


def test_gated_branches_raise_cleanly_when_absent():
    """When the optional deps are absent, forcing their branches must
    fail loudly with an actionable message — not fall through to the
    twin silently."""
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers present; gate not testable")
    except ImportError:
        pass
    from inside_vectordb_spark.operators.embed import (
        _sentence_transformer_encoder,
    )

    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        _sentence_transformer_encoder("any-model")


def test_transform_with_state_twin(spark):
    """Spark-4 transformWithStateInPandas twin of the running
    per-user totals: semantically identical to the oracle-checked
    applyInPandasWithState path. The worker-side state protocol
    needs google.protobuf (not shipped in this container) — skipped
    until the wheel is present, exactly like the hnswlib /
    sentence-transformers branches."""
    from inside_vectordb_spark.streaming.stateful import (
        has_tws_runtime,
        running_user_totals_tws,
    )

    if not has_tws_runtime():
        pytest.skip("google.protobuf absent; transformWithState worker protocol unavailable")

    from pyspark.sql import functions as F

    from inside_vectordb_spark.streaming import read_events_stream, run_to_memory
    from tests.conftest import SF_DIR

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = run_to_memory(
            running_user_totals_tws(read_events_stream(spark, SF_DIR)),
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exp = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    got = {}
    for r in out.collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert got == exp
