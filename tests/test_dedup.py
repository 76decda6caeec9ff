

def test_semantic_dedup_greedy_seniority(spark):
    """Every dropped doc names a lower-id in-cluster witness at or
    above threshold; no surviving doc has a lower-id near-twin."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.semdedup import (
        semantic_dedup_dropped,
        semantic_dedup_pairs,
    )
    from tests.conftest import SF_DIR_MED

    emb = eio.load_table(spark, SF_DIR_MED, "embeddings")
    pairs = semantic_dedup_pairs(emb, threshold=0.35).collect()
    dropped = semantic_dedup_dropped(emb, threshold=0.35).collect()
    assert all(r.sim >= 0.35 and r.doc_a < r.doc_b for r in pairs)
    by_b = {}
    for r in pairs:
        by_b.setdefault(r.doc_b, []).append(r.doc_a)
    assert {r.doc_id for r in dropped} == set(by_b)
    for r in dropped:
        assert r.kept_twin == min(by_b[r.doc_id])
        assert r.kept_twin < r.doc_id


def test_semantic_dedup_cluster_knob_shrinks_pair_stage(spark):
    """Round-5 advisory: n_clusters must be a real knob — raising it
    shrinks the quadratic within-cluster pair stage (Σ C(n_c, 2)
    falls as the corpus spreads over more clusters)."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.semdedup import (
        _default_n_clusters,
        semantic_dedup_pairs,
    )
    from tests.conftest import SF_DIR_MED

    emb = eio.load_table(spark, SF_DIR_MED, "embeddings")
    # threshold=-1 keeps every within-cluster pair → counts the pair
    # stage's input size itself
    # ids at this SF top out below 37*14, so stay under saturation
    coarse = semantic_dedup_pairs(emb, threshold=-1.0, n_clusters=2).count()
    fine = semantic_dedup_pairs(emb, threshold=-1.0, n_clusters=5).count()
    finer = semantic_dedup_pairs(emb, threshold=-1.0, n_clusters=13).count()
    assert coarse > fine > finer > 0
    # the scaled default: ~1 centroid / 10k docs, floored at 16
    assert _default_n_clusters(emb) == max(16, -(-emb.count() // 10_000))


def test_semantic_dedup_raises_on_disjoint_id_space(spark):
    """Advice r6: an id space that never intersects the deterministic
    centroid rule must fail LOUDLY, not silently report zero pairs /
    zero drops (the guard ensure_ivf_det_index already has)."""
    import pytest

    from inside_vectordb_spark.operators.semdedup import (
        SEMDEDUP_COARSE_STRIDE,
        semantic_dedup_pairs,
    )

    # ids ≡ 0 (mod stride): the `id % stride == 1` rule selects none
    emb = spark.createDataFrame(
        [(i * SEMDEDUP_COARSE_STRIDE, [1.0, 0.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="selected no rows"):
        semantic_dedup_pairs(emb, threshold=0.0)
    # an EMPTY corpus is well-defined (no pairs), not an error — a
    # curation stage may legitimately drop every document upstream
    empty = emb.filter("vec_id < 0")
    assert semantic_dedup_pairs(empty, threshold=0.0).count() == 0
