

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
