

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
        assert r.senior_twin == min(by_b[r.doc_id])
        assert r.senior_twin < r.doc_id


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


def test_minhash_k_above_table_size_and_band_divisibility(spark):
    """Review r7: k > the module default must yield a k-wide
    signature (the param table is generated, not sliced), and a
    bands value that doesn't divide k fails loudly instead of
    silently ignoring trailing hashes."""
    import pytest

    from inside_vectordb_spark.operators.dedup import (
        minhash_band_keys,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, shingle_n=3, k=16)
    assert [c for c in sigs.columns if c.startswith("mh")] == [
        f"mh{i}" for i in range(16)
    ]
    # identical docs → identical signatures at any k
    a, b = sigs.orderBy("doc_id").collect()
    assert a[1:] == b[1:]
    keys = minhash_band_keys(sigs, bands=4, k=16)
    assert keys.select("band_idx").distinct().count() == 4
    with pytest.raises(ValueError, match="divide"):
        minhash_band_keys(sigs, bands=5, k=16)


def test_simhash_empty_doc_gets_no_signature(spark):
    """Review r7: '' / whitespace docs must yield NO signature row —
    the phantom md5('') token made every empty doc a near-dup
    candidate of every other."""
    from inside_vectordb_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    assert [r["doc_id"] for r in simhash(docs).collect()] == [1]


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


def test_embedding_near_dup_lsh_recall_envelope(spark):
    """r12 planted-ground-truth envelope: both blocking variants
    (stochastic hyperplanes, det md5-parity planes) recover the
    planted cos≈0.9998 twins at the production threshold; floor bits
    all true, and the planted construction emits NO false pairs (the
    raw fixture has no 0.8-cosine pairs)."""
    from inside_vectordb_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["embedding_near_duplicates_lsh_recall"](
        spark, SF_DIR
    ).collect()
    assert {r["method"] for r in rows} == {"det", "lsh"}
    assert all(r["floor_ok"] for r in rows), rows
    assert all(r["threshold"] == 0.8 for r in rows)
