"""connected_components / near_duplicate_clusters.

The cluster-resolution stage LSH dedup needs between verified pairs
and keeper selection: pairs (a,b),(b,c) must collapse to one cluster.
Verified against a pure-Python union-find on randomized graphs, plus
shape cases (chains, separate components, convergence bound).
"""

from __future__ import annotations

import numpy as np
import pytest

from inside_vectordb_spark.operators.dedup import connected_components


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_chain_collapses_to_one_cluster(spark):
    # a-b, b-c, c-d: no pair (a,d) exists, yet all four share a cluster.
    got = _run(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    got = _run(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_direction_and_duplicate_edges_are_irrelevant(spark):
    got = _run(spark, [(5, 3), (3, 5), (5, 3), (9, 5)])
    assert got == {3: 3, 5: 3, 9: 3}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_union_find_on_random_graphs(spark, seed):
    rng = np.random.RandomState(seed)
    n_nodes, n_edges = 60, 45
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    assert _run(spark, edges) == _uf_components(edges)


def test_long_path_converges_within_max_iter(spark):
    # A 40-node path is the adversarial diameter case for min-label
    # propagation; plain propagation needs ~diameter rounds, which
    # max_iter=25 covers via the doubling effect of relabeled sources
    # feeding the next round's min. Verify correctness, not speed.
    edges = [(i, i + 1) for i in range(40)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}


def test_simhash_near_duplicates_planted(spark):
    """Planted near-dups: identical docs collide at hamming 0; a
    one-token edit stays within the radius; unrelated docs don't
    pair. Exhaustiveness: banded candidates find every pair an
    all-pairs scan finds at the same radius (pigeonhole guarantee,
    max_hamming < n_bands)."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.dedup import (
        simhash,
        simhash_near_duplicates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact dup
            (2, base.replace("lazy", "sleepy")),  # near dup
            (3, "completely different words about spark and parquet files"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs).collect()
    }
    assert out[(0, 1)] == 0
    assert all(3 not in p for p in out)
    # exhaustive vs brute force at the same radius
    sig = simhash(docs)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .collect()
    }
    assert set(out) == brute


def test_simhash_near_duplicates_param_guard(spark):
    """max_hamming >= n_bands would silently lose recall — rejected."""
    import pytest

    from inside_vectordb_spark.operators.dedup import simhash_near_duplicates

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_duplicates(docs, max_hamming=4, n_bands=4)
