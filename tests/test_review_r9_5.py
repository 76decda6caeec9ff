"""Regression pins for review batch r9-5 (skew salting, lm gate
chaining, bucketing locations, grouped labels, registry duplicate
guard, UDTF session-name isolation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_null_row_col_matches_plain_join(spark):
    """crc32(NULL) is NULL — without the coalesce a NULL-id skewed
    row silently fell out of the salted join (review r9-5); the
    docstring's plain-join equivalence must include NULL ids."""
    from inside_vectordb_spark.operators.skew import salted_equi_join

    skewed = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None)],
        "key string, rid int",
    )
    small = spark.createDataFrame([("a", "x"), ("b", "y")], "key string, v string")
    got = salted_equi_join(skewed, small, "key", "rid", n_salts=4)
    want = skewed.join(small, "key")

    def norm(rows):
        return sorted(
            (tuple((x is None, x) for x in r) for r in map(tuple, rows))
        )

    assert norm(got.collect()) == norm(want.collect())


def test_perplexity_gate_chains(spark):
    """Gating an already-gated frame re-scores instead of crashing
    with AMBIGUOUS_REFERENCE on duplicate score columns."""
    from inside_vectordb_spark.operators.lm import perplexity_gate

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zyx qwv unseen tokens only")],
        "doc_id long, text string",
    )
    once = perplexity_gate(docs, max_perplexity=1e9)
    twice = perplexity_gate(once, max_perplexity=1e9)
    assert twice.columns.count("perplexity") == 1
    assert sorted(r["doc_id"] for r in twice.collect()) == sorted(
        r["doc_id"] for r in once.collect()
    )


def test_write_bucketed_qualified_and_mixedcase_names(spark, tmp_path):
    """The stale-warehouse cleanup must target the catalog's actual
    managed location: lowercased names, <db>.db/ subdir for
    qualified names (review r9-5). Overwriting twice across DROP'd
    catalogs is the failing scenario."""
    from inside_vectordb_spark.operators.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    for _ in range(2):  # second overwrite hits the persisted dir
        write_bucketed(df, "bktdb.T_Mixed", "k", n_buckets=4)
    assert read_bucketed(spark, "bktdb.T_Mixed").count() == 100
    # simulate the fresh-session case: catalog forgets, dir persists
    spark.sql("DROP TABLE bktdb.T_Mixed")
    # the managed dir may be gone with the DROP under some catalogs;
    # the overwrite must succeed either way
    write_bucketed(df, "bktdb.T_Mixed", "k", n_buckets=4)
    assert read_bucketed(spark, "bktdb.T_Mixed").count() == 100
    spark.sql("DROP TABLE IF EXISTS bktdb.T_Mixed")
    spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_group_centroids_string_labels(spark):
    """group_col invites arbitrary columns; string labels must work
    and keep their type (review r9-5: int() coercion + IntegerType
    schema crashed in the executor)."""
    from inside_vectordb_spark.operators.grouped import group_centroids

    df = spark.createDataFrame(
        [("en", [1.0, 3.0]), ("en", [3.0, 5.0]), ("de", [2.0, 2.0])],
        "lang string, embedding array<double>",
    )
    rows = group_centroids(df, group_col="lang").collect()
    by = {(r["label"], r["component"]): r for r in rows}
    assert by[("en", 0)]["mean_value"] == 2.0
    assert by[("en", 1)]["mean_value"] == 4.0
    assert by[("de", 0)]["n_vectors"] == 1
    # int labels still work
    dfi = spark.createDataFrame(
        [(1, [2.0]), (1, [4.0])], "label long, embedding array<double>"
    )
    got = group_centroids(dfi).collect()
    assert got[0]["label"] == 1 and got[0]["mean_value"] == 3.0


def test_register_duplicate_raises_not_asserts():
    """Explicit ValueError survives python -O (review r9-5)."""
    from inside_vectordb_spark.registry import QUERIES, register

    name = "__dup_probe__"
    assert name not in QUERIES
    try:
        register(name)(lambda spark, sf: None)
        with pytest.raises(ValueError, match="duplicate query name"):
            register(name)(lambda spark, sf: None)
    finally:
        QUERIES.pop(name, None)


def test_doc_chunks_udtf_isolated_per_call(spark):
    """Per-call unique view/UDTF names (review r9-5): interleaved
    registrations must not re-point an earlier call's lateral join
    at the later call's documents."""
    from inside_vectordb_spark.operators.pyfuncs import doc_chunks_udtf

    a = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "delta")], "doc_id long, text string")
    fa = doc_chunks_udtf(spark, a, width=2)
    fb = doc_chunks_udtf(spark, b, width=2)  # interleaved before fa collects
    rows_a = fa.collect()
    rows_b = fb.collect()
    assert {r["doc_id"] for r in rows_a} == {1}
    assert {r["doc_id"] for r in rows_b} == {2}
    assert {r["chunk_text"] for r in rows_a} == {"alpha beta", "gamma"}
