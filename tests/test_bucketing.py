"""Bucketed-join plan property: co-bucketed tables join with ZERO
Exchange — the write-once/join-many layout for repeated query
batches at scale.
"""

from __future__ import annotations

import pytest

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.bucketing import read_bucketed, write_bucketed
from inside_vectordb_spark.plans import count_in_plan
from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, no_broadcast):
    emb = eio.load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    docs = eio.load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    write_bucketed(emb, "t_emb_b", "vec_id", n_buckets=8, sort_cols="vec_id")
    write_bucketed(
        docs.withColumnRenamed("doc_id", "vec_id"),
        "t_docs_b",
        "vec_id",
        n_buckets=8,
        sort_cols="vec_id",
    )
    joined = read_bucketed(spark, "t_emb_b").join(
        read_bucketed(spark, "t_docs_b"), "vec_id"
    )
    assert count_in_plan(joined, "Exchange") == 0, "co-bucketed join must not shuffle"
    # both scans carry bucket metadata
    assert count_in_plan(joined, "Bucketed: true") == 2
    assert joined.count() > 0


def test_bucketed_groupby_has_no_exchange(spark, no_broadcast):
    emb = eio.load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    write_bucketed(emb, "t_emb_g", "vec_id", n_buckets=8)
    agg = read_bucketed(spark, "t_emb_g").groupBy("vec_id").count()
    assert count_in_plan(agg, "Exchange") == 0, "bucket-key groupBy must not shuffle"


def test_overwrite_default_qualified_and_repeated(spark):
    """The stale-dir cleanup resolves the managed location from the
    catalog (advice r10): 'default.t' lives at the warehouse ROOT
    (no default.db segment), so a second overwrite — and one through
    the unqualified spelling of the same table — must not fail on a
    leftover non-empty dir."""
    emb = eio.load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    for name in ("default.t_defq_b", "t_defq_b", "default.T_DefQ_B"):
        write_bucketed(emb, name, "vec_id", n_buckets=4)
        assert read_bucketed(spark, name).count() == emb.count()
    spark.sql("DROP TABLE IF EXISTS t_defq_b")
