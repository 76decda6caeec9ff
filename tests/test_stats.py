"""Unit tests: ANALYZE column stats and canonical text normalization."""

from __future__ import annotations

import pytest

from inside_vectordb_spark.functions.text import normalize_text
from inside_vectordb_spark.operators.stats import column_stats


def test_column_stats_hand_check(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "b"), (2, None, "a"), (2, 7.5, None), (3, 7.5, "a")],
        "id long, x double, s string",
    )
    rows = {r.column_name: r for r in column_stats(df).collect()}
    assert rows["id"].n_rows == 4
    assert rows["id"].n_nulls == 0
    assert rows["id"].n_distinct == 3
    assert rows["id"].min_num == 1.0 and rows["id"].max_num == 3.0
    assert rows["id"].min_str is None
    assert rows["x"].n_nulls == 1
    assert rows["x"].n_distinct == 2
    assert rows["x"].min_num == 2.5 and rows["x"].max_num == 7.5
    assert rows["s"].n_nulls == 1
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["s"].min_num is None


def test_column_stats_approx_variant(spark):
    """The 100 TB path: HLL ndv, no Expand — sanity-bounded, not exact."""
    df = spark.range(1000).selectExpr("id", "id % 37 AS m")
    rows = {r.column_name: r for r in column_stats(df, approx=True).collect()}
    assert rows["m"].n_distinct == pytest.approx(37, rel=0.15)
    assert rows["id"].n_distinct == pytest.approx(1000, rel=0.15)


@pytest.mark.parametrize(
    "raw,want",
    [
        ("  Hello\tWorld ", "hello world"),
        ("A\x00B\x1fC", "a b c"),
        ("MiXeD   CaSe\n\nlines", "mixed case lines"),
        ("", ""),
        ("\t \n", ""),
    ],
)
def test_normalize_text(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "t string")
    assert df.select(normalize_text("t").alias("n")).head()["n"] == want


def test_column_stats_non_identifier_names(spark):
    """Review r8: dotted/dashed column names must survive both the
    source aggregation and the generated __-alias references (the r7
    asof_join defect class)."""
    from inside_vectordb_spark.operators.stats import column_stats

    df = spark.createDataFrame(
        [(1.5, "a"), (2.5, None)], "`px.rate` double, `doc-lang` string"
    )
    out = {r["column_name"]: r.asDict() for r in column_stats(df).collect()}
    assert out["px.rate"]["min_num"] == 1.5
    assert out["px.rate"]["max_num"] == 2.5
    assert out["doc-lang"]["n_nulls"] == 1
    assert out["doc-lang"]["min_str"] == "a"


def test_column_correlations_alias_collisions_and_empty(spark):
    """Review r8: pairs whose name concatenations collide
    (('x__y','z') vs ('x','y__z')) must produce distinct measures;
    empty pairs must return an empty typed frame, not stack(0,)."""
    from inside_vectordb_spark.operators.stats import column_correlations

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 3.0), (3.0, 6.0, 1.0)],
        "x__y double, z double, x double",
    )
    out = column_correlations(
        df, [("x__y", "z"), ("x", "z"), ("x__y", "x")]
    ).collect()
    rows = {(r["col_a"], r["col_b"]): r["pearson_corr"] for r in out}
    assert len(rows) == 3
    assert rows[("x__y", "z")] == 1.0 and rows[("x", "z")] == -1.0
    empty = column_correlations(df, [])
    assert empty.count() == 0
    assert empty.columns == ["col_a", "col_b", "pearson_corr", "covariance"]
