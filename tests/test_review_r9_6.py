"""Regression pins for review batch r9-6 — the cross-engine oracle
parity sweep (canonical tokenizer, NULL-ordering pins, NaN/NULL
normalization, NOT-IN semantics, composite-id overflow)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

DIRTY = [
    "a\x0bb",            # Java \s splits \x0B, RE2 does not — THE class bug
    "\tfoo bar\n",       # trim strips only spaces -> phantom '' tokens
    "  x  ",
    "",
    "\t",
    "one two three",
    "tab\tsep",
    "\x0b",
    "mix \t\n\x0b end",
]


def test_tokenizer_cross_engine_parity_on_dirty_text(spark):
    """tokenize()/token_count() must agree token-for-token with the
    tokenize_sql() DuckDB twin on text the fixtures lack: vertical
    tabs, leading/trailing tabs/newlines, whitespace-only, empty
    (review r9-6: Java \\s includes \\x0B, RE2's does not, and the
    phantom '' token was guarded only in SOME consumers)."""
    from inside_vectordb_spark.functions.text import (
        token_count,
        tokenize,
        tokenize_sql,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DIRTY)], "id long, text string"
    )
    got = {
        r["id"]: (r["toks"], r["n"])
        for r in df.select(
            "id", tokenize("text").alias("toks"), token_count("text").alias("n")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(DIRTY)))
        + ") v(id, text)",
        DIRTY,
    )
    want = {
        r[0]: (r[1], len(r[1]))
        for r in con.execute(
            f"SELECT id, {tokenize_sql('text')} FROM t ORDER BY id"
        ).fetchall()
    }
    assert got == want
    # the canonical rule itself: \x0B is a TOKEN char, no empties ever
    assert got[0][0] == ["a\x0bb"]
    assert got[1][0] == ["foo", "bar"] and got[1][1] == 2
    assert got[4] == ([], 0)


def test_word_shingles_dirty_text_matches_oracle_fragment(spark):
    """The shingle expression over the canonical tokenizer has no
    phantom-''-bearing shingles for leading-tab text."""
    from inside_vectordb_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [(1, "\ta b c d")], "doc_id long, text string"
    )
    rows = df.select(word_shingles("text", 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]


def test_column_correlations_zero_variance_is_null_not_nan(spark):
    """Under ANSI, Spark corr() RAISES on a zero-variance column
    where DuckDB returns NULL — a crash vs a row; the operator
    computes Pearson via try_divide of the sample moments so the
    undefined case is the SQL-standard NULL (review r9-6)."""
    from inside_vectordb_spark.operators.stats import column_correlations

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    rows = column_correlations(df, [("x", "y")]).collect()
    assert rows[0]["pearson_corr"] is None


def test_encode_chunks_overflow_raises(spark):
    """A chunk_id >= 10000 must fail loudly, not silently corrupt the
    NEXT document's id space (review r9-6)."""
    from inside_vectordb_spark.registry.traindata import _encode_chunks

    chunks = spark.createDataFrame(
        [(7, 10000, "text that overflows")],
        "doc_id long, chunk_id int, chunk_text string",
    )
    with pytest.raises(Exception, match="composite chunk id overflow"):
        _encode_chunks(chunks, "doc_id", "chunk_id", "v").collect()


def test_moving_avg_null_ts_parity(spark):
    """Window ORDER BY ts must put a NULL-ts event at the same end on
    both engines (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST —
    the oracle now pins NULLS FIRST, review r9-6)."""
    import pandas as pd

    rows = [
        (1, 10, None, 1.0),
        (2, 10, "2024-01-01 00:00:00", 2.0),
        (3, 10, "2024-01-01 01:00:00", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = {
        r["event_id"]: r["cum"]
        for r in df.select(
            "event_id",
            F.round(
                F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)),
                6,
            ).alias("cum"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, 10, NULL, 1.0), "
        "(2, 10, TIMESTAMP '2024-01-01 00:00:00', 2.0), "
        "(3, 10, TIMESTAMP '2024-01-01 01:00:00', 4.0)"
        ") v(event_id, user_id, ts, value)"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            """SELECT event_id,
                      round(sum(value) OVER (PARTITION BY user_id
                            ORDER BY ts NULLS FIRST, event_id
                            ROWS UNBOUNDED PRECEDING), 6)
               FROM events"""
        ).fetchall()
    }
    assert got == want
    assert got[1] == 1.0  # NULL-ts row is the frame head on BOTH engines
