"""Oracle parity: every registered (query, oracle) pair must return
identical rows — the local twin of the driver's CORRECTNESS gate
(row count + column names + order-insensitive value comparison).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from inside_vectordb_spark.registry import ORACLES, QUERIES
from tests.conftest import SF_DIR


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def _dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind
    return "i" if k in "iu" else k


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    # The driver's value-hash serializes raw values, so an int64 vs
    # float64 divergence (e.g. DuckDB HUGEINT from sum(CASE...) vs
    # Spark BIGINT) hash-mismatches even when values agree. Pin dtype
    # KIND equality pre-normalization so the local twin predicts it.
    if len(spark_pdf) and len(oracle_pdf):
        for c in sorted(spark_pdf.columns):
            ks, ko = _dtype_kind(spark_pdf[c]), _dtype_kind(oracle_pdf[c])
            assert ks == ko, (
                f"{name}: col {c} dtype-kind {spark_pdf[c].dtype} (spark) vs "
                f"{oracle_pdf[c].dtype} (oracle) — driver hash would mismatch; "
                f"align with CAST in the oracle or .cast() in the query"
            )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                # EXACT, not tolerant: the driver's value hash is
                # byte-level, so ANY raw double difference (an
                # unrounded aggregate straddling the engines'
                # summation orders) is a driver FAIL — a round-to-6
                # + 1e-9 tolerance here (the pre-r7 form) predicted
                # green for exactly the class of divergence the gate
                # exists to catch. The repo convention that makes
                # exactness achievable: every registered float column
                # is rounded in BOTH engines before emission.
                ok = (math.isnan(x) and math.isnan(y)) or x == y
                # -0.0 == +0.0 in IEEE but not in the byte hash
                # (r5 `lineitem_correlations` FAIL) — match sign bits.
                if ok and x == 0.0 and y == 0.0:
                    ok = math.copysign(1.0, x) == math.copysign(1.0, y)
            else:
                ok = (x == y) or (pd.isna(x) and pd.isna(y))
            assert ok, f"{name}: col {c} row {i}: {x!r} != {y!r}"


ORACLE_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, duck, name):
    res = QUERIES[name](spark, SF_DIR).toPandas()
    exp = duck.sql(ORACLES[name]).df()
    assert_frames_match(res, exp, name)


def test_all_queries_run(spark):
    """Rows-only queries (no oracle) must still execute and return a
    stable schema."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"query_id", "doc_id", "score", "rank"}
    assert set(e.oracle_sql()) <= set(e.queries())


def test_signed_zero_serialization_pin(spark, duck):
    """Round-5 driver FAIL root cause, pinned: Spark round(-1.7e-06, 4)
    returns +0.0 where DuckDB returns -0.0; a byte-level value hash
    distinguishes the two even though they compare ==. The fix is
    `round(x, n) + 0.0` on BOTH engines (IEEE: -0.0 + 0.0 = +0.0);
    this test pins (a) the divergence exists unnormalized, and (b) the
    normalization collapses it."""
    import math

    s_raw = spark.sql("SELECT round(CAST(-1.7e-06 AS DOUBLE), 4) AS v").collect()[0].v
    d_raw = duck.sql("SELECT round(CAST(-1.7e-06 AS DOUBLE), 4) AS v").df()["v"][0]
    assert s_raw == 0.0 and d_raw == 0.0
    # the hazard: opposite sign bits (if an engine upgrade removes the
    # divergence this assert flags the pin for retirement, not a bug)
    assert math.copysign(1.0, s_raw) != math.copysign(1.0, float(d_raw))
    s_fix = spark.sql("SELECT round(CAST(-1.7e-06 AS DOUBLE), 4) + 0.0 AS v").collect()[0].v
    d_fix = duck.sql("SELECT round(CAST(-1.7e-06 AS DOUBLE), 4) + 0.0 AS v").df()["v"][0]
    assert math.copysign(1.0, s_fix) == math.copysign(1.0, float(d_fix)) == 1.0


def test_assert_frames_match_rejects_signed_zero():
    """The local gate must predict the driver's byte-level hash: a
    -0.0 vs +0.0 cell pair is a FAIL even though -0.0 == +0.0."""
    a = pd.DataFrame({"v": [0.0]})
    b = pd.DataFrame({"v": [-0.0]})
    with pytest.raises(AssertionError):
        assert_frames_match(a, b, "signed_zero_probe")
    assert_frames_match(a, a.copy(), "signed_zero_same")
