"""ANALYZE-style table statistics (the catalog-stats operator every
engine needs before a cost-based optimizer can reorder joins or pick
broadcast sides — Spark's ``ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS`` re-expressed as a plain DataFrame so the result is a
queryable, sinkable table rather than catalog-internal state).

Reference analogue: the notebooks print ad-hoc ``df.describe()``-style
summaries of corpus size / relevance distributions
(``001-data_stats.py``); this is that capability generalized to any
table and made oracle-checkable.

Scale notes: everything is ONE aggregation job over a single scan.
``n_distinct`` is exact (``count(distinct col)`` — Spark plans one
Expand ×|cols| then map-side partial aggregates; the shuffle carries
only distinct values per column, not rows). For a 100 TB fact table
pass ``approx=True``: HyperLogLog++ ``approx_count_distinct`` drops
the Expand entirely and the whole pass becomes partial-agg → 1-row
exchange (that variant is not bit-stable vs DuckDB, so the registered
oracle query uses the exact form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType)


def column_stats(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column stats in one pass: (column_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str).

    Numeric columns report min/max in the ``_num`` lanes (DOUBLE,
    rounded to 6); timestamps/dates as epoch seconds in the same
    lanes; strings in the ``_str`` lanes. Output is one row per
    column, ordered by column_name.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = list(fields)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.round(F.min(c).cast("double"), 6).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 6).alias(f"__mx_{c}"))
        elif isinstance(dt, (TimestampType, DateType)):
            aggs.append(
                F.round(F.min(c).cast("timestamp").cast("double"), 6).alias(f"__mn_{c}")
            )
            aggs.append(
                F.round(F.max(c).cast("timestamp").cast("double"), 6).alias(f"__mx_{c}")
            )
        else:
            aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)

    def entry(c: str) -> F.Column:
        numeric = isinstance(fields[c], (_NUMERIC + (TimestampType, DateType)))
        return F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            (F.col(f"__mn_{c}") if numeric else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"__mx_{c}") if numeric else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.col(f"__mn_{c}") if not numeric else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.col(f"__mx_{c}") if not numeric else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        )

    return (
        row.select(F.explode(F.array(*[entry(c) for c in cols])).alias("s"))
        .select("s.*")
        .orderBy("column_name")
    )


def column_stats_oracle_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin: one UNION ALL branch per column. ``cols`` is
    (name, lane) with lane ∈ {'num', 'ts', 'str'}."""
    parts = []
    for c, lane in cols:
        if lane == "num":
            mn = f"round(CAST(min({c}) AS DOUBLE), 6)"
            mx = f"round(CAST(max({c}) AS DOUBLE), 6)"
        elif lane == "ts":
            mn = f"round(epoch(min({c})), 6)"
            mx = f"round(epoch(max({c})), 6)"
        if lane in ("num", "ts"):
            num_sel = f"{mn} AS min_num, {mx} AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
        else:
            num_sel = (
                "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
                f"CAST(min({c}) AS VARCHAR) AS min_str, CAST(max({c}) AS VARCHAR) AS max_str"
            )
        parts.append(
            f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, count(DISTINCT {c}) AS n_distinct, "
            f"{num_sel} FROM {table}"
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"
