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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import tokenize
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

    def q(name: str) -> F.Column:
        # backtick-quoted: source columns AND the generated __-aliases
        # both inherit any dot/dash in the name, which an unquoted
        # F.col would mis-parse as a nested reference (review r8 —
        # the same defect class asof_join fixed in r7)
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.count(q(c)).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(q(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.countDistinct(q(c)).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.round(F.min(q(c)).cast("double"), 6).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(q(c)).cast("double"), 6).alias(f"__mx_{c}"))
        elif isinstance(dt, (TimestampType, DateType)):
            aggs.append(
                F.round(F.min(q(c)).cast("timestamp").cast("double"), 6).alias(f"__mn_{c}")
            )
            aggs.append(
                F.round(F.max(q(c)).cast("timestamp").cast("double"), 6).alias(f"__mx_{c}")
            )
        else:
            aggs.append(F.min(q(c)).cast("string").alias(f"__mn_{c}"))
            aggs.append(F.max(q(c)).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)

    def entry(c: str) -> F.Column:
        numeric = isinstance(fields[c], (_NUMERIC + (TimestampType, DateType)))
        return F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - q(f"__nn_{c}")).alias("n_nulls"),
            q(f"__nd_{c}").alias("n_distinct"),
            (q(f"__mn_{c}") if numeric else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (q(f"__mx_{c}") if numeric else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (q(f"__mn_{c}") if not numeric else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (q(f"__mx_{c}") if not numeric else F.lit(None).cast("string")).alias(
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


def equi_width_histogram(
    df: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Equi-width histogram: (bin, lo, hi, cnt) with n_bins buckets
    spanning [min, max]. Two passes over one scan shape: a 2-value
    global agg (min/max — map-side partials, 1-row exchange) joined
    as a broadcast literal into the binning scan, then one
    map-side-combinable groupBy(bin). The max value lands in the last
    bin (least-clamp), matching DuckDB/NumPy convention.

    CBO uses exactly this to estimate range-predicate selectivity;
    it is also the ``describe``-style profiling primitive the
    reference prints ad hoc (``001-data_stats.py``)."""
    bounds = df.agg(
        F.min(col).cast("double").alias("__lo"),
        F.max(col).cast("double").alias("__hi"),
    )
    binned = (
        df.select(F.col(col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                F.col("__hi") == F.col("__lo"), F.lit(0)
            )
            .otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (F.col("__v") - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / n_bins)
                    ),
                )
            )
            .cast("int")
            .alias("bin"),
            "__lo",
            "__hi",
        )
    )
    return (
        binned.groupBy("bin", "__lo", "__hi")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bin",
            F.round(
                F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / n_bins,
                6,
            ).alias("lo"),
            F.round(
                F.col("__lo")
                + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / n_bins,
                6,
            ).alias("hi"),
            "cnt",
        )
        .orderBy("bin")
    )


def equi_depth_histogram(
    df: DataFrame, col: str, id_col: str, n_bins: int = 10
) -> DataFrame:
    """Equi-depth (equi-height) histogram: n_bins buckets of ~equal
    row count — the skew-robust variant CBOs prefer for selectivity.
    Bin assignment is exactly SQL ``ntile(n) OVER (ORDER BY value,
    id)`` (the unique-id tie-break makes boundaries deterministic),
    but computed WITHOUT the single-partition global window Spark
    would plan for an empty ``partitionBy``: the global rank comes
    from the distributed prefix-sum pattern — deterministic range
    buckets on the value (``operators/ranks.py``: literal quantile
    boundaries, NOT ``repartitionByRange``, whose per-job sampling
    makes partition membership differ between actions), per-BUCKET
    ``row_number`` (parallel windows), per-bucket counts collected to
    the driver (one long per bucket), prefix-accumulated into rank
    offsets, and broadcast back. One hash shuffle on the bucket id,
    no stage that moves the whole dataset to one task. The sort-free
    approximate alternative is percentile_approx
    (``doc_length_percentiles_approx``)."""
    from inside_vectordb_spark.operators.ranks import global_row_ranks, ntile_expr

    vals = (
        df.select(
            F.col(col).cast("double").alias("__v"), F.col(id_col).alias("__id")
        )
        .filter(F.col("__v").isNotNull())
    )
    ranks, total = global_row_ranks(vals, "__v", "__id")
    return (
        ranks.withColumn("bin", ntile_expr("__rank", total, n_bins).cast("int"))
        .groupBy("bin")
        .agg(
            F.round(F.min("__v"), 6).alias("lo"),
            F.round(F.max("__v"), 6).alias("hi"),
            F.count("*").alias("cnt"),
        )
        .orderBy("bin")
    )


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) heavy hitters: a
    d×w grid of counters — each token increments one md5-derived cell
    per row; a term's estimate is the MIN over its d cells, which can
    only OVERcount (collisions add, never subtract).

    The sketch is the 100 TB frequency structure: the grid aggregation
    has ≤ d·w keys, so the shuffle moves O(d·w·partitions) partial
    cells no matter how large the corpus or vocabulary — unlike the
    exact count, whose shuffle carries every distinct term. The
    registered query outputs (term, exact_cnt, cms_estimate) for the
    exact top-N so the overestimate-only guarantee is visible data,
    not just a docstring claim.
    """
    from inside_vectordb_spark.operators.traindata import _md5_bucket

    def row_hashes(col):
        # ONE builder for the depth-wide (row, bucket) hash array —
        # the sketch is only correct if the fill and probe sides hash
        # identically (same per-row salt, same width); a hand-copied
        # twin block is how they drift (review r8)
        return F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    _md5_bucket(col, f"cms{r}", width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )

    toks = (
        docs.select(
            F.explode(
                tokenize(F.lower(F.col(text_col)))
            ).alias("t")
        )
        .filter(F.col("t") != "")
    )
    cells = (
        toks.select(F.explode(row_hashes(F.col("t"))).alias("cell"))
        .groupBy("cell.r", "cell.bucket")
        .agg(F.count("*").alias("c"))
    )
    top = (
        toks.groupBy("t")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "t")
        .limit(top_n)
    )
    probes = top.select(
        "t",
        "exact_cnt",
        F.explode(row_hashes(F.col("t"))).alias("p"),
    )
    return (
        probes.join(
            F.broadcast(cells),
            (F.col("p.r") == F.col("r")) & (F.col("p.bucket") == F.col("bucket")),
        )
        .groupBy("t", "exact_cnt")
        .agg(F.min("c").alias("cms_estimate"))
        .select(F.col("t").alias("term"), "exact_cnt", "cms_estimate")
    )


def column_correlations(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    round_corr: int = 6,
    round_cov: int = 4,
) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over numeric
    column pairs — the multi-column extension of ``column_stats``
    (ANALYZE-style dependency stats; what a CBO needs to de-correlate
    conjunctive selectivities, and what a feature-engineering pass
    publishes before training). ONE aggregation pass computes every
    pair (map-side partial moments; a single 1-row exchange), then a
    ``stack`` unpivot emits (col_a, col_b, pearson_corr, covariance)
    — no per-pair jobs, no driver round-trips.

    Rounding: corr is dimensionless (|r| ≤ 1) and rounds at 6 dp;
    covariance carries the columns' units (magnitudes up to ~1e4 on
    price-like columns) and rounds at 4 dp so cross-engine summation
    order stays inside the rounding at 100× row counts. Each rounded
    measure adds ``+ 0.0`` to normalize IEEE signed zero: a tiny
    negative input (e.g. covar ≈ -1.7e-06) rounds to +0.0 in Spark
    but -0.0 in DuckDB, and a byte-level value hash distinguishes the
    two; -0.0 + 0.0 = +0.0 collapses both engines to the same bits."""
    if not pairs:
        # stack(0, ...) is a parse error — empty input yields an
        # empty, correctly-typed frame (review r8)
        return df.sparkSession.createDataFrame(
            [], "col_a string, col_b string, pearson_corr double, covariance double"
        )
    aggs = []
    for i, (a, b) in enumerate(pairs):
        # aliases keyed by PAIR INDEX: name-concatenation aliases
        # (__c_{a}__{b}) collide for distinct pairs like ('x__y','z')
        # vs ('x','y__z') (review r8); backtick-quoted sources so
        # dotted names don't parse as nested refs
        x = F.col("`" + a.replace("`", "``") + "`").cast("double")
        y = F.col("`" + b.replace("`", "``") + "`").cast("double")
        # Pearson via try_divide of the sample moments: a zero-variance
        # column makes Spark's corr() RAISE under ANSI (DIVIDE_BY_ZERO)
        # while DuckDB's corr() returns NULL — a crash vs a row
        # (review r9-6). covar_samp/(sx·sy) is algebraically identical
        # to corr (the n−1 factors cancel) and try_divide yields the
        # SQL-standard NULL for the undefined case; the 6-dp rounding
        # absorbs the sqrt(a)·sqrt(b)-vs-sqrt(ab) ulp difference.
        c = F.try_divide(
            F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
        )
        aggs.append(c.alias(f"__c_{i}"))
        aggs.append(F.covar_samp(x, y).alias(f"__v_{i}"))
    row = df.agg(*aggs)

    def lit_str(name: str) -> str:
        return "'" + name.replace("'", "''") + "'"

    cells = ", ".join(
        f"{lit_str(a)}, {lit_str(b)}, round(__c_{i}, {round_corr}) + 0.0, "
        f"round(__v_{i}, {round_cov}) + 0.0"
        for i, (a, b) in enumerate(pairs)
    )
    return row.selectExpr(
        f"stack({len(pairs)}, {cells}) AS (col_a, col_b, pearson_corr, covariance)"
    )
