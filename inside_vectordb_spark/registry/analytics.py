"""Event-analytics registry: temporal joins, rollups, window frames,
percentiles, vocabulary, and sketches.

Beyond-reference extensions (the reference has no time-series tier);
every SQL-expressible query carries a DuckDB oracle. The as-of and
banded-pair oracles use DuckDB's native ASOF/inequality joins, so
they independently cross-check the Spark formulations (union+window
and bin-bucketed equi-joins respectively) rather than restating them.

Scale notes per query live on the operator docstrings
(``operators/temporal.py``); the registry-level invariant is that
none of these plans contains a theta join, a driver-side loop, or a
Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.temporal import asof_join, banded_pairs
from inside_vectordb_spark.registry import register


@register(
    "events_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, round(l.value, 6) AS click_value,
           r.ts AS asof_ts, round(r.value, 6) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the same user's most
    recent view event at-or-before it (NULL when none). The oracle is
    DuckDB's native ASOF LEFT JOIN — an independent formulation of
    the same semantics."""
    ev = eio.load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.round("value", 6).alias("click_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.round("value", 6).alias("value")
    )
    return asof_join(
        clicks, views, key_col="user_id", ts_col="ts",
        right_cols=["value"], prefix="asof_",
    )


@register(
    "events_cooccurrence",
    oracle="""
    SELECT a.user_id, a.event_id AS event_id_a, b.event_id AS event_id_b,
           round(CAST(epoch_us(b.ts) - epoch_us(a.ts) AS DOUBLE) / 1e6, 6)
               AS gap_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 300 SECONDS
    """,
)
def events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal co-occurrence: ordered pairs of same-user events at
    most 300 s apart. Spark side uses the banded (bin-bucketed)
    self-equi-join; the oracle is the naive inequality join — fine
    for DuckDB at sf0.01, exactly the plan the banded rewrite exists
    to avoid at scale."""
    ev = eio.load_table(spark, sf_dir, "events")
    return banded_pairs(ev, key_col="user_id", ts_col="ts", id_col="event_id", band_sec=300)


@register(
    "events_time_rollup",
    oracle="""
    SELECT CAST(GROUPING_ID(d, h) AS INT) AS grp,
           d AS event_day, h AS event_hour,
           count(*) AS n_events, round(sum(v), 6) AS total_value
    FROM (SELECT strftime(ts, '%Y-%m-%d') AS d,
                 CAST(extract(hour FROM ts) AS INT) AS h,
                 value AS v
          FROM events)
    GROUP BY ROLLUP (d, h)
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: one pass producing
    hour-level, day-level, and grand-total aggregates via ROLLUP
    (grouping sets). At scale this is strictly cheaper than three
    separate aggregations — Spark plans a single shuffle whose
    partial aggregation is shared across levels."""
    ev = eio.load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        F.hour("ts").alias("event_hour"),
        "value",
    )
    return (
        base.rollup("event_day", "event_hour")
        .agg(
            F.grouping_id().cast("int").alias("grp"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select("grp", "event_day", "event_hour", "n_events", "total_value")
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                  FROM events),
    first AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
    act AS (SELECT f.cohort_day,
                   CAST(d.day - f.cohort_day AS INT) AS day_offset,
                   d.user_id
            FROM days d JOIN first f USING (user_id)),
    ret AS (SELECT cohort_day, day_offset,
                   count(DISTINCT user_id) AS n_users
            FROM act GROUP BY 1, 2),
    base AS (SELECT cohort_day, n_users AS cohort_size FROM ret
             WHERE day_offset = 0)
    SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
           r.day_offset, r.n_users, b.cohort_size,
           round(r.n_users * 1.0 / b.cohort_size, 6) AS retention
    FROM ret r JOIN base b ON b.cohort_day = r.cohort_day
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    retention = distinct active users per (cohort, day-offset) over
    the cohort's size — the standard product-analytics rollup.

    Plan shape: distinct (user, day) with map-side partial agg →
    first-touch min keyed on user → count-distinct keyed on
    (cohort, offset); cohort size rides a window PARTITIONED by
    cohort_day (bounded per-cohort frames, no self-join that would
    re-execute the activity subtree, no global window)."""
    ev = eio.load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = days.join(first, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").alias("day_offset"),
        "user_id",
    )
    ret = act.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    w = Window.partitionBy("cohort_day")
    size = F.max(
        F.when(F.col("day_offset") == 0, F.col("n_users"))
    ).over(w)
    return ret.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_users",
        size.alias("cohort_size"),
        F.round(F.col("n_users") / size, 6).alias("retention"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1),
    n AS (SELECT (SELECT count(*) FROM v) AS nv,
                 (SELECT count(*) FROM c) AS nc,
                 (SELECT count(*) FROM p) AS np)
    SELECT 'view' AS stage, nv AS n_users,
           CASE WHEN nv > 0 THEN 1.0 END AS conversion FROM n
    UNION ALL
    SELECT 'click', nc,
           CASE WHEN nv > 0 THEN round(nc * 1.0 / nv, 6) END FROM n
    UNION ALL
    SELECT 'purchase', np,
           CASE WHEN nv > 0 THEN round(np * 1.0 / nv, 6) END FROM n
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: first view → first subsequent click
    → first subsequent purchase per user (strict time order, so a
    click BEFORE any view does not count), with per-stage user counts
    and conversion vs the funnel head.

    Plan shape: three per-user min aggregations chained by join —
    each stage keyed on user_id with map-side partial mins, stage N's
    input pre-filtered by the (already aggregated, user-sized) stage
    N-1 relation; the final stage table is a single 1-row aggregate
    stacked into rows. No window over the event stream at all."""
    ev = eio.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n = (
        v.agg(F.count("*").alias("nv"))
        .crossJoin(c.agg(F.count("*").alias("nc")))
        .crossJoin(p.agg(F.count("*").alias("np")))
    )
    return n.select(
        F.expr(
            """stack(3,
               'view', nv,
                 CASE WHEN nv > 0 THEN CAST(1.0 AS DOUBLE) END,
               'click', nc,
                 CASE WHEN nv > 0
                      THEN round(nc / CAST(nv AS DOUBLE), 6) END,
               'purchase', np,
                 CASE WHEN nv > 0
                      THEN round(np / CAST(nv AS DOUBLE), 6) END)"""
        ).alias("stage", "n_users", "conversion")
    )


@register(
    "events_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts NULLS FIRST, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS mov_avg3,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts NULLS FIRST, event_id
                                  ROWS UNBOUNDED PRECEDING), 6) AS cum_value
    FROM events
    """,
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average (3-row frame) and running total —
    ordered window frames over event time. One shuffle on user_id
    serves both windows (same partitioning + ordering). The window
    orders by (ts, event_id) — (user_id, ts) uniqueness is a fixture
    property, not a schema guarantee, and a row-frame over a
    non-total order hashes nondeterministically on both engines
    (review r8; same tie-break rule as events_sessionized)."""
    ev = eio.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("mov_avg3"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("cum_value"),
    )


@register(
    "doc_length_percentiles",
    oracle="""
    SELECT round(q[1], 6) AS p25, round(q[2], 6) AS p50,
           round(q[3], 6) AS p75, round(q[4], 6) AS p95
    FROM (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) AS q
          FROM documents)
    """,
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles of document length
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``). Exact
    percentile is a full-sort aggregate; the scale path is
    ``percentile_approx`` (t-digest, mergeable map-side) — kept exact
    here because the oracle must hash-match."""
    docs = eio.load_table(spark, sf_dir, "documents")
    q = docs.agg(
        F.expr(
            "percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.95D))"
        ).alias("q")
    )
    return q.select(
        *[
            F.round(F.element_at("q", i + 1), 6).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95"])
        ]
    )


@register(
    "vocab_top_terms",
    oracle="""
    SELECT term, count(*) AS n_occurrences
    FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
          FROM documents) t
    WHERE term <> ''
    GROUP BY term
    ORDER BY n_occurrences DESC, term
    LIMIT 50
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 terms by occurrence (the first step
    of any tokenizer/BPE training run). explode + groupBy: partial
    (map-side) counts shuffle only one row per distinct term per
    partition, so network volume is O(vocab), not O(tokens)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term")
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "term")
        .limit(50)
    )


@register(
    "events_user_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS n_users FROM events
    ORDER BY event_type
    """,
)
def events_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT twin of ``events_user_sketch`` on the hard signal:
    distinct users per event type + the ALL rollup, hash-checkable
    end to end. The HLL sketch query stays registered as the
    documented 100-TB variant (mergeable partials, no distinct-key
    shuffle); ``tests/test_analytics.py`` bounds the sketch against
    THIS result (±5%), so the pair pins both the semantics and the
    approximation contract."""
    ev = eio.load_table(spark, sf_dir, "events")
    typed = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    allr = ev.agg(F.countDistinct("user_id").alias("n_users")).select(
        F.lit("ALL").alias("event_type"), "n_users"
    )
    return typed.unionByName(allr).orderBy("event_type")


@register("events_user_sketch")  # rows-only: HLL estimates have no ANSI-SQL twin
def events_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via Apache
    DataSketches HLL (``hll_sketch_agg``), plus an 'ALL' row computed
    by MERGING the per-type sketches (``hll_union_agg``) — the
    re-aggregation property that makes sketches the 100-TB answer to
    COUNT(DISTINCT): partial sketches combine associatively, so a
    rollup never rescans raw data. Accuracy bound asserted in
    ``tests/test_analytics.py`` (vs exact distinct, ±5%)."""
    ev = eio.load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").cast("long").alias("approx_users")
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
    )
    return typed.unionByName(merged).orderBy("event_type")


@register(
    "events_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(i * 15)
               AS window_start,
           event_type, count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) g
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 1-hour windows every 15 minutes
    (each event contributes to 4 overlapping windows). Spark's
    ``window(ts, '1 hour', '15 minutes')`` expands rows BEFORE the
    partial aggregation, so the shuffle carries per-(window, type)
    partials, not the 4× event fan-out. The oracle derives the same
    epoch-aligned window starts via time_bucket arithmetic."""
    ev = eio.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


@register("doc_length_percentiles_approx")  # rows-only: t-digest has no ANSI twin
def doc_length_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB percentile path: ``percentile_approx`` (mergeable
    t-digest-style sketch, map-side combinable — no full sort).
    Accuracy vs the exact twin asserted in ``tests/test_analytics.py``
    (±5% of the exact value at accuracy=1000)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    q = docs.agg(
        F.percentile_approx(
            "n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)), 1000
        ).alias("q")
    )
    return q.select(
        *[
            F.element_at("q", i + 1).cast("double").alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95"])
        ]
    )


_SKETCH_ENV_ORACLE = """
    SELECT 'doc_length_percentile' AS subject, k AS key,
           round(v, 6) AS exact_value,
           CAST(0.05 AS DOUBLE) AS tol, true AS within_tol
    FROM (SELECT unnest(['p25', 'p50', 'p75', 'p95']) AS k,
                 unnest([quantile_cont(n_chars, 0.25),
                         quantile_cont(n_chars, 0.50),
                         quantile_cont(n_chars, 0.75),
                         quantile_cont(n_chars, 0.95)]) AS v
          FROM documents)
    UNION ALL
    SELECT 'hll_distinct_users' AS subject, event_type AS key,
           round(CAST(count(DISTINCT user_id) AS DOUBLE), 6) AS exact_value,
           CAST(0.05 AS DOUBLE) AS tol, true AS within_tol
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'hll_distinct_users' AS subject, 'ALL' AS key,
           round(CAST(count(DISTINCT user_id) AS DOUBLE), 6) AS exact_value,
           CAST(0.05 AS DOUBLE) AS tol, true AS within_tol
    FROM events
"""


@register("sketch_accuracy_envelope", oracle=_SKETCH_ENV_ORACLE)
def sketch_accuracy_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backs the two sketch queries (r11 verdict #2, the
    reference's tolerance-based acceptance style, ``005:469-487``):
    per subject the row carries the EXACT value — hash-verified
    cross-engine, so the exact twins themselves stay driver-proven —
    and ``within_tol``, which asserts the sketch estimate sits inside
    the pinned relative-error band (±5%) AS DATA. A drifting HLL
    (``hll_sketch_agg`` + merge-for-ALL rollup, the
    ``events_user_sketch`` plan) or approx-percentile
    (``percentile_approx`` accuracy=1000, the
    ``doc_length_percentiles_approx`` plan) flips the boolean and the
    driver hash catches it; the exact arms run only in THIS
    verification row — the sketch queries remain the production
    100-TB paths (mergeable partials, no distinct-key shuffle / no
    full sort)."""
    ev = eio.load_table(spark, sf_dir, "events")
    docs = eio.load_table(spark, sf_dir, "documents")

    # one row per event type, consumed by TWO branches (typed + the
    # merged-ALL rollup) whose differing column pruning defeats
    # ReusedExchange — unpinned, the events scan + agg runs twice
    # (measured: 3 scans → 2, the irreducible per-type + ALL pair)
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    ).localCheckpoint(eager=True)
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("double").alias("approx"),
        F.col("exact").cast("double").alias("exact"),
    )
    allr = (
        per_type.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(ev.agg(F.countDistinct("user_id").alias("exact")))
        .select(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate("sk").cast("double").alias("approx"),
            F.col("exact").cast("double").alias("exact"),
        )
    )
    hll_rows = typed.unionByName(allr).select(
        F.lit("hll_distinct_users").alias("subject"),
        F.col("event_type").alias("key"),
        F.round("exact", 6).alias("exact_value"),
        F.lit(0.05).alias("tol"),
        (F.abs(F.col("approx") - F.col("exact")) <= 0.05 * F.col("exact")).alias(
            "within_tol"
        ),
    )

    ps = [0.25, 0.50, 0.75, 0.95]
    names = F.array(*[F.lit(n) for n in ["p25", "p50", "p75", "p95"]])
    pcts = F.array(*[F.lit(p) for p in ps])
    pct_rows = (
        docs.agg(
            F.percentile("n_chars", pcts).alias("ex"),
            F.percentile_approx("n_chars", pcts, 1000).alias("ap"),
        )
        .select(names.alias("nm"), "ex", "ap")
        .select(F.explode(F.arrays_zip("nm", "ex", "ap")).alias("z"))
        .select(
            F.lit("doc_length_percentile").alias("subject"),
            F.col("z.nm").alias("key"),
            F.round(F.col("z.ex").cast("double"), 6).alias("exact_value"),
            F.lit(0.05).alias("tol"),
            (
                F.abs(F.col("z.ap").cast("double") - F.col("z.ex"))
                <= 0.05 * F.col("z.ex")
            ).alias("within_tol"),
        )
    )
    return pct_rows.unionByName(hll_rows).orderBy("subject", "key")


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 < 2
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample via id-hash predicate — the
    reproducible sampling a data pipeline needs (same rows on every
    engine, every partitioning, every rerun; ``rand(seed)`` is
    partitioning-dependent, which is why the engine samples by hash).
    Pure Catalyst filter: pushes to the scan, zero shuffle, and the
    sampling decision is joinable/auditable from the id alone."""
    from inside_vectordb_spark.operators.traindata import _md5_bucket

    docs = eio.load_table(spark, sf_dir, "documents")
    # the shared portable-hash bucket (empty salt ≡ md5(id) — the
    # same rows as the previous inline form, now one recipe
    # engine-wide; review r8)
    return docs.filter(_md5_bucket(F.col("doc_id"), "", 10) < 2).select(
        "doc_id", "lang", "source"
    )


@register(
    "skewed_join_salted",
    oracle="""
    WITH dim AS (
      SELECT event_type, count(*) AS type_total
      FROM events GROUP BY event_type)
    SELECT e.event_type, d.type_total,
           count(*) AS n_events, round(sum(e.value), 6) AS total_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY 1, 2
    """,
)
def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join under extreme key skew: events carry only 5
    distinct event_type values, so a plain shuffle join degenerates
    to 5 giant tasks at 100 TB. ``salted_equi_join`` spreads each hot
    key over 8 row-deterministic salts (crc32 of event_id) and
    replicates the 5-row dim once per salt. The oracle is the PLAIN
    join + aggregate — pinning that salting is semantics-preserving,
    which is the whole point of registering it."""
    from inside_vectordb_spark.operators.skew import salted_equi_join

    ev = eio.load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_total"))
    joined = salted_equi_join(
        ev, dim, key="event_type", row_col="event_id", n_salts=8
    )
    return joined.groupBy("event_type", "type_total").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


from inside_vectordb_spark.operators.stats import (  # noqa: E402
    column_stats,
    column_stats_oracle_sql,
)

_LINEITEM_LANES = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


@register(
    "lineitem_column_stats",
    oracle=column_stats_oracle_sql("lineitem", _LINEITEM_LANES),
)
def lineitem_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE … FOR COLUMNS as a queryable result: per-column
    count/nulls/exact-ndv/min/max over the fact table in ONE
    aggregation pass (operators/stats.py — CBO's input stats; the
    ``approx=True`` HLL variant is the 100 TB path, the exact form is
    registered because it is bit-stable vs DuckDB)."""
    return column_stats(
        eio.load_table(spark, sf_dir, "lineitem"),
        [c for c, _ in _LINEITEM_LANES],
    )


@register(
    "price_histogram_equiwidth",
    oracle="""
    WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS blo,
                      CAST(max(l_extendedprice) AS DOUBLE) AS bhi
               FROM lineitem),
    binned AS (
      SELECT CASE WHEN b.bhi = b.blo THEN 0
             ELSE CAST(least(9, floor((CAST(l_extendedprice AS DOUBLE) - b.blo)
                                      / ((b.bhi - b.blo) / 10))) AS INT)
             END AS bin, b.blo, b.bhi
      FROM lineitem, b WHERE l_extendedprice IS NOT NULL),
    agg AS (SELECT bin, blo, bhi, count(*) AS cnt
            FROM binned GROUP BY bin, blo, bhi)
    SELECT bin,
           round(blo + bin * (bhi - blo) / 10, 6) AS lo,
           round(blo + (bin + 1) * (bhi - blo) / 10, 6) AS hi,
           cnt
    FROM agg ORDER BY bin
    """,
)
def price_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over the fact table's price column (10
    bins): min/max via a 1-row broadcast agg, then one map-side
    groupBy(bin) — CBO's range-selectivity input
    (operators/stats.py:equi_width_histogram)."""
    from inside_vectordb_spark.operators.stats import equi_width_histogram

    return equi_width_histogram(
        eio.load_table(spark, sf_dir, "lineitem"), "l_extendedprice", n_bins=10
    )


@register(
    "price_histogram_equidepth",
    oracle="""
    WITH t AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, o_orderkey AS id
               FROM orders WHERE o_totalprice IS NOT NULL),
    n AS (SELECT v, ntile(10) OVER (ORDER BY v, id) - 1 AS bin FROM t)
    SELECT bin, round(min(v), 6) AS lo, round(max(v), 6) AS hi,
           count(*) AS cnt
    FROM n GROUP BY bin ORDER BY bin
    """,
)
def price_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram (10 ~equal-count buckets) over order
    totals — the skew-robust CBO histogram; deterministic boundary
    assignment via the (value, unique id) ntile ordering, computed
    with the distributed prefix-rank pattern (range repartition +
    per-partition row_number + broadcast offsets) so no stage sorts
    the whole table on one task; percentile_approx is the registered
    sort-free alternative."""
    from inside_vectordb_spark.operators.stats import equi_depth_histogram

    return equi_depth_histogram(
        eio.load_table(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", n_bins=10
    )


_CMS_BUCKET = (
    "('0x' || substr(md5(t || 'cms' || CAST(r AS VARCHAR)), 1, 8))::BIGINT % 256"
)


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+'), t -> t <> '')) AS t
      FROM documents WHERE trim(text) <> ''),
    tok2 AS (SELECT t FROM tok WHERE t <> ''),
    exact AS (SELECT t, count(*) AS exact_cnt FROM tok2 GROUP BY t),
    top AS (SELECT t, exact_cnt FROM (
      SELECT *, row_number() OVER (ORDER BY exact_cnt DESC, t) AS rn
      FROM exact) WHERE rn <= 20),
    cells AS (
      SELECT r, {_CMS_BUCKET} AS bucket, count(*) AS c
      FROM tok2, unnest([0, 1, 2, 3]) AS u(r)
      GROUP BY 1, 2),
    probes AS (
      SELECT top.t, top.exact_cnt, r, {_CMS_BUCKET} AS bucket
      FROM top, unnest([0, 1, 2, 3]) AS u(r)),
    est AS (
      SELECT p.t, p.exact_cnt, min(c.c) AS cms_estimate
      FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
      GROUP BY 1, 2)
    SELECT t AS term, exact_cnt, cms_estimate FROM est
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (4×256 grid): the mergeable
    frequency sketch whose shuffle is O(d·w) cells regardless of
    corpus or vocabulary size, shown against the exact top-20 counts
    so the overestimate-only guarantee (min over d md5-derived cells
    ≥ true count) is visible in the output. Deterministic md5 hashing
    makes the whole sketch restatable in DuckDB — a FULL value-hash
    oracle over a probabilistic data structure
    (operators/stats.py:cms_heavy_hitters)."""
    from inside_vectordb_spark.operators.stats import cms_heavy_hitters

    return cms_heavy_hitters(
        eio.load_table(spark, sf_dir, "documents"), depth=4, width=256, top_n=20
    )


@register(
    "events_value_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
           round(CASE WHEN s.sd = 0 OR s.sd IS NULL THEN 0.0
                      ELSE (e.value - s.mu) / s.sd END, 6) + 0.0 AS zscore
    FROM events e JOIN s USING (event_type)
    """,
)
def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (the feature-prep standard-
    ization pass): group stats via ONE map-side-combinable groupBy,
    broadcast back into the scan — the corpus itself never shuffles
    (a window over event_type would move every row; the agg+broadcast
    join moves |groups| rows). Degenerate groups (zero/NULL stddev)
    normalize to 0."""
    ev = eio.load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (
        F.when(F.col("sd").isNull() | (F.col("sd") == 0), F.lit(0.0))
        .otherwise((F.col("value") - F.col("mu")) / F.col("sd"))
    )
    return ev.join(F.broadcast(s), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        (F.round(z, 6) + F.lit(0.0)).alias("zscore"),  # signed-zero normalize
    )


@register(
    "events_value_winsorized",
    oracle="""
    WITH p AS (
      SELECT quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events)
    SELECT e.event_id, round(e.value, 6) AS value,
           round(least(greatest(e.value, p.p05), p.p95), 6) AS clipped
    FROM events e CROSS JOIN p
    """,
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to the exact [p05, p95]
    percentiles — both engines use linear-interpolation continuous
    quantiles, pinned by the value hash). The percentile agg is one
    pass to a 1-row broadcast; the clip is a narrow map. The
    approx-percentile twin (`doc_length_percentiles_approx`) is the
    registered sort-free scale path."""
    ev = eio.load_table(spark, sf_dir, "events")
    p = ev.agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    return ev.crossJoin(F.broadcast(p)).select(
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")), 6).alias(
            "clipped"
        ),
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]

# `+ 0.0` normalizes IEEE signed zero on both engines: DuckDB
# round(-1.7e-06, 4) = -0.0 where Spark returns +0.0, and the
# driver's value hash is byte-level (r5 FAIL root cause).
_CORR_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
           round(corr(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), 6) + 0.0 AS pearson_corr,
           round(covar_samp(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), 4) + 0.0 AS covariance
    FROM lineitem"""
    for a, b in _CORR_PAIRS
)


@register("lineitem_correlations", oracle=_CORR_ORACLE)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style pairwise dependency stats over the fact table:
    Pearson corr + sample covariance for 5 numeric column pairs in
    ONE aggregation pass (operators/stats.py:column_correlations) —
    the input a cost model needs to de-correlate conjunctive
    selectivity estimates, and a feature audit publishes before
    training. Cross-engine pinned: both engines' single-pass moment
    algorithms agree inside the per-measure rounding."""
    from inside_vectordb_spark.operators.stats import column_correlations

    return column_correlations(
        eio.load_table(spark, sf_dir, "lineitem"), _CORR_PAIRS
    )


@register(
    "embedding_column_stats",
    oracle="""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    x AS (SELECT CAST(i AS INT) AS pos, v[i + 1] AS x
          FROM e CROSS JOIN range(0, 64) t(i))
    SELECT pos, round(avg(x), 6) + 0.0 AS mean,
           round(sqrt(greatest(0, avg(x * x) - avg(x) * avg(x))), 6) AS std,
           round(min(x), 6) + 0.0 AS min_val, round(max(x), 6) + 0.0 AS max_val
    FROM x GROUP BY pos ORDER BY pos
    """,
)
def embedding_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION statistics of the embedding column (mean,
    population std, min, max per position) — the drift/health monitor
    a vector pipeline runs on every ingest batch (a dimension whose
    distribution shifts signals encoder or preprocessing drift). One
    posexplode + one partial-aggregated groupBy(pos): the shuffle
    carries 64 partial tuples per task regardless of corpus size."""
    from inside_vectordb_spark.functions.vector import as_double_array

    emb = eio.load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(as_double_array(F.col("embedding"))).alias("pos", "x")
    )
    var = F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
    return (
        x.groupBy("pos")
        .agg(
            # + 0.0 on the signed measures: IEEE -0.0 normalization
            (F.round(F.avg("x"), 6) + F.lit(0.0)).alias("mean"),
            F.round(F.sqrt(F.greatest(F.lit(0.0), var)), 6).alias("std"),
            (F.round(F.min("x"), 6) + F.lit(0.0)).alias("min_val"),
            (F.round(F.max("x"), 6) + F.lit(0.0)).alias("max_val"),
        )
        .orderBy("pos")
    )
