"""Generic relational registry: projections, sampling, aggregations,
sorts, set ops, scalar functions (SURVEY.md §2.2-2.7), exercised on
the driver's TPC-H-ish tables exactly as §2's "absent from reference
but required for the oracle checks" note prescribes.

All pure DataFrame API → Catalyst handles pushdown/pruning/broadcast.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.functions.text import token_count
from inside_vectordb_spark.io import QRELS_SQL
from inside_vectordb_spark.registry import register


@register(
    "head_n_docs",
    oracle="""
    SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 10
    """,
)
def head_n_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: deterministic head-N (reference takes the first N corpus
    rows, ``002:133-141``; we order explicitly — limit without order
    is nondeterministic on a cluster)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    return docs.orderBy("doc_id").select("doc_id", "n_chars").limit(10)


@register(
    "seeded_sample",
    oracle="""
    SELECT doc_id FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/O1: deterministic pseudo-random ~1/8 sample via a portable
    hash (md5), replacing the reference's ``random.seed(42)`` +
    ``random.sample`` (``000:308``) with a cluster-stable, rerun-stable
    predicate. (``F.rand(seed)`` is partition-layout-dependent; a
    content hash is not.)"""
    docs = eio.load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    ).select("doc_id")


@register(
    "corpus_subset",
    oracle=f"""
    WITH qrels AS ({QRELS_SQL}),
    rel AS (SELECT DISTINCT doc_id FROM qrels),
    sampled AS (
      SELECT vec_id AS doc_id FROM embeddings
      WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'
    )
    SELECT doc_id FROM rel UNION SELECT doc_id FROM sampled
    """,
)
def corpus_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/J6/SET1: the reference's semantics-preserving subset — ALL
    judged docs ∪ deterministic sample (``000-get_data.py:291-365``)."""
    rel = eio.qrels(spark, sf_dir).select("doc_id").distinct()
    emb = eio.load_table(spark, sf_dir, "embeddings")
    sampled = emb.filter(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) == "0"
    ).select(F.col("vec_id").alias("doc_id"))
    return rel.unionByName(sampled).distinct()


@register(
    "ids_intersect",
    oracle="""
    SELECT doc_id FROM documents WHERE doc_id % 3 = 0
    INTERSECT
    SELECT vec_id AS doc_id FROM embeddings WHERE vec_id % 2 = 0
    """,
)
def ids_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET3: set intersection (coverage check shape, ``000:442-445``)."""
    a = (
        eio.load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    b = (
        eio.load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 2 == 0)
        .select(F.col("vec_id").alias("doc_id"))
    )
    return a.intersect(b)


@register(
    "ids_except",
    oracle="""
    SELECT doc_id FROM documents WHERE doc_id % 3 = 0
    EXCEPT
    SELECT vec_id AS doc_id FROM embeddings WHERE vec_id % 2 = 0
    """,
)
def ids_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET2: set difference (``000-get_data.py:329``).

    ``subtract`` = EXCEPT DISTINCT, matching the oracle even when the
    left side holds duplicates of a value present on the right
    (``exceptAll().distinct()`` would leave a survivor in that case).
    """
    a = (
        eio.load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    b = (
        eio.load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 2 == 0)
        .select(F.col("vec_id").alias("doc_id"))
    )
    return a.subtract(b)


@register(
    "table_counts",
    oracle=f"""
    SELECT (SELECT count(*) FROM documents) AS n_documents,
           (SELECT count(*) FROM embeddings) AS n_embeddings,
           (SELECT count(*) FROM ({QRELS_SQL}) q) AS n_qrels
    """,
)
def table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: dataset statistics (``000-get_data.py:206-210``)."""
    docs = eio.load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_documents")
    )
    emb = eio.load_table(spark, sf_dir, "embeddings").agg(
        F.count("*").alias("n_embeddings")
    )
    qr = eio.qrels(spark, sf_dir).agg(F.count("*").alias("n_qrels"))
    return docs.crossJoin(emb).crossJoin(qr)


@register(
    "avg_relevant_per_query",
    oracle=f"""
    WITH qrels AS ({QRELS_SQL}),
    per_q AS (SELECT query_id, count(*) AS n FROM qrels GROUP BY query_id)
    SELECT round(avg(n), 6) AS avg_relevant FROM per_q
    """,
)
def avg_relevant_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: mean judged docs per query (``000-get_data.py:213-214``)."""
    per_q = eio.qrels(spark, sf_dir).groupBy("query_id").agg(F.count("*").alias("n"))
    return per_q.agg(F.round(F.avg("n"), 6).alias("avg_relevant"))


@register(
    "word_stats",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN trim(text) = '' THEN 0
                  ELSE len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+'), t -> t <> '')) END AS n_words
      FROM documents)
    SELECT min(n_words) AS min_words, max(n_words) AS max_words,
           round(avg(n_words), 6) AS avg_words
    FROM t
    """,
)
def word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/F2: corpus word-length stats (``000-get_data.py:217-228``)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    t = docs.select(token_count("text").alias("n_words"))
    return t.agg(
        F.min("n_words").alias("min_words"),
        F.max("n_words").alias("max_words"),
        F.round(F.avg("n_words"), 6).alias("avg_words"),
    )


@register(
    "relevance_histogram",
    oracle=f"""
    WITH qrels AS ({QRELS_SQL})
    SELECT relevance, count(*) AS n FROM qrels GROUP BY relevance ORDER BY relevance
    """,
)
def relevance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: relevance grade distribution (``000-get_data.py:249-251``)."""
    return (
        eio.qrels(spark, sf_dir)
        .groupBy("relevance")
        .agg(F.count("*").alias("n"))
        .orderBy("relevance")
    )


# mL = 1/ln(M) with M=32 — the reference's HNSW layer constant
# (006-layer_assignment.py:45-69; M at 003-hnswlib_demo.py:33).
_HNSW_M = 32
_ML = 1.0 / math.log(_HNSW_M)


@register(
    "layer_histogram",
    oracle=f"""
    WITH u AS (
      SELECT vec_id,
             ((vec_id::HUGEINT * 2654435761) % 1000003 + 1) / 1000004.0 AS u
      FROM embeddings)
    SELECT CAST(floor(-ln(u) * {_ML!r}) AS INT) AS layer, count(*) AS n
    FROM u GROUP BY layer ORDER BY layer
    """,
)
def layer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/A8: HNSW layer assignment ``floor(-ln(U)·mL)`` and its
    distribution (``006-layer_assignment.py:45-95``). U comes from a
    deterministic Knuth-hash of the id (portable across engines) in
    the oracle-checked variant; the seeded-``F.rand`` variant is
    statistically identical but engine-local."""
    emb = eio.load_table(spark, sf_dir, "embeddings")
    # multiply in DECIMAL(38,0) / HUGEINT: id·2654435761 wraps int64
    # past vec_id ≈ 3.5e9 (negative modulo → NULL layers in Spark,
    # overflow error in DuckDB/ANSI — three behaviors for one query
    # at the scale this file targets) (review r8)
    u = (
        (F.col("vec_id").cast("decimal(38,0)") * 2654435761) % 1000003 + 1
    ).cast("double") / 1000004.0
    return (
        emb.select(
            F.floor(-F.log(u) * F.lit(_ML)).cast("int").alias("layer")
        )
        .groupBy("layer")
        .agg(F.count("*").alias("n"))
        .orderBy("layer")
    )


@register(
    "top_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
)
def top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (global form): ORDER BY + LIMIT — Catalyst plans this as
    TakeOrderedAndProject (heap top-k, no full sort — the fix for the
    reference's O10 full-argsort)."""
    li = eio.load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(20)
    )


@register(
    "doc_concat",
    oracle="""
    SELECT doc_id, concat_ws(' ', lang, text) AS full_text
    FROM documents WHERE doc_id < 50
    """,
)
def doc_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/P2: field concatenation before encoding
    (``001-get_embeddings.py:195-198`` does title‖text; synthetic
    docs have no title → lang‖text)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id", F.concat_ws(" ", "lang", "text").alias("full_text")
    )


@register(
    "doc_truncate",
    oracle="""
    SELECT doc_id, substr(text, 1, 200) AS preview FROM documents WHERE doc_id < 50
    """,
)
def doc_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: display truncation ``text[:200]`` (``000:144``)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id", F.substring("text", 1, 200).alias("preview")
    )


@register(
    "doc_json",
    oracle="""
    SELECT doc_id, to_json({'doc_id': doc_id, 'lang': lang, 'n_chars': n_chars}) AS js
    FROM documents WHERE doc_id < 50
    """,
)
def doc_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: per-row JSON serialization (``000:394-402``)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id", F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("js")
    )


@register(
    "order_date_format",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
    FROM orders WHERE o_orderkey < 100
    """,
)
def order_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: timestamp formatting (``utils.py:127`` report stamps)."""
    o = eio.load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 100).select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("od")
    )


# ---- TPC-H-style analytical queries (generic engine coverage; these
# are also the relational half of bench.py's headline set) -------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation. Partial
    (map-side) aggregation + a 4-group shuffle — the canonical
    'aggregate 100 TB down to a screenful' plan."""
    li = eio.load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            # money sums round to 2 (TPC-H precision): at sf>=0.1 the
            # round-6 digit sits inside cross-engine summation-order
            # noise on these ~1e9-magnitude aggregates
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → grouped
    top-k. customer is broadcast (small side); lineitem never
    shuffles for the join at scale."""
    c = eio.load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = eio.load_table(spark, sf_dir, "orders")
    li = eio.load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star-join through region→nation→supplier into
    the fact table; every dim side broadcasts."""
    r = eio.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = eio.load_table(spark, sf_dir, "nation")
    s = eio.load_table(spark, sf_dir, "supplier")
    li = eio.load_table(spark, sf_dir, "lineitem")
    dims = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(s, s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    pushes to the parquet scan, zero joins, one global agg. The
    canonical pushdown benchmark."""
    li = eio.load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter → star joins → grouped
    top-k by revenue. Dims broadcast; the returnflag filter pushes to
    the lineitem scan so only returned rows join."""
    c = eio.load_table(spark, sf_dir, "customer")
    o = eio.load_table(spark, sf_dir, "orders")
    n = eio.load_table(spark, sf_dir, "nation")
    li = eio.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events table (batch form;
    the Structured Streaming twin lives in ``streaming/events.py``
    and shares this exact aggregation logic)."""
    ev = eio.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionized",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS FIRST, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM w)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via lag + running sum (30-min inactivity gap) —
    the batch twin of streaming session windows. Pure window
    functions; one shuffle on user_id."""
    ev = eio.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full microsecond precision: second-truncated casts would flip
    # session assignment for gaps within 1s of the 30-min boundary
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = marked.withColumn("session_id", F.sum("new_session").over(ws))
    return (
        s.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
        .orderBy("user_id", "session_id")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    residual non-equi condition (late shipment: shipped >60 days
    after order). The semi join hashes on the equi key
    (l_orderkey = o_orderkey) and applies the date inequality as a
    residual filter — no theta join; the date window pushes to the
    orders scan. (Adapted: the synthetic lineitem has no
    commit/receipt dates — reference TPC-H Q4 uses
    l_commitdate < l_receiptdate as the EXISTS predicate.)"""
    o = eio.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = eio.load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_priority_shipments",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q12_priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: large-large equi join + conditional (CASE)
    aggregation. The shipdate window pushes to the lineitem scan,
    shrinking the join's probe side before the shuffle; both CASE
    branches aggregate map-side. (Adapted: synthetic lineitem has no
    l_shipmode — priority classes play its role.)"""
    li = eio.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = eio.load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one-month fact slice, broadcast dim join,
    ratio-of-conditional-sums. part broadcasts (it is tiny relative
    to lineitem at every scale factor where this plan matters);
    the month filter pushes to the scan. (Adapted: synthetic p_type
    is a single token, so the PROMO match is equality, not LIKE.)"""
    li = eio.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = eio.load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a join-side predicate
    (the filter belongs in the ON clause — a WHERE would silently
    drop zero-order customers), per-customer count including zeros,
    then a distribution over the counts. Two shuffles: the outer
    join/count on c_custkey, then a tiny groupBy on the count value.
    (Adapted: synthetic orders has no comment column — the 'special
    requests' exclusion becomes an order-priority predicate.)"""
    c = eio.load_table(spark, sf_dir, "customer")
    o = eio.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey AS cntrycode, count(*) AS numcust,
           round(sum(c.c_acctbal), 6) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 450000.0)
    GROUP BY c.c_nationkey ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (the positive-balance
    mean) applied as a filter, NOT EXISTS decorrelated to a LEFT ANTI
    join against a filtered orders side, grouped by country. The
    scalar lands as a literal via a broadcast nested-loop join of a
    1-row aggregate — no per-row recompute; the anti join hashes on
    o_custkey only, and the totalprice predicate pushes to the orders
    scan, shrinking the anti side before the shuffle. (Adapted:
    synthetic customer has no phone — country code is c_nationkey;
    'customers with no orders at all' is empty on the dense synthetic
    data, so the missing-order predicate is 'no jumbo order'.)"""
    c = eio.load_table(spark, sf_dir, "customer")
    o = eio.load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000.0
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 23:59:59'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: a five-way join with a disjunctive cross-side
    nation-pair predicate. Both nation dims and the supplier/customer
    sides broadcast (small); the lineitem↔orders join is the only
    big-table shuffle, and the shipdate range pushes to the lineitem
    scan. The pair predicate is applied AFTER the nation joins (it
    references both sides), which Catalyst keeps above the joins but
    below the aggregate."""
    s = eio.load_table(spark, sf_dir, "supplier")
    l = eio.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 23:59:59")
    )
    o = eio.load_table(spark, sf_dir, "orders")
    c = eio.load_table(spark, sf_dir, "customer")
    n = eio.load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — a fraction-of-group
    aggregate (conditional sum over total sum) on top of an
    eight-relation join. Every dimension (part, supplier, nation×2,
    region, customer) broadcasts; lineitem↔orders is again the single
    big shuffle. The p_type filter prunes the part broadcast BEFORE
    the join, which in turn shrinks the lineitem side at the join —
    the same semi-join-reduction Catalyst applies via DPP on
    partitioned fact tables."""
    p = eio.load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = eio.load_table(spark, sf_dir, "lineitem")
    s = eio.load_table(spark, sf_dir, "supplier")
    o = eio.load_table(spark, sf_dir, "orders")
    c = eio.load_table(spark, sf_dir, "customer")
    n = eio.load_table(spark, sf_dir, "nation")
    r = eio.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_type = 'ECONOMY'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated by hand into a grouped aggregate +
    broadcast join — the rewrite Catalyst itself applies to
    correlated scalars, made explicit. Scale shape: the per-part
    average is computed only for parts surviving the brand/type
    filter (broadcast semi-join reduction BEFORE the corpus-wide
    groupBy), so the aggregate shuffles a filtered fraction of
    lineitem, keyed by partkey."""
    p = eio.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "ECONOMY")
    )
    l = eio.load_table(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
    thresh = (
        lp.groupBy("l_partkey")
        .agg((0.2 * F.avg("l_quantity")).alias("qty_cap"))
    )
    return (
        lp.join(F.broadcast(thresh.withColumnRenamed("l_partkey", "t_pk")),
                F.col("l_partkey") == F.col("t_pk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
           round(o.o_totalprice, 6) AS total,
           round(sum(l.l_quantity), 6) AS qty_sum
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY total DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING — the qualifying-order
    set (sum(quantity) > 250) computed as a grouped aggregate and
    applied as a LEFT SEMI join before the enrichment joins, so only
    ~1% of orders reach the customer join. orderBy+limit plans as
    TakeOrderedAndProject (per-partition heaps, no full sort)."""
    c = eio.load_table(spark, sf_dir, "customer")
    o = eio.load_table(spark, sf_dir, "orders")
    l = eio.load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            F.round("o_totalprice", 6).alias("total"),
        )
        .agg(F.round(F.sum("l_quantity"), 6).alias("qty_sum"))
        .orderBy(F.desc("total"), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-side predicates. The
    disjunction references both join sides, so it cannot fully push
    below the join — but the single-side implications CAN: the part
    side is pre-filtered to the union of brand/size branches (which
    shrinks the broadcast), and the quantity bound (1..30) pushes to
    the lineitem scan. Catalyst derives neither implication from the
    raw disjunction, so the engine states them explicitly — the
    hand-applied version of the 'predicate weakening' rewrite."""
    branch = [
        ("Brand#15", 1, 10, 1.0, 11.0),
        ("Brand#23", 1, 20, 10.0, 20.0),
        ("Brand#25", 1, 30, 20.0, 30.0),
    ]
    p_side = None
    for b, lo, hi, _, _ in branch:
        c = (F.col("p_brand") == b) & F.col("p_size").between(lo, hi)
        p_side = c if p_side is None else (p_side | c)
    p = eio.load_table(spark, sf_dir, "part").filter(p_side)
    l = eio.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1.0, 30.0)
    )
    full = None
    for b, lo, hi, qlo, qhi in branch:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(lo, hi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        full = c if full is None else (full | c)
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(full)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier (a reusable
    'view' CTE), then the supplier(s) achieving the global maximum —
    the scalar-subquery-on-an-aggregate pattern. Spark: the revenue
    aggregate is computed once and self-crossed with its 1-row max
    (broadcast); equality compares round-6 values on both engines so
    the scalar comparison is engine-stable. At scale the fact scan
    aggregates map-side to 1 row per supplier; the max is a 1-row
    broadcast — no second fact scan."""
    li = eio.load_table(spark, sf_dir, "lineitem")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    sup = eio.load_table(spark, sf_dir, "supplier")
    return (
        sup.join(revenue, sup.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "events_user_journey",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           lead(event_type) OVER w AS next_type,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(cume_dist() OVER w, 6) AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    """,
)
def events_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic window-function family over per-user event
    journeys: lag (inter-event gap), lead (next action), ntile
    (journey quartile), cume_dist — one query exercising frame-less
    ranking/offset functions with a deterministic (ts, event_id)
    order. One shuffle keyed by user_id serves all four functions
    (same window spec — Catalyst computes them in a single Window
    operator)."""
    ev = eio.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l JOIN eur e ON e.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    )
    SELECT e.s_acctbal, e.s_name, e.n_name AS nation, p.p_partkey,
           round(c.unit_cost, 2) AS unit_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN eur e ON e.s_suppkey = c.l_suppkey
    WHERE p.p_type = 'SMALL'
      AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
    ORDER BY e.s_acctbal DESC, nation, e.s_name, p.p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated per-group min + region-restricted
    multi-join): the cheapest EUROPE supplier for each SMALL part,
    unit cost derived from lineitem (the testdata has no partsupp).
    The correlated `= (SELECT min ...)` decorrelates to a window min
    over the cost relation; dims ride broadcasts."""
    s = eio.load_table(spark, sf_dir, "supplier")
    n = eio.load_table(spark, sf_dir, "nation")
    r = eio.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    l = eio.load_table(spark, sf_dir, "lineitem")
    p = eio.load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    eur = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        l.join(F.broadcast(eur.select("s_suppkey")),
               F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        cost.withColumn("pmin", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("pmin"))
    )
    return (
        best.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eur), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_acctbal", "s_name", F.col("n_name").alias("nation"),
            "p_partkey", F.round("unit_cost", 2).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier-nation and order year over a
    LIKE-filtered part set; cost proxied by p_retailprice — no
    partsupp in the testdata). Fact table shuffles once for the
    group-by; every dim is broadcast."""
    l = eio.load_table(spark, sf_dir, "lineitem")
    p = eio.load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = eio.load_table(spark, sf_dir, "supplier")
    o = eio.load_table(spark, sf_dir, "orders")
    n = eio.load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM v
    WHERE round(value, 2) > round(2.0 * (SELECT avg(value) FROM v), 2)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group value vs a global-scalar fraction):
    per-part shipped value for one nation's suppliers, kept only when
    above 2× the nation's mean per-part value (an average-relative
    threshold keeps selectivity scale-independent — a fixed fraction
    of the grand total selects nothing once the part count grows).
    The scalar subquery is a 1-row broadcast (cross join) — the
    grouped relation is computed ONCE and reused for both sides.
    Threshold compared at 2dp on both engines so summation order
    can't flip a boundary row."""
    l = eio.load_table(spark, sf_dir, "lineitem")
    s = eio.load_table(spark, sf_dir, "supplier")
    n = eio.load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        l.join(
            F.broadcast(
                s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
                .select("s_suppkey")
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = v.agg(F.avg("value").alias("__avg"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.round("value", 2) > F.round(2.0 * F.col("__avg"), 2))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0
                                AND s_suppkey IS NOT NULL)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (NOT IN exclusion + COUNT DISTINCT by part
    attributes): distinct suppliers per (brand, type, size) excluding
    the 'complaint' supplier set (negative balance — the testdata has
    no comment column). NOT IN over a non-null key set plans as a
    broadcast anti join; count(DISTINCT) expands via Spark's standard
    two-phase distinct aggregate."""
    l = eio.load_table(spark, sf_dir, "lineitem")
    p = eio.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    # the IS NOT NULL on BOTH sides pins NOT-IN-vs-anti-join
    # semantics: a NULL s_suppkey in the bad set empties a NOT IN
    # result entirely (three-valued logic) while a null-unsafe anti
    # join ignores it (review r9-6) — excluding NULL keys makes the
    # two formulations identical on any data
    bad = (
        eio.load_table(spark, sf_dir, "supplier")
        .filter((F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    WITH promo_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    heavy AS (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM promo_parts)
      GROUP BY 1
      HAVING sum(l.l_quantity) > 1.1 * (
        SELECT avg(qty) FROM (
          SELECT sum(l2.l_quantity) AS qty
          FROM lineitem l2
          WHERE l2.l_partkey IN (SELECT p_partkey FROM promo_parts)
          GROUP BY l2.l_suppkey))
    )
    SELECT s.s_name, s.s_acctbal, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_name
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested semi-join chain): EUROPE suppliers
    whose shipped volume of LIKE-prefixed parts exceeds 1.1× the mean
    per-supplier volume of those parts (availqty proxy — no partsupp).
    Three nesting levels — part set → per-supplier volume → supplier
    filter — each resolving to a semi join / broadcast, the fact
    table scanned once for both the volumes and the mean."""
    l = eio.load_table(spark, sf_dir, "lineitem")
    promo = (
        eio.load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    vols = (
        l.join(F.broadcast(promo), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = vols.agg(F.avg("qty").alias("__avg"))
    heavy = (
        vols.crossJoin(F.broadcast(thr))
        .filter(F.col("qty") > 1.1 * F.col("__avg"))
        .select("l_suppkey")
    )
    s = eio.load_table(spark, sf_dir, "supplier")
    n = eio.load_table(spark, sf_dir, "nation")
    r = eio.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(F.broadcast(heavy), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_5'
      AND l1.l_quantity > 30
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_quantity > 30)
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (correlated EXISTS ∧ NOT EXISTS on the same
    fact): for finished orders, suppliers of NATION_5 who were the
    ONLY heavy line (>30 qty) on a multi-supplier order — lateness
    proxied by quantity (no receipt/commit dates in the testdata).
    The two correlated subqueries become a semi and an anti join on
    (orderkey, suppkey≠), both shuffling only key pairs."""
    l = eio.load_table(spark, sf_dir, "lineitem")
    s = eio.load_table(spark, sf_dir, "supplier")
    n = eio.load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    o = eio.load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        l.filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_suppkey")
        .join(
            F.broadcast(
                s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
                .select("s_suppkey", "s_name")
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(o.select("o_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = l.filter(F.col("l_quantity") > 30).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
