"""IR evaluation metrics as DataFrame aggregations (SURVEY.md §2.4 A5-A7).

Exact reference semantics preserved (``notebooks/utils.py``):

- Relevance is **membership** in qrels, regardless of grade — even
  grade 0 counts (``002-brute_force_similarity.py:311-314``; P5).
- Recall@K (``utils.py:15-46``): per query |top-K ∩ relevant| /
  |relevant|; queries with zero relevant docs are SKIPPED from the
  mean; 0.0 if no query qualifies.
- Precision@K (``utils.py:49-82``): per query |top-K ∩ relevant| /
  |retrieved@K| (NOT /K — the denominator is what was actually
  retrieved, capped at K); empty retrieval → 0.0; mean over ALL
  searched queries.
- MRR (``utils.py:85-110``): 1/rank of first relevant, 0.0 when no
  relevant doc retrieved; mean over ALL searched queries.

Everything is joins + grouped aggregations — no UDFs, no collect.
The qrels side is small (judgments) → broadcast; the ranked-results
side is k·Q rows. At 100 TB corpus scale these inputs are tiny
(metrics run on search OUTPUT, not the corpus), so this never
becomes a bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_VALUES_RECALL = (1, 5, 10, 20, 50, 100)
K_VALUES_PRECISION = (1, 5, 10)


def _k_dim(topk: DataFrame, k_values: tuple[int, ...]) -> DataFrame:
    """One-row-per-K dimension table built inline (no spark.range —
    stays a local relation, Catalyst folds it into the plan)."""
    return (
        topk.sparkSession.createDataFrame(
            [(int(k),) for k in k_values], "k int"
        )
    )


def _searched(topk: DataFrame) -> DataFrame:
    return topk.select("query_id").distinct()


def _hits(topk: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query_id, rank) for every retrieved row that is relevant —
    J3's inner join. qrels deduped on (query_id, doc_id) because
    relevance grade is ignored (P5)."""
    rel = qrels.select("query_id", "doc_id").distinct()
    return topk.join(F.broadcast(rel), ["query_id", "doc_id"]).select(
        "query_id", "rank"
    )


def recall_at_k(
    topk: DataFrame,
    qrels: DataFrame,
    k_values: tuple[int, ...] = K_VALUES_RECALL,
    round_to: int | None = 6,
) -> DataFrame:
    """Returns (k INT, recall DOUBLE), one row per K, ordered by k —
    ALWAYS one row per K: when no searched query has judgments (the
    skip rule removes everyone) recall is 0.0, the reference's
    documented fallback (``utils.py:15-46``), not an empty frame."""
    n_rel = (
        qrels.groupBy("query_id")
        .agg(F.countDistinct("doc_id").alias("n_relevant"))
    )
    # judged AND searched queries only (the skip rule)
    base = _searched(topk).join(F.broadcast(n_rel), "query_id")
    universe = base.crossJoin(F.broadcast(_k_dim(topk, k_values)))
    hit_counts = (
        _hits(topk, qrels)
        .crossJoin(F.broadcast(_k_dim(topk, k_values)))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.count("*").alias("n_hits"))
    )
    # hit_counts is bounded by Q·K rows by construction — broadcast so
    # the outer join never falls back to sort-merge
    per_query = universe.join(F.broadcast(hit_counts), ["query_id", "k"], "left").select(
        "k",
        (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_relevant")).alias("r"),
    )
    agg = per_query.groupBy("k").agg(F.avg("r").alias("recall"))
    out = (
        _k_dim(topk, k_values)
        .join(F.broadcast(agg), "k", "left")
        .select("k", F.coalesce(F.col("recall"), F.lit(0.0)).alias("recall"))
    )
    if round_to is not None:
        out = out.withColumn("recall", F.round("recall", round_to))
    return out.orderBy("k")


def precision_at_k(
    topk: DataFrame,
    qrels: DataFrame,
    k_values: tuple[int, ...] = K_VALUES_PRECISION,
    round_to: int | None = 6,
) -> DataFrame:
    """Returns (k INT, precision DOUBLE). Denominator is
    |retrieved@K| = count of result rows with rank ≤ K (``utils.py:74-79``)."""
    kd = _k_dim(topk, k_values)
    retrieved = (
        topk.crossJoin(F.broadcast(kd))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.count("*").alias("n_retrieved"))
    )
    hit_counts = (
        _hits(topk, qrels)
        .crossJoin(F.broadcast(kd))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.count("*").alias("n_hits"))
    )
    universe = _searched(topk).crossJoin(F.broadcast(kd))
    per_query = (
        universe.join(F.broadcast(retrieved), ["query_id", "k"], "left")
        .join(F.broadcast(hit_counts), ["query_id", "k"], "left")
        .select(
            "k",
            F.when(F.coalesce(F.col("n_retrieved"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_retrieved")
            )
            .alias("p"),
        )
    )
    out = per_query.groupBy("k").agg(F.avg("p").alias("precision"))
    if round_to is not None:
        out = out.withColumn("precision", F.round("precision", round_to))
    return out.orderBy("k")


def mrr(
    topk: DataFrame, qrels: DataFrame, round_to: int | None = 6
) -> DataFrame:
    """Returns a single row (mrr DOUBLE). 1/first-relevant-rank per
    query, zero-filled for queries with no relevant retrieval."""
    first_hit = (
        _hits(topk, qrels)
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rank"))
    )
    per_query = _searched(topk).join(F.broadcast(first_hit), "query_id", "left").select(
        F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)).alias("rr")
    )
    out = per_query.agg(F.avg("rr").alias("mrr"))
    if round_to is not None:
        out = out.withColumn("mrr", F.round("mrr", round_to))
    return out


def evaluation_report(
    topk: DataFrame,
    qrels: DataFrame,
    k_values_recall: tuple[int, ...] = K_VALUES_RECALL,
    k_values_precision: tuple[int, ...] = K_VALUES_PRECISION,
) -> DataFrame:
    """Long-form metric report: (metric STRING, k INT, value DOUBLE) —
    the relational shape of the reference's nested report JSON
    (``utils.py:113-135``)."""
    r = recall_at_k(topk, qrels, k_values_recall).select(
        F.lit("recall").alias("metric"), "k", F.col("recall").alias("value")
    )
    p = precision_at_k(topk, qrels, k_values_precision).select(
        F.lit("precision").alias("metric"), "k", F.col("precision").alias("value")
    )
    m = mrr(topk, qrels).select(
        F.lit("mrr").alias("metric"), F.lit(None).cast("int").alias("k"),
        F.col("mrr").alias("value"),
    )
    return r.unionByName(p).unionByName(m)


K_VALUES_NDCG = (5, 10, 100)


def ndcg_at_k(
    topk: DataFrame,
    qrels: DataFrame,
    k_values: tuple[int, ...] = K_VALUES_NDCG,
    round_to: int | None = 6,
) -> DataFrame:
    """nDCG@K over the GRADED judgments — the metric the reference's
    qrels carry grades for but its utils never compute (beyond-
    reference member; BEIR's headline metric, Järvelin & Kekäläinen
    gains): per query DCG@K = Σ (2^rel − 1)/log2(rank+1) over judged
    hits, normalized by the ideal DCG of that query's own judgment
    set, mean over searched-and-judged queries (the A5 skip rule).

    Same scale shape as the A5-A7 chain: qrels broadcast, one
    (query,k) aggregate over k·Q rows — metrics run on search OUTPUT,
    never the corpus. Returns (k INT, ndcg DOUBLE) ordered by k.

    Like ``_hits`` (P5), qrels are deduped on (query_id, doc_id)
    first — duplicate judgment rows (merged/updated qrels files)
    would otherwise double-count in BOTH the DCG join and the ideal
    ranking. Grade conflicts resolve to MAX (a doc's strongest
    judgment wins); the oracle restates the same rule."""
    kd = _k_dim(topk, k_values)
    qrels = qrels.groupBy("query_id", "doc_id").agg(
        F.max("relevance").alias("relevance")
    )
    gain = F.pow(F.lit(2.0), F.col("relevance").cast("double")) - F.lit(1.0)
    dcg = (
        topk.join(F.broadcast(qrels), ["query_id", "doc_id"])
        .crossJoin(F.broadcast(kd))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.sum(gain / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"))
    )
    from pyspark.sql import Window

    iw = Window.partitionBy("query_id").orderBy(
        F.desc("relevance"), F.asc("doc_id")
    )
    ideal = (
        qrels.withColumn("__ir", F.row_number().over(iw))
        .crossJoin(F.broadcast(kd))
        .filter(F.col("__ir") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.sum(gain / F.log2(F.col("__ir") + F.lit(1.0))).alias("idcg"))
    )
    # all-grade-0 judgment sets have idcg == 0: skipped, explicitly —
    # ANSI mode (Spark 4 default) makes 0/0 an error, not a null
    base = _searched(topk).join(
        F.broadcast(ideal.filter(F.col("idcg") > 0)), "query_id"
    )
    per_query = base.join(F.broadcast(dcg), ["query_id", "k"], "left").select(
        "k",
        (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("nd"),
    )
    out = per_query.groupBy("k").agg(F.avg("nd").alias("ndcg"))
    if round_to is not None:
        out = out.withColumn("ndcg", F.round("ndcg", round_to))
    return out.orderBy("k")
