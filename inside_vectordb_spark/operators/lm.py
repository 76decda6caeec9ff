"""Unigram language-model quality scoring — the CCNet-shaped LM
filter (Wenzek et al. '19 filter web text by LM perplexity; Gopher/
RefinedWeb keep descendants of the same gate). The production stack
scores with a pretrained KenLM; this is the distributed unigram
estimator of the same quantity — fully computable inside the engine
(train + score are two passes over the corpus, no external model
artifact) and exactly restatable in SQL, which is what makes the
operator hash-verifiable. A KenLM-backed variant would swap only the
per-token log-probability source; the plumbing (token explode,
term-keyed probability join, per-doc aggregate) is identical.

Model: add-alpha smoothed unigram ML estimate over the corpus itself,
p(t) = (cnt(t) + alpha) / (total + alpha * V). Scores per document:
token count, cross-entropy  -mean ln p(t)  (nats), and perplexity
exp(cross-entropy). High perplexity = tokens rare in the corpus =
boilerplate/noise/wrong-language candidates; the filter drops the
high tail exactly like quality_percentile_gate drops the low-quality
tail.

Plan shape: one explode+count builds the unigram table (map-side
partial, (term, cnt) shuffle only); corpus totals ride a 1-row
broadcast; scoring joins doc tokens to the term table (term-keyed)
and reduces per doc — two inherent shuffles, text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import tokenize


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy, perplexity) for every doc
    with at least one token. ``cross_entropy`` is in nats, rounded at
    ``round_to``; perplexity rounds at 4 dp (it exponentiates the
    mean, so it carries larger magnitudes)."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    logp = F.log(
        (F.col("cnt") + F.lit(alpha))
        / (F.col("total") + F.lit(alpha) * F.col("vocab"))
    )
    scored = (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", logp.alias("__lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(-F.avg("__lp"), round_to).alias("cross_entropy"),
        F.round(F.exp(-F.avg("__lp")), 4).alias("perplexity"),
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet's head/middle/tail partitioning (Wenzek et al. '19 §4.4):
    within each source, scored docs split into perplexity terciles —
    'head' (lowest third, cleanest), 'middle', 'tail' — so downstream
    mixes can weight the clean head up without dropping the tail
    outright. Returns one row per (source, bucket): doc count, mean
    and max perplexity.

    Bucket rule is explicit rank arithmetic, not engine ntile():
    rk ≤ ⌊n/3⌋ → head, rk ≤ ⌊2n/3⌋ → middle, else tail, with rk the
    row_number over (rounded perplexity, doc_id) — identical semantics
    in any engine, and ranking on ROUNDED values with an id tie-break
    keeps the assignment cross-engine stable.

    Scale shape: scoring is the two-pass unigram LM (text never
    shuffles); rank + per-source count share ONE (source)-keyed window
    exchange over the tiny scored projection (id, source, ppl). CCNet
    partitions per language — thousands of shards in production — so
    window partitions stay bounded; only the 3-rows-per-source
    aggregate leaves the stage."""
    scores = unigram_lm_scores(docs, id_col, text_col, alpha)
    scored = scores.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")),
        "doc_id",
    )
    w = Window.partitionBy("source")
    rk = F.row_number().over(w.orderBy(F.asc("perplexity"), F.asc("doc_id")))
    n = F.count("*").over(w)
    bucketed = scored.select(
        "source",
        "perplexity",
        F.when(rk <= F.floor(n / 3), F.lit("head"))
        .when(rk <= F.floor(2 * n / 3), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return bucketed.groupBy("source", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("perplexity"), 4).alias("mean_ppl"),
        F.round(F.max("perplexity"), 4).alias("max_ppl"),
    )


def perplexity_gate(
    docs: DataFrame,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """The filter itself: documents whose unigram perplexity is at or
    below the ceiling (CCNet keeps the low-perplexity head). Returns
    the surviving docs with their scores attached. Chaining-safe:
    score columns already present on ``docs`` (a previous gate's
    output) are REPLACED by freshly computed values — without the
    drop, the join produced duplicate ``perplexity`` columns and the
    filter crashed with AMBIGUOUS_REFERENCE (review r9-5)."""
    score_cols = ("n_tokens", "cross_entropy", "perplexity")
    base = docs.drop(*[c for c in score_cols if c in docs.columns])
    scores = unigram_lm_scores(base, id_col, text_col, alpha)
    return (
        base.join(scores.withColumnRenamed("doc_id", id_col), id_col)
        .filter(F.col("perplexity") <= max_perplexity)
    )
