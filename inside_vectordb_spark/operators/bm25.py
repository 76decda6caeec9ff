"""BM25 lexical retrieval over a document corpus.

The reference engine ranks purely by embedding cosine
(``002-exact-search.py``); production retrieval stacks pair that with
a lexical BM25 arm (hybrid retrieval), and a training-data pipeline
uses the same scorer for corpus search/filtering. This implements
Okapi BM25 (the Lucene ``k1``/``b`` variant with the always-positive
``ln(1 + (N - df + .5)/(df + .5))`` idf) as pure DataFrame algebra.

Plan shape — an inverted index expressed relationally:
- The query vocabulary (tiny) is **broadcast** and applied to the
  exploded token stream BEFORE the (doc, term) aggregation — tf and
  df of a surviving term are unchanged by dropping non-query terms,
  so the postings shuffle carries |matching postings|, not
  |corpus postings| (and never document text). For repeated query
  batches over a static corpus, the persisted inverted index
  (``operators/lexical_index.py``) amortizes even the token scan.
- Everything downstream (df, idf, per-term weights) works on that
  restricted list.
- ``df`` per term is a count window over the restricted postings —
  NOT a separate ``groupBy`` + broadcast-back, which would execute
  the whole explode+count chain twice (once to materialize the
  broadcast, once in the main plan; measured 1.5× slower end-to-end
  at sf0.1). The 1-row corpus stats (n_docs, avgdl) come from a
  scalar agg collected to driver literals (no broadcast subplan).
- The document length rides alongside the exploded tokens (constant
  per doc, same scan), so scoring needs NO O(corpus) doc-length
  join; after ``tf`` the only shuffles are the postings-by-term
  window and the final (query, doc) score aggregation — each
  partial-aggregated map-side where applicable.
- Top-k per query: rank window over (query_id), k rows out per query.

At 100 TB the dominant cost is the one explode+count over the corpus
— the same single-pass index build any search engine pays — and it is
embarrassingly parallel; per-query cost scales with posting-list
sizes of the query's terms only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import token_count, tokenize

BM25_K1 = 1.2
BM25_B = 0.75


def okapi_idf(df_col, n_docs: float):
    """Okapi/Lucene idf ``ln(1 + (N - df + .5)/(df + .5))`` — ONE
    implementation shared by the fresh scorer and the persisted-index
    serving path (review r8: the formula lived inline in both, the
    copy-divergence mode review r7 already removed once for rm3)."""
    return F.log(1.0 + (n_docs - df_col + 0.5) / (df_col + 0.5))


def okapi_tf_norm(tf_col, dl_col, avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    """Okapi tf normalization ``tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``."""
    return (tf_col * (k1 + 1)) / (tf_col + k1 * (1 - b + b * dl_col / avgdl))


def doc_token_stream(d: DataFrame):
    """(doc_id, dl, term) token stream with the token array HOISTED
    into its own projection: ``dl`` (= ``token_count`` semantics,
    phantom empties included, all-whitespace → 0) and the explode
    both reference one ``__toks`` alias, so the whitespace split runs
    once per document — an inline ``token_count + explode(tokenize)``
    sibling pair re-evaluates the split per emitted token (the
    engine's documented generator hazard). ``d`` = (doc_id, __t)."""
    toks = d.select("doc_id", F.col("__t"), tokenize(F.col("__t")).alias("__toks"))
    return toks.select(
        "doc_id",
        F.when(F.trim(F.col("__t")) == "", F.lit(0))
        .otherwise(F.size("__toks"))
        .alias("dl"),
        F.explode("__toks").alias("term"),
    )


def corpus_bm25_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[float, float]:
    """(n_docs, avgdl) as driver literals — one scalar-agg job. The
    1-row collect keeps the stats out of the main plan (a broadcast
    subplan would re-scan the corpus inside it); callers running
    multiple BM25 passes (RM3) compute this ONCE and thread it
    through ``stats=``."""
    d = docs.select(F.lower(F.col(text_col)).alias("__t"))
    srow = d.select(token_count(F.col("__t")).alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return float(srow["n_docs"]), float(srow["avgdl"] or 0.0)


def bm25_weighted_scores(
    docs: DataFrame,
    weights: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    score_col: str = "bm25",
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """THE Okapi BM25 aggregation core: ``weights`` is (query_id,
    term, mult) and each term's contribution is scaled by ``mult``.
    Plain BM25 is the mult≡1.0 special case (``bm25_scores``) and
    RM3's rescoring pass is the alpha/relevance-model weighting
    (``rm3.bm25_weighted_topk``) — ONE implementation, so the
    idf/tf-norm formulas cannot diverge between them (review r7,
    which found a ~40-line formula copy in rm3.py).

    Plan discipline: broadcast vocabulary filter BEFORE the (doc,
    term) aggregation (tf/df of surviving terms are unchanged by
    dropping non-matching terms, but the postings shuffle carries
    only matching postings), df as a count window over the restricted
    postings, dl riding the token scan, corpus stats as driver
    literals (``stats`` or one scalar-agg job)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("__t")
    )
    n_docs, avgdl = stats if stats is not None else corpus_bm25_stats(
        docs, id_col, text_col
    )
    # dl rides alongside the exploded tokens (same scan, constant per
    # doc), so no O(corpus) doc-length join is needed downstream
    toks = doc_token_stream(d)
    vocab = weights.select("term").distinct()
    postings = (
        toks.filter(F.col("term") != "")
        .join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    # rows are unique per (doc_id, term), so count(*) over the term
    # partition IS the document frequency
    postings = postings.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )
    scored = postings.join(F.broadcast(weights), "term")
    idf = okapi_idf(F.col("df"), n_docs)
    tf_norm = okapi_tf_norm(F.col("tf"), F.col("dl"), avgdl, k1, b)
    per_term = scored.select(
        "query_id", "doc_id", (idf * tf_norm * F.col("mult")).alias("w")
    )
    return per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("w"), round_to).alias(score_col)
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """(query_id, doc_id, bm25) for every document sharing ≥1 term
    with the query. Tokenization: lowercased whitespace split (the
    engine's reference tokenizer, case-folded). The mult≡1.0 case of
    ``bm25_weighted_scores`` (×1.0 is IEEE-exact, so scores are
    bit-identical to the pre-refactor form)."""
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.lower(F.col(qtext_col)).alias("__qt")
    )
    qterms = q.select(
        "query_id",
        F.explode(F.array_distinct(tokenize(F.col("__qt")))).alias("term"),
    ).filter(F.col("term") != "")
    weights = qterms.withColumn("mult", F.lit(1.0))
    return bm25_weighted_scores(
        docs, weights, k1, b, id_col, text_col, round_to, "bm25", stats
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """Top-k BM25 hits per query: (query_id, doc_id, bm25, rank).
    Ranking happens on the ROUNDED score with doc_id ascending as the
    tie-break, so the result is engine-portable (same contract as the
    cosine top-k operators)."""
    agg = bm25_scores(
        docs, queries, k1, b, id_col, text_col, qid_col, qtext_col, round_to,
        stats,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
