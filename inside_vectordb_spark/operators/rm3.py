"""RM3 pseudo-relevance-feedback query expansion over BM25.

The classic two-pass retrieval recipe (Lavrenko & Croft relevance
models; the `RM3` variant every Anserini/Pyserini baseline ships):
run BM25, treat the top ``fb_docs`` hits as pseudo-relevant, estimate
a relevance model over their terms, expand the query with the
``fb_terms`` highest-weight new terms, and rescore with the original
terms at weight ``alpha`` and the expansion terms sharing
``1 - alpha``. The reference engine ranks by embedding cosine only;
RM3 is the lexical-arm quality lever hybrid stacks add on top of
BM25 (`operators/bm25.py`), and every stage here is deterministic
arithmetic, so the whole two-pass pipeline restates as one DuckDB
oracle.

Formulation (kept deliberately explicit so the SQL twin is readable):

- relevance-model weight of term t for query q:
  ``rw(q, t) = Σ_{d ∈ fb(q)} (tf_{t,d} / dl_d) · bm25(q, d)``
  — score-weighted maximum-likelihood term distribution over the
  feedback docs, rounded for cross-engine stability;
- expansion set: top ``fb_terms`` terms by (rw desc, term) that are
  NOT original query terms;
- per-term multiplier: ``alpha`` for original terms,
  ``(1 - alpha) · rw / Σ rw`` (normalized over the selected set) for
  expansion terms;
- final score: weighted Okapi BM25 over the expanded term set,
  ranked on the rounded score with doc_id tie-break.

Scale shape: pass 1 is ``bm25_topk`` (broadcast query vocab, postings
shuffle only). The relevance model touches ONLY feedback docs — the
corpus token stream is semi-joined against the broadcast (query ×
fb_docs) id set before any aggregation. Pass 2 is the same
broadcast-vocab BM25 plan with the (slightly larger) expanded
vocabulary and a per-(query, term) multiplier riding the broadcast.
Two corpus scans total, same as running BM25 twice — the persisted
inverted index (`operators/lexical_index.py`) amortizes both at
serving time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import token_count, tokenize
from inside_vectordb_spark.operators.bm25 import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    bm25_weighted_scores,
    corpus_bm25_stats,
)


def _qterms(queries: DataFrame, qid_col: str, qtext_col: str) -> DataFrame:
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.lower(F.col(qtext_col)).alias("__qt")
    )
    return q.select(
        "query_id",
        F.explode(F.array_distinct(tokenize(F.col("__qt")))).alias("term"),
    ).filter(F.col("term") != "")


def rm3_expansion_terms(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 5,
    fb_terms: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """(query_id, term, rw, trank): the selected expansion terms per
    query with their rounded relevance-model weights."""
    fb = bm25_topk(
        docs, queries, fb_docs, k1, b, id_col, text_col, qid_col, qtext_col,
        round_to, stats,
    ).select("query_id", "doc_id", "bm25")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.lower(F.col(text_col))).alias("dl"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    ).filter((F.col("term") != "") & (F.col("dl") > 0))
    # feedback docs only: the (query × fb_docs) id set is tiny, so the
    # corpus token stream prunes against the broadcast before any agg
    fb_tf = (
        toks.join(F.broadcast(fb), "doc_id")
        .groupBy("query_id", "term", "doc_id", "dl", "bm25")
        .agg(F.count("*").alias("tf"))
    )
    rel = fb_tf.groupBy("query_id", "term").agg(
        F.round(
            F.sum(F.col("tf") / F.col("dl") * F.col("bm25")), round_to
        ).alias("rw")
    )
    orig = _qterms(queries, qid_col, qtext_col)
    fresh = rel.join(orig, ["query_id", "term"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("rw"), F.asc("term"))
    return (
        fresh.withColumn("trank", F.row_number().over(w))
        .filter(F.col("trank") <= fb_terms)
    )


def bm25_weighted_topk(
    docs: DataFrame,
    weights: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "rm3",
    round_to: int = 6,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """Weighted-vocabulary BM25 top-k: ``weights`` is (query_id,
    term, mult). Delegates the whole scoring pass to
    ``bm25.bm25_weighted_scores`` — review r7 found this function
    re-implementing the Okapi core formula-for-formula (a k1/b/idf
    fix applied to one would silently diverge the other and break the
    documented 'degrades to alpha-weighted plain BM25' equivalence);
    only the top-k window lives here."""
    agg = bm25_weighted_scores(
        docs, weights, k1, b, id_col, text_col, round_to, score_col, stats
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("doc_id")
    )
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def bm25_rm3_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 10,
    alpha: float = 0.6,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
) -> DataFrame:
    """Two-pass RM3 retrieval: (query_id, doc_id, rm3, rank). A query
    with no feedback hits (or no fresh expansion terms) degrades
    gracefully to alpha-weighted plain BM25. The (n_docs, avgdl)
    corpus stats are computed ONCE and threaded through both passes
    (review r7: each pass re-ran the scalar-agg corpus scan)."""
    stats = corpus_bm25_stats(docs, id_col, text_col)
    exp = rm3_expansion_terms(
        docs, queries, fb_docs, fb_terms, k1, b, id_col, text_col, qid_col,
        qtext_col, round_to, stats,
    )
    # normalization via a bounded per-query window (≤ fb_terms rows
    # per partition), not a self-join that would re-execute the
    # pass-1 subtree
    wq = Window.partitionBy("query_id")
    exp_w = exp.select(
        "query_id",
        "term",
        F.round(
            F.lit(1 - alpha) * F.col("rw") / F.sum("rw").over(wq), round_to
        ).alias("mult"),
    )
    orig_w = _qterms(queries, qid_col, qtext_col).select(
        "query_id", "term", F.lit(float(alpha)).alias("mult")
    )
    # The weight table is query-sized (|Q| × (|q| + fb_terms) rows —
    # the same driver-sized contract as the top-k query-matrix
    # broadcast, operators/topk.py). Materializing it once here means
    # pass 1 executes exactly ONE time; leaving it lazy duplicates
    # the whole feedback subtree into every pass-2 reference (vocab
    # filter + weight join → observed 60 exchanges vs ~20).
    spark = docs.sparkSession
    union_w = orig_w.unionByName(exp_w)
    rows = [
        (r["query_id"], r["term"], r["mult"]) for r in union_w.collect()
    ]
    # schema carried from the plan, not a hard-coded 'query_id long'
    # literal — string/arbitrary query-id types must survive the
    # materialization like every other operator in the lexical arm
    # (review r8)
    weights = spark.createDataFrame(rows, union_w.schema)
    return bm25_weighted_topk(
        docs, weights, k, k1, b, id_col, text_col, "rm3", round_to, stats
    )
