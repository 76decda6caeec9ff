"""TF-IDF cosine retrieval — the classic lexical vector-space scorer
(Salton's SMART ltc weighting with sklearn's smooth idf), completing
the lexical arm next to BM25 (``operators/bm25.py``).

Weighting (cross-engine pinned in the DuckDB oracle):

- ``idf(t) = ln((1 + N) / (1 + df(t))) + 1`` (smooth — never zero,
  defined even for unseen terms);
- ``w(t, x) = (1 + ln(tf)) * idf(t)`` (sublinear tf);
- documents AND queries L2-normalized over their FULL term sets, so
  the score is a true cosine in tf-idf space (bounded by 1, directly
  comparable across queries — what the hybrid-fusion stage wants).

Plan shape vs BM25: BM25 only needs df for the query's terms, so its
postings restrict FIRST. Cosine tf-idf needs every document's norm
over its full vocabulary, which is why real engines precompute norms
at index time — here that is the ``dft`` aggregate (the dictionary:
one map-side-combinable shuffle of (term, df)) plus one doc-keyed
window for the norms; both are single passes over the postings and
both are the index-build cost a 100 TB deployment pays once and
persists. The per-query cost still touches only the query terms'
postings (broadcast vocabulary restriction before scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import tokenize


def smooth_idf(df_col, n_docs: float):
    """sklearn's smooth idf ``ln((1+N)/(1+df)) + 1`` — never zero,
    defined for unseen terms. ONE implementation (review r8: the
    formula existed inline in four places across this module and the
    persisted-index serving paths)."""
    return F.log((1.0 + n_docs) / (1.0 + df_col)) + 1.0


def tfidf_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
) -> DataFrame:
    """(query_id, doc_id, tfidf) — cosine of the tf-idf vectors, for
    every document sharing ≥1 term with the query."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("__t")
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.lower(F.col(qtext_col)).alias("__qt")
    )
    toks = d.select("doc_id", F.explode(tokenize(F.col("__t"))).alias("term"))
    from pyspark import StorageLevel

    # ONE postings materialization: the old dft-groupBy-join-back and
    # the query-restricted dictionary each re-executed the whole
    # explode+count subtree (the pattern bm25.py documents measuring
    # 1.5× slower); df is a count window over the persisted postings
    # and the query dictionary reads the same cache (review r8).
    # Cosine tf-idf inherently needs the FULL postings (norms over
    # every doc term) — the persisted-index path is the production
    # form; this fresh form pays the pass once, not three times.
    # The persist is NOT unpersisted here: the returned DataFrame
    # consumes it lazily, so the only safe release point is after the
    # caller's action. Spark evicts the blocks LRU (MEMORY_AND_DISK);
    # correctness never depends on the persist (advisory r9 — the
    # dedup.py per-site-documentation discipline).
    tf = (
        toks.filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # rows unique per (doc_id, term) → count over the term partition
    # IS the document frequency
    tfw = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    # n_docs from parquet footer metadata when ``docs`` is a bare
    # table frame (optimization r12) — same value, no Spark job; any
    # derived frame falls back to the counting job.
    from inside_vectordb_spark.io import fast_count

    n_docs = fast_count(docs) or d.count()
    idf = smooth_idf(F.col("df"), n_docs)
    docw = tfw.select(
        "doc_id", "term", ((1.0 + F.log("tf")) * idf).alias("wd")
    )
    docw = docw.withColumn(
        "dnorm",
        F.sqrt(F.sum(F.col("wd") * F.col("wd")).over(Window.partitionBy("doc_id"))),
    )
    qtf = (
        q.select("query_id", F.explode(tokenize(F.col("__qt"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # unseen terms keep the smooth idf at df=0 — they contribute to the
    # query norm (they make the query vector longer) but can never
    # match. The dictionary is restricted to the query vocabulary
    # (broadcast semi) before the left join, so the big dft table
    # never broadcasts whole.
    dft_q = (
        tfw.join(F.broadcast(qtf.select("term").distinct()), "term", "left_semi")
        .select("term", "df")
        .distinct()
    )
    qw = qtf.join(F.broadcast(dft_q), "term", "left").select(
        "query_id",
        "term",
        (
            (1.0 + F.log("tf"))
            * smooth_idf(F.coalesce(F.col("df"), F.lit(0)), n_docs)
        ).alias("wq"),
    )
    qw = qw.withColumn(
        "qnorm",
        F.sqrt(F.sum(F.col("wq") * F.col("wq")).over(Window.partitionBy("query_id"))),
    )
    matched = docw.join(F.broadcast(qw), "term")
    per_term = matched.select(
        "query_id",
        "doc_id",
        ((F.col("wq") / F.col("qnorm")) * (F.col("wd") / F.col("dnorm"))).alias("w"),
    )
    return per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("w"), round_to).alias("tfidf")
    )


def tfidf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
) -> DataFrame:
    """Top-k TF-IDF cosine hits per query: (query_id, doc_id, tfidf,
    rank) — ranked on the ROUNDED score with doc_id tie-break (same
    engine-portable contract as bm25_topk / the cosine operators)."""
    agg = tfidf_scores(
        docs, queries, id_col, text_col, qid_col, qtext_col, round_to
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("tfidf").desc(), F.col("doc_id")
    )
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
