"""Persisted inverted index for the lexical arm (BM25/TF-IDF).

The in-memory scorers (``operators/bm25.py``) rebuild the postings
from the corpus on every query batch — correct, but at 100 TB the
explode+count over the corpus is exactly what a search engine pays
ONCE at index time and never again. This module is that index-at-rest
(the lexical sibling of the persisted ANN indexes, S9/S10):

- ``postings``: (term, doc_id, tf, dl) parquet, PARTITIONED by
  ``pb = pmod(hash(term), n_buckets)`` — the query's term set maps to
  a handful of buckets, so a search scans |query buckets|/n_buckets
  of the postings, a genuine partition-pruned read (the inverted-list
  property, from layout rather than pointers). The document length
  ``dl`` is DENORMALIZED into each posting row (one extra int per
  posting, the classic impact-ready layout), so BM25 serving touches
  NOTHING that is O(corpus): the round-4 verdict's doclen shuffle is
  gone from the serving path.
- ``df``: the dictionary (term, df), same bucketing, stored under a
  VERSIONED directory (``df_v<N>``) named by ``meta.json`` — the
  atomic meta write is the commit point for dictionary swaps, so a
  crash mid-upsert can never pair a new dictionary with old meta or
  vice versa (the ``_meta_io`` seam the module advertises).
- ``doclen``: (doc_id, dl) generation + delta dirs named by
  ``meta.doclen_rels`` — kept for introspection/stats; the serving
  path no longer reads it.
- ``meta.json`` (via the atomic ``_meta_io`` seam): k-invariant
  corpus stats (n_docs, avgdl) + a corpus fingerprint (count, id
  range, AND total chars — in-place text edits at unchanged ids
  invalidate the cache), written LAST as the completeness marker;
  ``ensure_lexical_index`` rebuilds on a changed corpus, params, or
  layout version.

Because tokenization and counting are deterministic, the stored index
search is BIT-IDENTICAL to the fresh ``bm25_topk`` — the registered
indexed query therefore shares the plain BM25 oracle, making the hash
match itself the stored==fresh proof on the driver's hard signal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.functions.text import token_count, tokenize
from inside_vectordb_spark.operators.bm25 import BM25_B, BM25_K1

N_TERM_BUCKETS = 64
LEXICAL_LAYOUT = 4  # v4: canonical tokenizer — explicit [ \t\n\f\r]+
# class (Java \s carried \x0B; RE2's does not) and NO empty tokens
# anywhere (review r9-6); v3: postings dl uses token_count semantics
# (phantom empties included — review r8); v2: dl denormalized,
# versioned df dir


def _term_bucket(col) -> F.Column:
    return F.pmod(F.hash(col), F.lit(N_TERM_BUCKETS))


def _fresh_gen(path: str) -> int:
    """Smallest generation n whose build dirs don't exist yet — a
    rebuild NEVER writes into a directory a live meta could name, so
    the old index stays fully servable until the meta commit."""
    n = 1
    while any(
        os.path.isdir(os.path.join(path, f"{fam}_b{n}"))
        for fam in ("postings", "df", "doclen")
    ) or os.path.isdir(os.path.join(path, f"df_v{n}")):
        n += 1
    return n


def _fresh_delta(path: str, fam: str, start: int) -> str:
    """Smallest ``<fam>_d<n>`` (n ≥ start) whose dir doesn't exist —
    a length-based name alone collided after COMPACTION: the rel list
    shrinks to one while the superseded ``_d1`` dir survives under
    the one-commit grace, and an upsert reusing that name would
    overwrite a directory an in-flight reader may still hold (found
    by tests/test_compaction.py)."""
    n = start
    while os.path.isdir(os.path.join(path, f"{fam}_d{n}")):
        n += 1
    return f"{fam}_d{n}"


def _docnorm_dir(path: str, meta: dict) -> str:
    """The live docnorm generation, resolved through meta — upserts
    invalidate by POINTING meta at a new (not-yet-built) name instead
    of deleting, so a crash between steps can never pair a new meta
    with stale norms (or vice versa)."""
    return os.path.join(path, meta.get("docnorm_rel", "docnorm"))


def _validate_serving(meta: dict | None, path: str) -> dict:
    """Shared gate for every read path: kind, layout, AND bucket
    count — a layout-1 index or one bucketed under a different
    N_TERM_BUCKETS would otherwise be pruned with the wrong modulus
    and silently drop matching postings buckets."""
    if meta is None or meta.get("kind") != "lexical":
        raise FileNotFoundError(f"no complete lexical index at {path}")
    if meta.get("layout") != LEXICAL_LAYOUT:
        raise ValueError(
            f"lexical index at {path} has layout {meta.get('layout')} "
            f"(expected {LEXICAL_LAYOUT}); rebuild via build_lexical_index"
        )
    if meta.get("n_term_buckets") != N_TERM_BUCKETS:
        raise ValueError(
            f"lexical index at {path} bucketed with "
            f"{meta.get('n_term_buckets')} term buckets (engine expects "
            f"{N_TERM_BUCKETS}); rebuild via build_lexical_index"
        )
    return meta


def _df_dir(path: str, meta: dict) -> str:
    """Resolve the live dictionary directory through meta.json — the
    versioned name makes the atomic meta write the commit point for
    dictionary swaps."""
    return os.path.join(path, meta.get("df_rel", "df"))


def _gc_dirs(path: str, keep: set[str]) -> None:
    """Remove superseded index relations (runs AFTER the meta commit,
    so a crash here leaves only harmless orphans, never a torn
    index). Covers every directory family this index owns — a
    rebuild's old generation, superseded dictionaries, and derived
    docnorm generations."""
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return
    for name in entries:
        versioned = (
            name in ("df", "postings", "doclen", "docnorm")
            or name.startswith("df_")
            or name.startswith("postings_")
            or name.startswith("doclen_")
            or name.startswith("docnorm_")
        )
        if versioned and name not in keep:
            mio.remove_tree(os.path.join(path, name))


def _read_rels(spark: SparkSession, path: str, rels: list[str]) -> DataFrame:
    """Union parquet relations named by a meta rel list — THE
    rel-resolution idiom, in one place (review r9: three hand-rolled
    copies invited divergence if resolution rules ever change)."""
    out = None
    for rel in rels:
        d = spark.read.parquet(os.path.join(path, rel))
        out = d if out is None else out.unionByName(d)
    return out


def _read_postings(spark: SparkSession, path: str, meta: dict) -> DataFrame:
    """Union the base postings with any committed delta dirs — only
    relations NAMED in meta.json are visible, so an interrupted upsert
    (delta written, meta not yet swapped) reads as the pre-upsert
    index, never a torn one. Bucket-pruning filters push into every
    member scan independently."""
    return _read_rels(spark, path, meta.get("postings_rels", ["postings"]))


def build_lexical_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
) -> dict:
    """One corpus pass builds all three relations; the postings/df
    writes repartition on the partition key first (one file per
    bucket, not tasks×buckets small files). ``dl`` rides along on
    every posting row with ``token_count`` SEMANTICS (phantom empty
    tokens from leading/trailing non-space whitespace included) — the
    fresh scorer and the shared oracle both use ``token_count``, and
    review r8 found the previous ``sum(tf)`` form (empties filtered)
    diverged from them for any text ending in a newline/tab, breaking
    the bit-identical stored==fresh contract. Serving still never
    joins an O(corpus) side.

    ``fingerprint``: the caller's already-computed corpus fingerprint
    (``ensure_lexical_index`` computes one to decide staleness —
    recomputing it here doubled a full text-column scan per rebuild).

    Build/commit runs under the index commit lock (concurrent
    builders would interleave writes into the same generation dirs).
    """
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint

    mio.makedirs(path)
    with mio.commit_lock(path, timeout_sec=600.0):
        return _build_locked(docs, path, id_col, text_col, fingerprint)


def _build_locked(
    docs: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    fingerprint: dict | None,
) -> dict:
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint
    from inside_vectordb_spark.operators.bm25 import doc_token_stream

    prev_meta = mio.read_json(mio.join(path, "meta.json")) or {}
    gen = _fresh_gen(path)
    post_rel, df_rel, dl_rel = f"postings_b{gen}", f"df_b{gen}", f"doclen_b{gen}"
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("__t")
    )
    tf = (
        doc_token_stream(d)
        .filter(F.col("term") != "")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("pb", _term_bucket(F.col("term")))
    )
    # every relation of a rebuild lands in FRESH generation dirs: the
    # live index (named by the current meta) is never overwritten in
    # place, so a crash anywhere before the meta commit leaves the old
    # index fully servable (review r6s2: the in-place overwrite paired
    # old meta with torn data)
    tf.repartition("pb").write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(path, post_rel)
    )
    spark = docs.sparkSession
    postings = spark.read.parquet(os.path.join(path, post_rel))
    dft = postings.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "pb", _term_bucket(F.col("term"))
    )
    dft.repartition("pb").write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(path, df_rel)
    )
    dl = d.select("doc_id", token_count(F.col("__t")).alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(path, dl_rel))
    # dl_sum/dl_n recorded separately from n_docs: NULL-text docs have
    # NULL dl (excluded from avg but counted by n_docs), so upsert
    # recombination from avgdl·n_docs alone over-reconstructs the sum
    # (review r8); avgdl "or 0.0" keeps an empty corpus a clean empty
    # index instead of a TypeError after the data dirs were written
    row = dl.agg(
        F.count("*").alias("n"),
        F.count("dl").alias("nn"),
        F.sum("dl").alias("s"),
        F.avg("dl").alias("avgdl"),
    ).collect()[0]
    meta = {
        "kind": "lexical",
        "layout": LEXICAL_LAYOUT,
        "n_term_buckets": N_TERM_BUCKETS,
        "df_rel": df_rel,
        "doclen_rels": [dl_rel],
        # derived norms are VERSIONED per dictionary generation: a
        # rebuild repoints this name, so norms computed against the
        # previous corpus can never be served against the new meta
        "docnorm_rel": f"docnorm_{df_rel}",
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"] or 0.0),
        "dl_sum": float(row["s"] or 0.0),
        "dl_n": int(row["nn"]),
        "corpus": fingerprint
        if fingerprint is not None
        else _corpus_fingerprint(docs, id_col, content_col=text_col),
    }
    meta["postings_rels"] = [post_rel]
    mio.write_json(mio.join(path, "meta.json"), meta)
    # one-commit GRACE for the superseded generation: a reader that
    # resolved the PREVIOUS meta may still hold lazy frames over its
    # dirs — they survive until the NEXT commit (review r8: immediate
    # GC crashed in-flight readers mid-scan)
    prev_keep = (
        set(prev_meta.get("postings_rels", []))
        | set(prev_meta.get("doclen_rels", []))
        | {prev_meta.get("df_rel"), prev_meta.get("docnorm_rel")}
    ) - {None}
    _gc_dirs(path, {df_rel, post_rel, dl_rel} | prev_keep)
    return meta


def ensure_lexical_index(docs: DataFrame, path: str, **kw) -> dict:
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint

    meta = mio.read_json(mio.join(path, "meta.json"))
    fp = _corpus_fingerprint(
        docs, kw.get("id_col", "doc_id"), content_col=kw.get("text_col", "text")
    )
    if (
        meta is not None
        and meta.get("kind") == "lexical"
        and meta.get("layout") == LEXICAL_LAYOUT
        and meta.get("n_term_buckets") == N_TERM_BUCKETS
        and meta.get("corpus") == fp
    ):
        return meta
    return build_lexical_index(docs, path, fingerprint=fp, **kw)


def bm25_topk_indexed(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
) -> DataFrame:
    """BM25 against the stored index: the corpus is never touched —
    postings/df scans prune to the query terms' buckets (the bucket
    list is collected driver-side, bounded by the query vocabulary),
    the query vocabulary broadcasts, ``dl`` comes denormalized off
    the posting rows, and the ONLY shuffle is the final (query, doc)
    aggregation — nothing O(corpus) moves. Identical scoring
    arithmetic to ``bm25_scores``, so results match the fresh path
    bit-for-bit."""
    meta = _validate_serving(mio.read_json(mio.join(path, "meta.json")), path)
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.lower(F.col(qtext_col)).alias("__qt")
    )
    qterms = q.select(
        "query_id",
        F.explode(F.array_distinct(tokenize(F.col("__qt")))).alias("term"),
    ).filter(F.col("term") != "")
    qvocab = qterms.select("term").distinct()
    pbs = sorted(
        r["pb"]
        for r in qvocab.select(_term_bucket(F.col("term")).alias("pb"))
        .distinct()
        .collect()
    )
    postings = (
        _read_postings(spark, path, meta)
        .filter(F.col("pb").isin(pbs))
        .join(F.broadcast(qvocab), "term")
    )
    dft = (
        spark.read.parquet(_df_dir(path, meta))
        .filter(F.col("pb").isin(pbs))
        .join(F.broadcast(qvocab), "term")
        .select("term", "df")
    )
    scored = postings.join(F.broadcast(dft), "term").join(
        F.broadcast(qterms), "term"
    )
    from inside_vectordb_spark.operators.bm25 import okapi_idf, okapi_tf_norm

    n_docs, avgdl = float(meta["n_docs"]), float(meta["avgdl"])
    idf = okapi_idf(F.col("df"), n_docs)
    tf_norm = okapi_tf_norm(F.col("tf"), F.col("dl"), avgdl, k1, b)
    agg = (
        scored.select("query_id", "doc_id", (idf * tf_norm).alias("w"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("w"), round_to).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def build_tfidf_norms(spark: SparkSession, path: str) -> None:
    """Extend a built lexical index with the TF-IDF document norms —
    the quantity cosine TF-IDF needs over the FULL vocabulary, which
    is exactly why engines precompute it at index time. Derived from
    the stored postings + dictionary (no corpus re-scan)."""
    from inside_vectordb_spark.operators.tfidf import smooth_idf
    # the SAME meta-as-commit-point protocol every other relation in
    # this module uses (review r7): norms land in a fresh generation
    # dir and the atomic meta write REPOINTS docnorm_rel — writing
    # into the live pointed dir made directory existence the
    # completeness marker, so a killed build left a torn docnorm that
    # silently dropped documents from every TF-IDF result forever
    # the norm build is a read-modify-write commit on meta.json —
    # serialized by the index commit lock like every other commit in
    # this module (review r8: two lazy builders raced the gen bump)
    with mio.commit_lock(path):
        meta = _validate_serving(
            mio.read_json(mio.join(path, "meta.json")), path
        )
        postings = _read_postings(spark, path, meta)
        dft = spark.read.parquet(_df_dir(path, meta)).select("term", "df")
        n_docs = float(meta["n_docs"])
        wd = (1.0 + F.log("tf")) * smooth_idf(F.col("df"), n_docs)
        gen = int(meta.get("docnorm_gen", 0)) + 1
        rel = f"docnorm_g{gen}"
        (
            postings.join(dft, "term")
            .select("doc_id", (wd * wd).alias("w2"))
            .groupBy("doc_id")
            .agg(F.sqrt(F.sum("w2")).alias("dnorm"))
            .write.mode("overwrite")
            .parquet(os.path.join(path, rel))
        )
        superseded = meta.get("docnorm_rel")
        meta["docnorm_rel"], meta["docnorm_gen"] = rel, gen
        mio.write_json(mio.join(path, "meta.json"), meta)
    # one-commit grace (same rule as the rebuild GC): the directly
    # superseded norm dir survives until the NEXT commit; anything
    # older goes
    for name in os.listdir(path):
        if (
            name.startswith("docnorm_g")
            and name not in (rel, superseded)
        ):
            mio.remove_tree(os.path.join(path, name))


def tfidf_topk_indexed(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 10,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    round_to: int = 6,
) -> DataFrame:
    """TF-IDF cosine against the stored index: postings/dictionary
    prune to the query buckets, document norms come from the
    precomputed ``docnorm`` relation (built once from the full
    dictionary), and the query side stays a broadcast. Same
    arithmetic as ``operators/tfidf.py:tfidf_scores``."""
    meta = _validate_serving(mio.read_json(mio.join(path, "meta.json")), path)
    if not mio.is_dir(_docnorm_dir(path, meta)):
        build_tfidf_norms(spark, path)
        # the build COMMITS by repointing docnorm_rel — re-read meta
        meta = _validate_serving(mio.read_json(mio.join(path, "meta.json")), path)
    n_docs = float(meta["n_docs"])
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.lower(F.col(qtext_col)).alias("__qt")
    )
    qtf = (
        q.select("query_id", F.explode(tokenize(F.col("__qt"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    qvocab = qtf.select("term").distinct()
    pbs = sorted(
        r["pb"]
        for r in qvocab.select(_term_bucket(F.col("term")).alias("pb"))
        .distinct()
        .collect()
    )
    dft_q = (
        spark.read.parquet(_df_dir(path, meta))
        .filter(F.col("pb").isin(pbs))
        .join(F.broadcast(qvocab), "term")
        .select("term", "df")
    )
    from inside_vectordb_spark.operators.tfidf import smooth_idf

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
    postings = (
        _read_postings(spark, path, meta)
        .filter(F.col("pb").isin(pbs))
        .join(F.broadcast(qvocab), "term")
    )
    docw = postings.join(F.broadcast(dft_q), "term").select(
        "doc_id",
        "term",
        ((1.0 + F.log("tf")) * smooth_idf(F.col("df"), n_docs)).alias("wd"),
    )
    dnorm = spark.read.parquet(_docnorm_dir(path, meta))
    matched = docw.join(F.broadcast(qw), "term").join(dnorm, "doc_id")
    agg = (
        matched.select(
            "query_id",
            "doc_id",
            ((F.col("wq") / F.col("qnorm")) * (F.col("wd") / F.col("dnorm"))).alias("w"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("w"), round_to).alias("tfidf"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("tfidf").desc(), F.col("doc_id"))
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def upsert_lexical_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental maintenance of the lexical index — exact, not
    stale-stats: for DISJOINT new documents every stored relation is
    ADDITIVE, so the maintained index matches a full rebuild —
    integer relations (postings/df/doclen/n_docs) exactly, avgdl to
    float recombination error far inside the score rounding — which
    is why the registered upsert query shares the plain BM25 oracle:

    - postings: the delta lands in a fresh ``postings_d<N>`` dir,
      O(delta) rows tokenized — INVISIBLE until meta.json names it;
    - dictionary: df_new = df_old ⊕ df_delta (full-outer sum — an
      O(vocab) merge, never a postings re-aggregation), written to
      the next ``df_v<N>`` dir;
    - stats: n_docs and avgdl recombine from counts (additive);
    - tfidf norms are INVALIDATED (they depend on global df, which
      just changed for the delta's terms) by repointing meta's
      ``docnorm_rel`` at the next generation name — lazily rebuilt
      from the stored postings on the next TF-IDF search, the classic
      refresh-on-read for derived index artifacts, with the pointer
      swap itself riding the atomic commit;
    - doclen: the delta lands in a fresh ``doclen_d<N>`` dir named by
      meta, never an in-place append (retry-safe).

    The ATOMIC meta.json write is the single commit point: readers
    resolve both the dictionary dir and the postings dir list through
    meta, so a crash at any earlier step leaves the pre-upsert index
    fully intact (orphan dirs get GC'd after the next successful
    commit) — no window where delta postings pair with base meta.

    Contract (FAISS ``add``): delta ids disjoint from stored ids. The
    merged fingerprint makes a later ``ensure_lexical_index`` over
    the full corpus recognize the maintained index as current."""
    # the whole upsert is a read-modify-write commit: two concurrent
    # upserts would derive the SAME delta dir names and clobber each
    # other, the last meta pairing one committer's stats with the
    # other's rows (review r8) — serialized by the index commit lock
    with mio.commit_lock(path, timeout_sec=600.0):
        return _upsert_locked(new_docs, path, id_col, text_col)


def compact_lexical_index(spark: SparkSession, path: str) -> dict:
    """OPTIMIZE for the lexical tier: each upsert adds a
    ``postings_d<N>`` / ``doclen_d<N>`` delta dir that every search
    unions back in — correct, but the union fans the pruned scan out
    over ever more directories (and ever smaller files). Compaction
    rewrites the union into ONE fresh generation at O(index)
    sequential I/O and zero recompute (no re-tokenization — the
    postings rows already exist; a rebuild would pay the corpus
    pass):

    - under the commit lock, write (⋃ postings rels) and (⋃ doclen
      rels) into fresh ``_b<gen>`` dirs (never touching any dir the
      live meta names — crash anywhere before the commit leaves the
      old index fully servable, generation-dir discipline);
    - commit by atomically rewriting meta.json with single-element
      rel lists; dictionary, norms, and corpus stats are unchanged
      (compaction moves no logical rows);
    - GC superseded dirs with the same one-commit grace the
      build/upsert paths give in-flight readers.

    Search results are BIT-IDENTICAL before and after (same rows,
    different physical layout) — pinned against the shared BM25
    oracle in tests and on the driver via ``bm25_compacted_topk``.
    Idempotent: a compacted index is a no-op (returned unchanged)."""
    with mio.commit_lock(path, timeout_sec=600.0):
        meta = _validate_serving(mio.read_json(mio.join(path, "meta.json")), path)
        post_rels = list(meta.get("postings_rels", ["postings"]))
        dl_rels = list(meta.get("doclen_rels", ["doclen"]))
        if len(post_rels) <= 1 and len(dl_rels) <= 1:
            return meta
        gen = _fresh_gen(path)
        post_rel, dl_rel = f"postings_b{gen}", f"doclen_b{gen}"
        _read_postings(spark, path, meta).repartition("pb").write.mode(
            "overwrite"
        ).partitionBy("pb").parquet(os.path.join(path, post_rel))
        _read_rels(spark, path, dl_rels).write.mode("overwrite").parquet(
            os.path.join(path, dl_rel)
        )
        prev_keep = set(post_rels) | set(dl_rels)
        meta["postings_rels"] = [post_rel]
        meta["doclen_rels"] = [dl_rel]
        mio.write_json(mio.join(path, "meta.json"), meta)  # commit point
        # one-commit grace: readers on the previous meta keep their
        # dirs until the NEXT commit
        _gc_dirs(
            path,
            {post_rel, dl_rel, meta["df_rel"], meta["docnorm_rel"]} | prev_keep,
        )
        return meta


def _upsert_locked(
    new_docs: DataFrame, path: str, id_col: str, text_col: str
) -> dict:
    from inside_vectordb_spark.operators.ann_index import (
        _assert_disjoint_delta,
        _corpus_fingerprint,
        _merge_fingerprint,
    )
    from inside_vectordb_spark.operators.bm25 import doc_token_stream

    meta = _validate_serving(mio.read_json(mio.join(path, "meta.json")), path)
    spark = new_docs.sparkSession
    d = new_docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("__t")
    )
    # ENFORCE the disjoint-delta contract like every other upsert in
    # the repo (review r7): a replayed delta would append duplicate
    # postings and double-count df/n_docs, roughly doubling affected
    # BM25 weights with no error. Stored ids come from the doclen
    # generation+delta dirs — O(n_docs) narrow rows, never postings.
    stored_ids = _read_rels(
        spark, path, meta.get("doclen_rels", ["doclen"])
    ).select("doc_id")
    _assert_disjoint_delta(stored_ids, d.select("doc_id"), path)
    tf = (
        doc_token_stream(d)
        .filter(F.col("term") != "")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("pb", _term_bucket(F.col("term")))
    )
    tf.persist()
    rels = list(meta.get("postings_rels", ["postings"]))
    delta_rel = _fresh_delta(path, "postings", len(rels))
    tf.repartition("pb").write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(path, delta_rel)
    )
    df_delta = tf.groupBy("term").agg(F.count("*").alias("dfd"))
    df_old = spark.read.parquet(_df_dir(path, meta)).select("term", "df")
    merged = (
        df_old.join(df_delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("dfd", F.lit(0))).alias("df"),
        )
        .withColumn("pb", _term_bucket(F.col("term")))
    )
    old_df_rel = meta.get("df_rel", "df")
    try:
        n = int(old_df_rel.rsplit("_v", 1)[1]) + 1
    except (IndexError, ValueError):
        n = 1
    # probe the filesystem like _fresh_delta: after a rebuild resets
    # df_rel to df_b<gen>, a counter restarted at v1 would overwrite a
    # grace-protected dictionary dir (and its derived docnorm) that an
    # in-flight reader on the pre-rebuild meta may still hold
    # (review r9 — the _d<N> collision class, for the _v names)
    while os.path.isdir(os.path.join(path, f"df_v{n}")) or os.path.isdir(
        os.path.join(path, f"docnorm_df_v{n}")
    ):
        n += 1
    new_df_rel = f"df_v{n}"
    merged.repartition("pb").write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(path, new_df_rel)
    )
    dl = d.select("doc_id", token_count(F.col("__t")).alias("dl"))
    # the doclen delta is its own dir, named by meta at the commit —
    # an in-place append would mutate the pre-upsert index before the
    # commit point and double-append on a retried crash
    dl_rels = list(meta.get("doclen_rels", ["doclen"]))
    dl_delta_rel = _fresh_delta(path, "doclen", len(dl_rels))
    dl.write.mode("overwrite").parquet(os.path.join(path, dl_delta_rel))
    row = dl.agg(
        F.count("*").alias("n"),
        F.count("dl").alias("nn"),
        F.sum("dl").alias("s"),
    ).collect()[0]
    n_new, nn_new, sum_new = int(row["n"]), int(row["nn"]), float(row["s"] or 0.0)
    tf.unpersist()
    n_old = int(meta["n_docs"])
    # recombine from the stored (sum, non-null count): avgdl·n_docs
    # over-reconstructs the sum when NULL-text docs exist (avg skips
    # them, count(*) doesn't — review r8); old metas without the
    # fields fall back to the former approximation
    sum_old = float(meta.get("dl_sum", float(meta["avgdl"]) * n_old))
    nn_old = int(meta.get("dl_n", n_old))
    meta["n_docs"] = n_old + n_new
    meta["avgdl"] = (sum_old + sum_new) / max(1, nn_old + nn_new)
    meta["dl_sum"] = sum_old + sum_new
    meta["dl_n"] = nn_old + nn_new
    meta["corpus"] = _merge_fingerprint(
        meta.get("corpus"),
        _corpus_fingerprint(new_docs, id_col, content_col=text_col),
    )
    meta["postings_rels"] = rels + [delta_rel]
    meta["df_rel"] = new_df_rel
    meta["doclen_rels"] = dl_rels + [dl_delta_rel]
    # df changed → the derived norms are stale: invalidate by
    # REPOINTING meta at the next docnorm generation (no fs mutation
    # before the commit — a crash here leaves the old index intact,
    # old docnorm included; the old dir becomes a post-commit orphan)
    old_docnorm = meta.get("docnorm_rel")
    meta["docnorm_rel"] = f"docnorm_{new_df_rel}"
    mio.write_json(mio.join(path, "meta.json"), meta)  # the commit point
    # one-commit grace for the superseded dictionary/norm dirs — an
    # in-flight reader on the previous meta keeps its files until the
    # NEXT commit (review r8)
    _gc_dirs(
        path,
        set(meta["postings_rels"])
        | set(meta["doclen_rels"])
        | ({new_df_rel, old_df_rel, old_docnorm} - {None}),
    )
    return meta
