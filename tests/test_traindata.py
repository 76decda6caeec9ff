"""Planted-behavior tests for the training-data prep operators
(operators/traindata.py): oracle parity (tests/test_parity.py) proves
engine agreement on the real tables; these prove the semantics on
hand-built corpora where the right answer is known by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from inside_vectordb_spark.operators import traindata as td


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# span_dedup
# ---------------------------------------------------------------------------


def test_span_dedup_removes_repeated_span(spark):
    span = "a b c d e f g h i j"  # exactly one 10-word chunk
    df = _docs(
        spark,
        [
            (1, span + " unique tail one two three four five six seven"),
            (2, span),  # chunk duplicates doc 1's first span
            (3, "totally different words without any duplicate content here x"),
        ],
    )
    out = {r["doc_id"]: r for r in td.span_dedup(df, width=10).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    # doc 2 is entirely the duplicated span: fully deduplicated
    assert out[2]["n_chunks"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["text_clean"] == ""
    assert out[3]["n_kept"] == 1 and out[3]["text_clean"] == (
        "totally different words without any duplicate content here x"
    )


def test_span_dedup_keeper_is_first_occurrence_and_order_preserved(spark):
    s1 = "one two three four five six seven eight nine ten"
    s2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(spark, [(5, s2 + " " + s1), (9, s1 + " " + s2)])
    out = {r["doc_id"]: r for r in td.span_dedup(df, width=10).collect()}
    # doc 5 (lower id) keeps both spans in original order; doc 9 loses both
    assert out[5]["text_clean"] == s2 + " " + s1
    assert out[9]["n_kept"] == 0


def test_span_dedup_empty_doc_yields_no_rows(spark):
    df = _docs(spark, [(1, ""), (2, "   "), (3, "real words here")])
    rows = td.span_dedup(df, width=10).collect()
    assert sorted(r["doc_id"] for r in rows) == [3]


# ---------------------------------------------------------------------------
# ngram_decontaminate
# ---------------------------------------------------------------------------


def test_ngram_decontaminate_flags_exact_overlap_only(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over lazy dogs")])
    train = _docs(
        spark,
        [
            (1, "prefix words the quick brown fox suffix words"),  # shares a 4-gram
            (2, "quick brown fox sleeps"),  # longest shared run is 3 words
            (3, "nothing in common at all here"),
        ],
    )
    out = {r["doc_id"]: r for r in td.ngram_decontaminate(train, bench, n=4).collect()}
    assert set(out) == {1}
    assert out[1]["n_colliding"] == 1  # "the quick brown fox"


def test_ngram_decontaminate_counts_distinct_gram_hits(spark):
    bench = _docs(spark, [(100, "a b c d e")])  # 4-grams: "a b c d", "b c d e"
    train = _docs(spark, [(1, "x a b c d e y")])
    out = td.ngram_decontaminate(train, bench, n=4).collect()
    assert len(out) == 1 and out[0]["n_colliding"] == 2


def test_bloom_decontaminate_equals_exact_on_real_corpus(spark):
    """The Bloom prefilter must be output-identical to the exact
    variant on the sf0.001 documents table (the registered shape)."""
    from inside_vectordb_spark import io as eio
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    exact = {tuple(r) for r in td.ngram_decontaminate(train, bench, n=4).collect()}
    bloom = {
        tuple(r)
        for r in td.ngram_decontaminate_bloom(train, bench, n=4).collect()
    }
    assert bloom == exact and len(exact) > 0


def test_bloom_decontaminate_fp_stress_still_exact(spark):
    """A deliberately tiny bitmap (64 bits, 2 probes) forces heavy
    Bloom false positives; the verify join must still reduce the
    output to the exact answer — the correctness of the operator may
    not depend on the FP rate."""
    bench = _docs(spark, [(100, "the quick brown fox jumps over lazy dogs")])
    train = _docs(
        spark,
        [
            (1, "prefix words the quick brown fox suffix words"),
            (2, "quick brown fox sleeps near the river bank today"),
            (3, "completely unrelated text with many different words here"),
        ],
    )
    out = td.ngram_decontaminate_bloom(
        train, bench, n=4, m_bits=64, n_hashes=2
    ).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert out[0]["n_colliding"] == 1


# ---------------------------------------------------------------------------
# dataset_split / weighted_sample
# ---------------------------------------------------------------------------


def test_dataset_split_stable_and_roughly_proportional(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = td.dataset_split(df)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # pure function of id: adding docs never reassigns an old one
    sub = td.dataset_split(df.limit(500)).collect()
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)


def test_weighted_sample_prefers_heavy_rows(spark):
    # 500 light rows (w=1) + 20 heavy rows (w=1000): A-ES top-50 must be
    # dominated by heavy rows far beyond their 4% population share.
    df = spark.range(520).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 20, F.lit(1000.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    rows = td.weighted_sample(df, F.col("w"), k=50).collect()
    assert len(rows) == 50
    heavy = sum(1 for r in rows if r["weight"] == 1000.0)
    assert heavy >= 15  # E[heavy] ≈ 20; population share alone would give ~2


def test_weighted_sample_deterministic(spark):
    df = spark.range(300).select(F.col("id").alias("doc_id"), F.lit(1.0).alias("w"))
    a = [r["doc_id"] for r in td.weighted_sample(df, F.col("w"), k=10).collect()]
    b = [r["doc_id"] for r in td.weighted_sample(df, F.col("w"), k=10).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# length_bucketed_batches
# ---------------------------------------------------------------------------


def test_length_buckets_are_log2_and_batches_sized(spark):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 1, 3, 7, 8, 15, 16, 100])]
    df = _docs(spark, rows)
    out = td.length_bucketed_batches(df, batch_size=2).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # bucket = ⌊log2(n)⌋ + 1 == length(bin(n)): 1→1, 3→2, 7→3, 8→4, 15→4, ...
    assert set(by_bucket) == {1, 2, 3, 4, 5, 7}
    assert sum(r["n_docs"] for r in out) == len(rows)
    assert all(r["n_docs"] <= 2 for r in out)
    # a batch of equal lengths wastes nothing
    b1 = by_bucket[1][0]
    assert b1["n_docs"] == 2 and b1["padding_frac"] == 0.0
    # bucket 4 holds docs of 8 and 15 tokens: padding = 1 - 23/30
    b4 = by_bucket[4][0]
    assert abs(b4["padding_frac"] - (1 - 23 / 30)) < 1e-6


# ---------------------------------------------------------------------------
# kmeans_lloyd
# ---------------------------------------------------------------------------


def test_kmeans_lloyd_separates_planted_clusters(spark):
    # Two tight blobs far apart; k=2 must put each blob in one cluster
    # with centroids at the blob means.
    rows = []
    for i in range(10):
        rows.append((i, [0.0 + 0.001 * i, 0.0]))
    for i in range(10, 20):
        rows.append((i, [10.0, 10.0 + 0.001 * i]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = td.kmeans_lloyd(df, k=2, iters=2).collect()
    sizes = {r["cluster"]: r["size"] for r in out}
    assert sizes == {0: 10, 1: 10}
    cent = {(r["cluster"], r["pos"]): r["centroid"] for r in out}
    # quantized ×1000: blob-0 mean x ≈ 4.5 (0.0045 * 1000)
    assert abs(cent[(0, 0)] - 4.5) < 0.2
    assert abs(cent[(1, 0)] - 10000.0) < 1.0


def test_kmeans_lloyd_deterministic(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, td.kmeans_lloyd(df, k=4, iters=2).collect()))
    b = sorted(map(tuple, td.kmeans_lloyd(df, k=4, iters=2).collect()))
    assert a == b
    assert not any(math.isnan(t[2]) for t in a)


def test_touched_buckets_manifest(spark):
    """CoW pruning manifest: buckets cover exactly the change keys and
    counts sum to the change-batch size."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.merge import touched_buckets

    changes = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    m = touched_buckets(changes, n_buckets=16).collect()
    assert sum(r.n_changes for r in m) == 100
    assert all(0 <= r.bucket < 16 for r in m)
    # a one-key change batch touches exactly one bucket
    one = touched_buckets(
        spark.range(5, 6).select(F.col("id").alias("doc_id")), n_buckets=16
    ).collect()
    assert len(one) == 1 and one[0].n_changes == 1


def test_late_interaction_planted_relevance(spark):
    """A corpus doc that CONTAINS the query text verbatim must win
    MaxSim: every query chunk finds a near-identical doc chunk, so its
    summed max-cosines dominate unrelated docs."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.functions.vector import cosine_similarity
    from inside_vectordb_spark.operators.embed import encode_documents
    from inside_vectordb_spark.operators.traindata import doc_chunks

    query = "gradient descent converges under convex loss " * 8
    rows = [
        (100, query + " and appendix material beyond the quoted span"),
        (101, "completely unrelated cooking recipe text " * 10),
        (102, "another off-topic document about sailing boats " * 10),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    qdf = spark.createDataFrame([(0, query)], "doc_id long, text string")

    ch = encode_documents(
        doc_chunks(corpus, width=32, stride=16).select(
            (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
    ).select(
        (F.col("doc_id") / 10000).cast("long").alias("doc_id"),
        F.col("embedding").alias("cvec"),
    )
    qe = encode_documents(
        doc_chunks(qdf, width=32, stride=16).select(
            (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
    ).select(
        (F.col("doc_id") % 10000).cast("int").alias("qchunk_id"),
        F.col("embedding").alias("qvec"),
    )
    scores = {
        r.doc_id: r.score
        for r in ch.crossJoin(qe)
        .select("doc_id", "qchunk_id", cosine_similarity("qvec", "cvec").alias("sim"))
        .groupBy("doc_id", "qchunk_id")
        .agg(F.max("sim").alias("m"))
        .groupBy("doc_id")
        .agg(F.sum("m").alias("score"))
        .collect()
    }
    assert scores[100] > scores[101] and scores[100] > scores[102]


def _bpe_reference(word_freqs: dict, n_merges: int):
    """Independent pure-Python BPE (Sennrich '16) with the same tie
    break (cnt DESC, left ASC, right ASC)."""
    syms = {w: list(w) for w in word_freqs}
    rules = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        rules.append((rank, l, r, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return rules


def test_bpe_learn_matches_reference(spark):
    """The distributed loop (Catalyst fold merge, 1-row argmax per
    iteration) learns exactly the rules an independent sequential BPE
    learns on the same corpus."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.traindata import bpe_learn, word_frequencies
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    wf = {r.w: r.freq for r in word_frequencies(docs).collect()}
    want = _bpe_reference(wf, 8)
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == want
    assert len(got) == 8  # corpus is large enough to support 8 merges


def test_bpe_merge_handles_overlaps(spark):
    """aaa with rule (a,a) merges left-to-right non-overlapping:
    [aa, a] — the classic BPE edge case."""
    from inside_vectordb_spark.operators.traindata import _merge_pair_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("aaa",), ("aaaa",), ("ba",)], "w string")
    rows = df.select(
        _merge_pair_col(F.split("w", ""), "a", "a").alias("m")
    ).collect()
    assert rows[0]["m"] == ["aa", "a"]
    assert rows[1]["m"] == ["aa", "aa"]
    assert rows[2]["m"] == ["b", "a"]


def test_snapshot_versioning_and_time_travel(spark, tmp_path):
    """CoW snapshot contract: every committed version stays readable
    byte-for-byte after later merges; latest == last commit; reading
    an uncommitted version raises."""
    import pytest as _pytest

    from inside_vectordb_spark.operators.merge import (
        merge_into_snapshot,
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    write_snapshot(base, path, 1)
    ch = spark.createDataFrame(
        [(2, "B", "update"), (3, None, "delete"), (4, "d", "insert")],
        "id long, val string, op string",
    )
    v = merge_into_snapshot(spark, path, ch, key="id")
    assert v == 2 and snapshot_versions(path) == [1, 2]
    v1 = {(r.id, r.val) for r in read_snapshot(spark, path, 1).collect()}
    assert v1 == {(1, "a"), (2, "b"), (3, "c")}
    v2 = {(r.id, r.val) for r in read_snapshot(spark, path).collect()}
    assert v2 == {(1, "a"), (2, "B"), (4, "d")}
    with _pytest.raises(ValueError):
        read_snapshot(spark, path, 7)


def test_histograms_hand_check(spark):
    from inside_vectordb_spark.operators.stats import (
        equi_depth_histogram,
        equi_width_histogram,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    )
    ew = equi_width_histogram(df, "v", n_bins=3).collect()
    # range [0, 9], width 3: bins [0,3)=0,1,2 ; [3,6)=3,4,5 ; [6,9]=6,7,8,9
    assert [(r.bin, r.cnt) for r in ew] == [(0, 3), (1, 3), (2, 4)]
    assert ew[0].lo == 0.0 and ew[2].hi == 9.0
    ed = equi_depth_histogram(df, "v", "id", n_bins=5).collect()
    assert [r.cnt for r in ed] == [2, 2, 2, 2, 2]
    assert [r.lo for r in ed] == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_equi_width_constant_column(spark):
    from inside_vectordb_spark.operators.stats import equi_width_histogram

    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, v double")
    rows = equi_width_histogram(df, "v", n_bins=4).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].cnt == 2


def test_vacuum_expires_old_versions(spark, tmp_path):
    import pytest as _pytest

    from inside_vectordb_spark.operators.merge import (
        merge_into_snapshot,
        read_snapshot,
        snapshot_versions,
        vacuum_snapshots,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, val string"), path, 1
    )
    merge_into_snapshot(
        spark,
        path,
        spark.createDataFrame([(2, "b", "insert")], "id long, val string, op string"),
        key="id",
    )
    assert vacuum_snapshots(path, keep_last=1) == [1]
    assert snapshot_versions(path) == [2]
    assert {r.id for r in read_snapshot(spark, path).collect()} == {1, 2}
    with _pytest.raises(ValueError):
        read_snapshot(spark, path, 1)
    # nothing left to expire: vacuum is idempotent
    assert vacuum_snapshots(path, keep_last=1) == []


def test_bpe_encode_matches_reference(spark):
    """Encoding with learned rules reproduces the sequential
    reference's per-word subtoken counts on a hand corpus."""
    from inside_vectordb_spark.operators.traindata import bpe_encode

    rows = [(1, "low lower lowest"), (2, "low low newer newest")]
    df = _docs(spark, rows)
    wf = {}
    for _, t in rows:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    rules = [(l, r) for _, l, r, _ in _bpe_reference(wf, 4)]

    def ref_encode(w):
        s = list(w)
        for l, r in rules:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return len(s)

    want = {
        doc_id: (len(t.split()), sum(ref_encode(w) for w in t.split()))
        for doc_id, t in rows
    }
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_encode(df, rules).collect()
    }
    assert got == want
    # merges actually compress: tokens < raw characters
    assert all(
        got[d][1] < sum(len(w) for w in t.split()) for d, t in rows
    )


def test_snapshot_diff_preimages_roundtrip(spark, tmp_path):
    """CDF with preimages: updates emit pre+post rows, and applying
    the feed additively to a v1 aggregate reproduces the v2 aggregate
    (the IVM contract), on a hand-built table."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.merge import (
        merge_into_snapshot,
        snapshot_diff,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "de", 30)],
        "id long, lang string, n long",
    )
    write_snapshot(base, path, 1)
    ch = spark.createDataFrame(
        [(2, "en", 25, "update"), (3, None, None, "delete"), (4, "fr", 40, "insert")],
        "id long, lang string, n long, op string",
    )
    merge_into_snapshot(spark, path, ch, key="id")
    feed = snapshot_diff(spark, path, 1, 2, key="id", preimages=True).collect()
    ops = sorted((r.op, r.id) for r in feed)
    assert ops == [
        ("delete", 3),
        ("insert", 4),
        ("update_postimage", 2),
        ("update_preimage", 2),
    ]
    pre = next(r for r in feed if r.op == "update_preimage")
    post = next(r for r in feed if r.op == "update_postimage")
    assert pre.n == 20 and post.n == 25
    # additive refresh == recompute
    sign = {"insert": 1, "update_postimage": 1, "delete": -1, "update_preimage": -1}
    delta = {}
    for r in feed:
        d = delta.setdefault(r.lang, [0, 0])
        d[0] += sign[r.op]
        d[1] += sign[r.op] * r.n
    view = {
        r.lang: [r.cnt, r.tot]
        for r in base.groupBy("lang")
        .agg(F.count("*").alias("cnt"), F.sum("n").alias("tot"))
        .collect()
    }
    for lang, (dc, dn) in delta.items():
        cur = view.setdefault(lang, [0, 0])
        cur[0] += dc
        cur[1] += dn
    view = {k: v for k, v in view.items() if v[0] > 0}
    assert view == {"en": [2, 35], "fr": [1, 40]}


def test_snapshot_diff_schema_evolution(spark, tmp_path):
    """Review r7: diffing across a schema change must work over the
    UNION of both versions' columns — a row whose only change is a
    newly added column is an update (typed NULL on the from side),
    and NULL-vs-value field changes are detected (null-safe struct
    compare)."""
    from inside_vectordb_spark.operators.merge import (
        snapshot_diff,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, text string"
    )
    write_snapshot(v1, path, 1)
    # v2 adds 'lang': row 1 unchanged except the new column; row 2's
    # text goes NULL -> 'x' (null-safe compare must see it); row 3
    # identical with NULL lang -> NOT a change
    v2 = spark.createDataFrame(
        [(1, "a", "en"), (2, "x", None), (3, "c", None)],
        "id long, text string, lang string",
    )
    write_snapshot(v2, path, 2)
    feed = {r["id"]: r for r in snapshot_diff(spark, path, 1, 2, key="id").collect()}
    assert sorted((r["op"], i) for i, r in feed.items()) == [
        ("update", 1),
        ("update", 2),
    ]
    assert feed[1]["lang"] == "en" and feed[2]["text"] == "x"


def test_bpe_batched_matches_sequential(spark):
    """Batched merge selection is EXACT: any batch_size yields the
    identical merge table (rank, pair, count) as 1-at-a-time
    sequential BPE, while taking fewer pair-count rounds."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.traindata import bpe_learn
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    seq = [
        tuple(r)
        for r in bpe_learn(docs, n_merges=8, batch_size=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert bpe_learn.last_rounds == 8
    for bs in (4, 8):
        got = [
            tuple(r)
            for r in bpe_learn(docs, n_merges=8, batch_size=bs)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == seq, bs
        assert bpe_learn.last_rounds < 8, bs


def test_exact_merge_batch_rules():
    """The batch selector's two exactness rules on crafted rankings:
    stop at the first symbol overlap; trim while the boundary ties."""
    from inside_vectordb_spark.operators.traindata import _exact_merge_batch

    def rows(*triples):
        return [
            {"left_sym": l, "right_sym": r, "cnt": c} for l, r, c in triples
        ]

    # disjoint, strictly descending: take everything requested
    top = rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7), ("g", "h", 6))
    assert _exact_merge_batch(top, 3) == [("a", "b", 9), ("c", "d", 8), ("e", "f", 7)]
    # overlap at rank 2 ('b' reused): batch collapses to the argmax
    top = rows(("a", "b", 9), ("b", "c", 8), ("e", "f", 7))
    assert _exact_merge_batch(top, 3) == [("a", "b", 9)]
    # boundary tie: rank-3 pair ties the excluded rank-4 → trimmed
    top = rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7), ("g", "h", 7))
    assert _exact_merge_batch(top, 3) == [("a", "b", 9), ("c", "d", 8)]
    # cascading tie trim stops at the floor of one pair
    top = rows(("a", "b", 9), ("c", "d", 9), ("e", "f", 9), ("g", "h", 9))
    assert _exact_merge_batch(top, 3) == [("a", "b", 9)]
    # exhausted ranking (no boundary): whole prefix is safe
    top = rows(("a", "b", 9), ("c", "d", 8))
    assert _exact_merge_batch(top, 3) == [("a", "b", 9), ("c", "d", 8)]
    # sub-threshold counts never merge
    top = rows(("a", "b", 1), ("c", "d", 1))
    assert _exact_merge_batch(top, 3) == []
    # a SELF-pair closes the batch: merging (d,d) over runs creates
    # (dd,d) from (d,d)'s own occurrences, which can out-rank later
    # members (hypothesis counterexample {"aa": 2, "ddd": 3})
    top = rows(("d", "d", 6), ("a", "b", 2))
    assert _exact_merge_batch(top, 3) == [("d", "d", 6)]
    # non-leading self-pair is kept but still terminal
    top = rows(("a", "b", 9), ("d", "d", 6), ("e", "f", 5))
    assert _exact_merge_batch(top, 3) == [("a", "b", 9), ("d", "d", 6)]


def test_hard_negatives_semantics(spark):
    """Positives and self-matches never surface; negatives keep
    retrieval order and fill up to n_neg."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.traindata import hard_negatives

    run = spark.createDataFrame(
        [(1, d, 1.0 - d * 0.1, d) for d in range(1, 7)],
        "query_id long, doc_id long, score double, rank int",
    )
    pos = spark.createDataFrame([(1, 2), (1, 4)], "query_id long, doc_id long")
    out = hard_negatives(run, pos, n_neg=3).orderBy("neg_rank").collect()
    assert [r["doc_id"] for r in out] == [3, 5, 6]  # 1=self, 2/4=positives
    assert [r["neg_rank"] for r in out] == [1, 2, 3]
    assert "rank" not in out[0].asDict()


def test_cluster_safe_split_no_straddle(spark):
    """The leakage guarantee itself: every cluster's members share one
    split; singletons match the plain per-doc split."""
    from pyspark.sql import functions as F

    from inside_vectordb_spark.operators.traindata import (
        cluster_safe_split,
        dataset_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    out = cluster_safe_split(docs, clusters)
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_cluster)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 40
    plain = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    for i in range(40):
        if i not in (0, 1, 2, 10, 11):  # singletons follow the doc split
            assert got[i] == plain[i], i
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]


def test_training_triples_assembly(spark):
    """One row per (query, positive); negatives ride as an ordered
    array shared by every positive of the query."""
    from inside_vectordb_spark.operators.traindata import training_triples

    pos = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 200)], "query_id long, doc_id long"
    )
    neg = spark.createDataFrame(
        [(1, 7, 2), (1, 5, 1), (2, 9, 1)],
        "query_id long, doc_id long, neg_rank int",
    )
    got = {
        (r["query_id"], r["pos_id"]): r["neg_ids"]
        for r in training_triples(pos, neg).collect()
    }
    assert got == {(1, 100): [5, 7], (1, 101): [5, 7], (2, 200): [9]}


def test_token_budget_select_distributed_prefix_sum(spark):
    """The distributed prefix sum equals a sequential one on a corpus
    that spans many range partitions, and the budget cuts exactly at
    the boundary (never mid-document)."""
    from inside_vectordb_spark.operators.traindata import token_budget_select

    # quality is driven by the text heuristics; vary length so the
    # order is nontrivial and words are countable
    docs = spark.createDataFrame(
        [(i, ("the quick fox " * ((i % 7) + 2)).strip()) for i in range(60)],
        "doc_id long, text string",
    )
    budget = 300
    got = token_budget_select(docs, budget=budget).orderBy("cum_tokens").collect()
    assert got, "budget selected nothing"
    # sequential reference over the same (quality desc, doc_id) order
    from inside_vectordb_spark.operators.textstats import quality_scores

    qs = sorted(
        (
            (-r["quality"], r["doc_id"], r["n_words"])
            for r in quality_scores(docs).collect()
        )
    )
    want, acc = [], 0
    for negq, did, nw in qs:
        acc += nw
        if acc > budget:
            break
        want.append((did, acc))
    assert [(r["doc_id"], r["cum_tokens"]) for r in got] == want
    assert got[-1]["cum_tokens"] <= budget


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def test_dsir_ranks_target_domain_docs_first(spark):
    """Training docs written in the target slice's vocabulary must
    outscore docs from a disjoint vocabulary, and selection must
    return them first."""
    target = _docs(
        spark,
        [
            (1000, "protein folding structure enzyme binding site model"),
            (1001, "enzyme kinetics protein structure folding pathway"),
        ],
    )
    train = _docs(
        spark,
        [
            (1, "protein structure folding enzyme model binding"),  # in-domain
            (2, "enzyme binding site kinetics structure protein"),  # in-domain
            (3, "stock market futures trading options volatility"),  # off-domain
            (4, "football match referee penalty goal keeper"),  # off-domain
        ],
    )
    scores = {
        r["doc_id"]: r["dsir_score"]
        for r in td.dsir_scores(train, target).collect()
    }
    assert set(scores) == {1, 2, 3, 4}
    assert min(scores[1], scores[2]) > max(scores[3], scores[4])
    picked = {r["doc_id"] for r in td.dsir_select(train, target, budget=2).collect()}
    assert picked == {1, 2}


def test_dsir_deterministic_and_feature_counts(spark):
    """Same inputs → identical scores; n_feats = unigrams + bigrams
    with multiplicity."""
    target = _docs(spark, [(10, "alpha beta gamma")])
    train = _docs(spark, [(1, "alpha beta alpha")])
    a = td.dsir_scores(train, target).collect()
    b = td.dsir_scores(train, target).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # "alpha beta alpha": 3 unigrams + 2 bigrams = 5 feature occurrences
    assert a[0]["n_feats"] == 5


def test_dsir_empty_target_is_uniformly_negative_prior(spark):
    """With an EMPTY target slice every bucket falls back to the
    uniform alpha prior: scoring must not error (no div-by-zero under
    ANSI) and every doc still gets a finite score."""
    target = _docs(spark, [])
    train = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
    rows = td.dsir_scores(train, target).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["dsir_score"] is not None for r in rows)


def test_source_cap_quota_and_monotone_growth(spark):
    """Per-source cap: exactly min(cap, n_source) survivors per
    source, and a larger cap strictly extends the kept set (md5
    priorities are fixed, so rank <= 10 is a prefix of rank <= 15)."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.traindata import source_cap
    from tests.conftest import SF_DIR

    docs = eio.load_table(spark, SF_DIR, "documents")
    per_source = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept10 = source_cap(docs, cap=10).collect()
    counts10: dict[str, int] = {}
    for r in kept10:
        assert r["keep_rank"] <= 10
        counts10[r["source"]] = counts10.get(r["source"], 0) + 1
    for src, n in per_source.items():
        assert counts10.get(src, 0) == min(10, n), src
    ids10 = {(r["source"], r["doc_id"]) for r in kept10}
    ids15 = {(r["source"], r["doc_id"]) for r in source_cap(docs, cap=15).collect()}
    assert ids10 <= ids15
    # deterministic across runs
    assert ids10 == {(r["source"], r["doc_id"]) for r in source_cap(docs, cap=10).collect()}
