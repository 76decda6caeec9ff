"""Training-data preparation operators beyond the dedup/curation tier.

Extends the LLM-pipeline suite (BASELINE.json north star; reference
has no analogue — its pipeline stops at retrieval evaluation) with the
remaining stages a 100 TB pre-training corpus run needs between
"curated documents" and "training batches":

- span-level dedup (the C4/Lee-et-al. line-and-span dedup shape);
- exact n-gram benchmark decontamination (the GPT-3 appendix-C rule:
  drop/flag any training doc sharing an n-gram with the eval suite);
- deterministic train/val/test splits (hash-bucketed, resumable);
- weighted sampling without replacement (Efraimidis-Spirakis A-ES
  exponential-key top-k — quality-weighted subcorpus selection);
- length-bucketed batch packing stats (padding-waste accounting);
- distributed Lloyd k-means over embeddings (domain clustering for
  mixture weighting), fixed-point so every engine agrees bit-for-bit.

Scale notes are on each function; the shared principles:
- Content (text/embedding) columns never ride a shuffle whose key is
  a content hash — hash-keyed aggregations carry only (hash, id, pos).
- All randomness is md5-derived arithmetic (engine-portable,
  rerun-stable, auditable per row) — no ``rand()`` in any path.
- Everything is pure ``pyspark.sql.functions`` Catalyst expressions;
  no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import tokenize, word_shingles


def _md5_bucket(col: Column, salt: str, mod: int, hex_digits: int = 8) -> Column:
    """Uniform integer bucket in [0, mod) from md5(value || salt) —
    the engine-portable twin of DuckDB
    ``('0x' || substr(md5(v || salt), 1, d))::BIGINT % mod``."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, hex_digits), 16, 10).cast("long") % mod


# ---------------------------------------------------------------------------
# Span-level dedup (C4-style)
# ---------------------------------------------------------------------------

def span_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 10
) -> DataFrame:
    """(doc_id, pos, chunk): non-overlapping ``width``-word spans per
    document, in order. The span is the dedup unit — the corpus-level
    analogue of C4's line-level dedup for text without line structure
    (one flat line per doc here). Empty/whitespace docs yield no rows."""
    toks = tokenize(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    chunks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("pos", "chunk")
    )


def span_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 10
) -> DataFrame:
    """Global span-level exact dedup: every ``width``-word span is kept
    only at its first occurrence (lowest (doc_id, pos)); documents are
    rebuilt from their surviving spans in original order.

    Returns (doc_id, n_chunks, n_kept, text_clean) for every doc WITH
    at least one span (empty/whitespace docs yield no spans and no
    row — join back to the corpus if row preservation matters);
    fully-deduplicated docs keep n_kept = 0 and empty text_clean.

    100 TB plan shape: the keeper election groups by ``md5(span)``
    carrying only (hash, doc_id, pos) — span text never rides the
    hash-keyed shuffle (the lesson from round 2's ``corpus_curation``
    fix). Text moves exactly once, on the final (doc_id, pos)-keyed
    semi join + doc_id regroup, which any rebuild must pay."""
    occ = span_occurrences(docs, id_col, text_col, width)
    keepers = (
        occ.select(F.md5("chunk").alias("__h"), "doc_id", "pos")
        .groupBy("__h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"), F.col("k.pos").alias("pos"))
    )
    kept = occ.join(keepers, ["doc_id", "pos"], "left_semi")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("text_clean"),
    )
    totals = occ.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_chunks"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


# ---------------------------------------------------------------------------
# Exact n-gram decontamination (GPT-3 style)
# ---------------------------------------------------------------------------

def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Flag every training doc sharing ANY word ``n``-gram with the
    benchmark set — the GPT-3 appendix-C exact-overlap rule, stricter
    than the ratio-threshold `decontaminate` gate (textstats.py).

    Returns (doc_id, n_grams, n_colliding) for flagged docs only.

    Scale shape: benchmark n-grams are distinct-reduced and md5-coded
    first (the eval suite is tiny next to the corpus — the join's
    build side); the corpus side explodes to (doc_id, gram_hash) so
    only 16-byte hashes shuffle, and AQE turns the join broadcast when
    the bench side fits. Both sides shingle through
    ``word_ngram_stream`` (hoisted tokenization — the inlined form
    re-evaluates the split per emitted gram, measured ~10× slower)."""
    from inside_vectordb_spark.functions.text import word_ngram_stream

    tr = (
        word_ngram_stream(train, id_col, text_col, n, with_count=True)
        .select(
            F.col(id_col).alias("doc_id"),
            "n_grams",
            F.md5("gram").alias("gh"),
        )
    )
    bh = (
        word_ngram_stream(bench, id_col, text_col, n)
        .select(F.md5("gram").alias("gh"))
        .distinct()
    )
    return (
        tr.join(bh, "gh")
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").cast("int").alias("n_colliding"))
        .select("doc_id", "n_grams", "n_colliding")
    )


def ngram_decontaminate_bloom(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """``ngram_decontaminate`` with a Bloom-filter prefilter — the
    SAME exact output (the verify join removes Bloom false positives;
    false negatives are impossible), but a different 100-TB scale
    shape: the exact variant shuffles EVERY corpus gram hash into the
    bench join, while here a fixed-size bitmap (``m_bits``/8 bytes,
    128 KiB at the default) rides to every task and the shuffle
    carries only the bloom-positive survivors — at a typical
    ~0.1-1%% eval-overlap rate that is a 100-1000× cut in join input.
    This is the standard "broadcast a compact sketch, shuffle only
    candidates" pattern runtime row-level filtering applies inside
    Spark joins; stated here as an explicit operator so the
    decontamination gate can run it against a 100-TB corpus without
    materializing the gram stream.

    Mechanics: bench grams hash to ``n_hashes`` bit positions via
    Catalyst ``xxhash64`` double hashing (h1 + i*h2 mod m — Kirsch &
    Mitzenmacher 2006, so two hash evaluations serve all probes; both
    hashes are reduced mod m FIRST so the probe arithmetic never
    overflows int64 under ANSI mode, and the step is forced into
    [1, m-1] so probes never degenerate to one bit). The filter's SET
    BIT POSITIONS — at most ``m_bits`` distinct longs however large
    the bench side grows, which is the Bloom fixed-budget property —
    are materialized once and broadcast; the membership test is then
    ``n_hashes`` broadcast LEFT SEMI joins on the corpus gram
    stream's probe positions, i.e. the bitmap lookup expressed as
    hash-table probes that stay entirely inside whole-stage codegen
    (an earlier Arrow/numpy-bitmap formulation shipped the whole
    2M-row gram stream to Python at sf0.1 and ran 10× slower than
    the exact join it was meant to beat). Survivors verify against
    the exact distinct bench-gram md5 set."""

    def probes(col: str) -> list:
        h1r = F.pmod(F.xxhash64(col), F.lit(m_bits))
        h2r = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m_bits - 1)) + F.lit(1)
        return [
            F.pmod(h1r + F.lit(i) * h2r, F.lit(m_bits)) for i in range(n_hashes)
        ]

    from inside_vectordb_spark.functions.text import word_ngram_stream

    # dedupe AFTER hashing (duplicate grams set the same bits), so no
    # exchange anywhere in the pipeline ever carries gram text
    bench_pos = (
        word_ngram_stream(bench, id_col, text_col, n)
        .select(F.explode(F.array(*probes("gram"))).alias("pos"))
        .distinct()
    )

    tr = (
        word_ngram_stream(train, id_col, text_col, n, with_count=True)
        .select(
            F.col(id_col).alias("doc_id"),
            "n_grams",
            "gram",
            *[p.alias(f"__p{i}") for i, p in enumerate(probes("gram"))],
        )
    )
    # ONE broadcast build for all n_hashes probes (optimization r12):
    # the per-probe ``withColumnRenamed`` copies made each semi join
    # broadcast a DIFFERENTLY-ALIASED plan, defeating Spark's
    # exchange reuse — the bench gram pipeline was tokenized and
    # broadcast-built n_hashes times per run. Joining every probe
    # against the SAME relation (equi-condition on its one column)
    # plans one BroadcastExchange + (n_hashes − 1) ReusedExchange
    # nodes; the probe semantics (ALL positions must be set) are
    # unchanged.
    survivors = tr
    for i in range(n_hashes):
        survivors = survivors.join(
            F.broadcast(bench_pos),
            survivors[f"__p{i}"] == bench_pos["pos"],
            "left_semi",
        )
    # md5 only for bloom-positive survivors; the raw gram never
    # reaches a shuffle (the semi joins are broadcast, map-side)
    survivors = survivors.select("doc_id", "n_grams", F.md5("gram").alias("gh"))
    bh = (
        word_ngram_stream(bench, id_col, text_col, n)
        .select(F.md5("gram").alias("gh"))
        .distinct()
    )
    return (
        survivors.join(bh, "gh")
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").cast("int").alias("n_colliding"))
        .select("doc_id", "n_grams", "n_colliding")
    )


# ---------------------------------------------------------------------------
# Deterministic splits / weighted sampling / batch packing
# ---------------------------------------------------------------------------

def dataset_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = ":split",
) -> DataFrame:
    """(doc_id, split): hash-bucketed train/val/test assignment.
    md5-derived, so membership is a pure function of the id — stable
    under reruns, repartitioning, and incremental corpus growth (a new
    doc never moves an old one between splits, unlike ``rand()`` or
    positional splits). Zero shuffle; the predicate pushes down."""
    bucket = _md5_bucket(F.col(id_col), salt, 100)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def source_cap(
    docs: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = ":cap",
) -> DataFrame:
    """Per-source (per-domain) document quota: keep at most ``cap``
    docs from each source — the web-pipeline rule that stops a single
    crawled domain from dominating the training mix (C4/RefinedWeb
    apply the same cap at the URL-host level; ``source`` is this
    corpus's host analogue).

    Selection within a source is a deterministic uniform sample: docs
    rank by an md5 priority (salted, id-derived), so the kept set is
    stable under reruns, repartitioning, and corpus growth — a new doc
    displaces at most one old one, never reshuffles the survivor set
    the way ``rand()`` ordering would.

    Scale shape: rank ≤ cap over a (source)-partitioned window is
    Catalyst's WindowGroupLimit pushdown — each map task pre-trims its
    partition to its local top-``cap`` per source BEFORE the exchange,
    so at most cap·n_partitions rows per source ever shuffle, not the
    domain's full document set (exactly the flagship top-k shape, T1).
    Web-scale source counts (millions of hosts) keep post-shuffle
    partitions small; no source's full contents ever sort globally.
    Returns (doc_id, source, keep_rank) for the kept docs only."""
    prio = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(source_col).orderBy(prio.asc(), F.col(id_col).asc())
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            F.row_number().over(w).alias("keep_rank"),
        )
        .filter(F.col("keep_rank") <= cap)
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: Column,
    k: int = 50,
    id_col: str = "doc_id",
    salt: str = ":aes",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    A-ES exponential keys: key_i = ln(u_i) / w_i with u_i uniform(0,1),
    take the k largest keys — inclusion probability proportional to
    weight, in one distributed pass.

    u_i is md5-derived (deterministic, engine-portable); the top-k is
    a global ``ORDER BY ... LIMIT k`` which Catalyst executes as
    TakeOrderedAndProject — per-partition heaps, only k rows per
    partition reach the driver-side merge; no full sort, no shuffle of
    the corpus. Returns (doc_id, weight, key) for the k winners."""
    u_int = _md5_bucket(F.col(id_col), salt, 1_000_000) + 1  # 1..1e6
    u = u_int / F.lit(1_000_001.0)
    # + 0.0: ln(u)≈0⁻ for u→1 rounds to -0.0 in DuckDB, +0.0 in Spark
    key = F.round(F.log(u) / weight_col.cast("double"), 6) + F.lit(0.0)
    # A-ES is defined for w > 0: a zero weight is a divide-by-zero
    # (a query-aborting ERROR under ANSI mode), and a negative one
    # flips ln(u)/w positive — outranking every valid doc instead of
    # being excluded. Non-positive weights are never selected.
    docs = docs.filter(weight_col.cast("double") > 0)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            weight_col.cast("double").alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.desc("key"), "doc_id")
        .limit(k)
    )


def length_bucketed_batches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed batch assignment: docs are bucketed by
    ⌊log2(token_count)⌋ (integer-exact via ``length(bin(n))``), then
    batched ``batch_size`` at a time inside each bucket in doc_id
    order. Returns per-batch padding-waste accounting
    (bucket, batch_id, n_docs, min/max tokens, padding_frac) — the
    standard pad-to-longest batching audit; bucketing by length is
    what keeps padding_frac low.

    Scale: one shuffle keyed by the (few) buckets for the per-bucket
    row_number; stats aggregate map-side. At 100 TB the bucket count
    (~15) would serialize the window — shard each bucket by an id-hash
    prefix first (same fix as ``sequence_packing``); at bench scale
    the plain form keeps the oracle simple."""
    ntok = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(tokenize(text_col))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), ntok.cast("int").alias("n_tokens")
    ).withColumn("bucket", F.length(F.bin(F.greatest("n_tokens", F.lit(1)))).cast("int"))
    rn = F.row_number().over(Window.partitionBy("bucket").orderBy("doc_id"))
    batched = base.withColumn(
        "batch_id", ((rn - 1) / F.lit(batch_size)).cast("int")
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            # max == 0 (a batch of empty docs) pads nothing: guard
            # the 0/0, which ANSI mode turns into a query-aborting
            # error rather than a null
            F.when(F.max("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    1.0
                    - F.sum("n_tokens")
                    / (F.count("*") * F.max("n_tokens")).cast("double"),
                    6,
                )
            )
            .alias("padding_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd k-means (fixed-point, engine-portable)
# ---------------------------------------------------------------------------

def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1000,
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column, built so two
    independent engines produce IDENTICAL results:

    - inputs are quantized to integers (``round(x * quant)``) — every
      distance is exact 64-bit arithmetic, no float summation-order
      drift;
    - centroid updates are ``round(avg, 6)`` of exact integer sums —
      the only float op is one correctly-rounded division per (cluster,
      dim), identical everywhere;
    - assignment argmin orders by (round(dist, 6), cluster) — ties
      break on cluster id;
    - init = the ``k`` lowest-id vectors (deterministic, like the
      reference's seeded sampling at ``003:120-127``).

    Plan shape per iteration: centroids (k×dim, tiny) broadcast into
    the assignment join — the corpus never shuffles for assignment;
    the update is posexplode → groupBy(cluster, dim) with map-side
    partial sums, so only k×dim partials per partition reach the
    shuffle. This is exactly how MLlib's KMeans distributes, expressed
    declaratively. Returns (cluster, pos, centroid, size) long-form.
    """
    q = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * quant, 0)
        ).alias("v"),
    )
    # Deterministic init: k lowest ids, cluster = rank order.
    # The rank window runs over the k-row limit() result — bounded by
    # k, not the corpus. Partition on a non-foldable all-equal key
    # (substring survives the optimizer; a literal key is folded to an
    # empty partition spec and WindowExec logs the single-partition
    # warning).
    init = (
        q.orderBy("vec_id")
        .limit(k)
        .select(
            (
                F.row_number().over(
                    Window.partitionBy(
                        F.substring(F.col("vec_id").cast("string"), 0, 0)
                    ).orderBy("vec_id")
                )
                - 1
            ).alias("cluster"),
            F.col("v").alias("c"),
        )
    )
    if iters < 1:
        raise ValueError("kmeans_lloyd: iters must be >= 1")
    centroids = init
    assign = None
    for it in range(iters):
        dist = F.aggregate(
            F.zip_with(F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
        assign = (
            q.crossJoin(F.broadcast(centroids))
            .select("vec_id", "v", "cluster", F.round(dist, 6).alias("dist"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cluster", "v")).alias("m"))
            .select("vec_id", F.col("m.cluster").alias("cluster"), F.col("m.v").alias("v"))
        )
        if it < iters - 1:
            centroids = (
                assign.select("cluster", F.posexplode("v").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(F.round(F.avg("val"), 6).alias("val"))
                .groupBy("cluster")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "val"))),
                        lambda s: s["val"],
                    ).alias("c")
                )
            )
    # Final update and sizes in ONE aggregation over the last
    # assignment: each vector contributes one row per dim, so the
    # per-(cluster, pos) count IS the cluster size — no second
    # assignment pass, no extra join.
    return (
        assign.select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            # + 0.0 normalizes IEEE -0.0 (signed centroid means)
            (F.round(F.avg("val"), 6) + F.lit(0.0)).alias("centroid"),
            F.count("*").cast("int").alias("size"),
        )
        .select("cluster", "pos", "centroid", "size")
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking + chunked retrieval (RAG prep)
# ---------------------------------------------------------------------------

def doc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 32,
    stride: int = 16,
) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_tokens_chunk): overlapping
    sliding-window chunks (``width`` words every ``stride``) — the
    retrieval-granularity prep step for RAG indexing. A doc with
    n ≤ width tokens yields exactly one chunk; empty docs yield none.
    Pure Catalyst (tokenize → transform over window starts →
    posexplode); the only data movement is the explode itself."""
    toks = tokenize(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= width, F.lit(1)).otherwise(
        F.ceil((n - width) / F.lit(float(stride))).cast("int") + 1
    )
    chunks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, width)),
        )
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    return out.withColumn(
        "n_tokens_chunk", F.size(tokenize("chunk_text")).cast("int")
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct words with corpus frequencies — the working set BPE
    training iterates on. At 100 TB the distinct-word table is orders
    of magnitude smaller than the corpus (Heaps' law), which is why
    every production tokenizer trainer (HuggingFace, SentencePiece)
    reduces to it first; this is the only pass that touches raw text."""
    return (
        docs.select(
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(symbols: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over
    ``(w, freq, syms array<string>)`` — one explode + one
    map-side-combinable groupBy; the per-iteration reduction of BPE
    training. Returns (left_sym, right_sym, cnt)."""
    pairs = symbols.filter(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at("syms", i + 1).alias("l"),
                    F.element_at("syms", i + 2).alias("r"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("freq").alias("cnt"))


def _merge_pair_col(syms: Column | str, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (left, right)
    symbols into one — BPE's apply step as a PURE CATALYST fold
    (``aggregate`` with (emitted, pending) state): no Python in the
    row path, whole-stage codegen, so applying a merge rule is a
    narrow map over the distinct-word table."""
    c = F.col(syms) if isinstance(syms, str) else syms
    merged = F.lit(left + right)

    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(
                (acc["pend"] == left) & (x == right),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            ).otherwise(
                F.struct(
                    F.when(acc["pend"].isNull(), acc["out"])
                    .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
                    .alias("out"),
                    x.alias("pend"),
                )
            )
        )

    return F.aggregate(
        c,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("pend"),
        ),
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def _exact_merge_batch(
    top: list, want: int
) -> list[tuple[str, str, int]]:
    """The largest rank-prefix of ``top`` (≤ ``want`` pairs) that
    sequential BPE provably picks in the same order — so applying the
    whole batch in one pass is EXACT, not approximate:

    1. pairwise symbol-DISJOINT prefix (stop at the first pair sharing
       a symbol with an earlier pick): applying one pick cannot change
       the counts of the others;
    2. a SELF-pair (left == right) CLOSES the batch: merging (l, l)
       over a run "l l l" creates the pair (ll, l) whose count derives
       from (l, l)'s own occurrences — not from any pair ranked below
       the batch — so it can out-rank later batch members (hypothesis
       counterexample: {"aa": 2, "ddd": 3} — sequential picks (dd, d)
       second, not (a, a));
    3. boundary STRICTNESS (trim while the last kept pair's count ties
       the first excluded pair's): any OTHER pair a pick creates or
       shrinks overlaps some batch symbol via a distinct source pair,
       so its count is bounded by the first excluded pair's — strict
       inequality means no new/changed pair can out-rank (or tie-break
       against) a later batch member.

    Symbol-collision caveat (round-4 advisory): the count bound in (3)
    reasons about pairs by their SOURCE occurrences. When a pick's
    concatenation ``l+r`` equals a symbol string that already exists
    elsewhere (possible from merged-symbol states in later rounds),
    the merge can ADD occurrences to a pre-existing pair's count
    (old + gained). Those gained occurrences each consume one
    occurrence of the pick itself, so the grown count stays bounded by
    ``cnt(pick) + cnt(old)``; reachability keeps the combined count
    under the strict boundary in every state hypothesis can construct
    — pinned by the FULL multi-round batched-vs-sequential property
    (``tests/test_properties.py:
    test_multi_round_batched_learning_matches_sequential``), which
    exercises exactly these merged-symbol states, not just the first
    batch from character state.

    Falls back to a single pair (plain sequential step, trivially
    exact) when ties or overlaps allow nothing more.
    """
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for row in top[:want]:
        l, r, cnt = row["left_sym"], row["right_sym"], int(row["cnt"])
        if cnt < 2 or l in used or r in used:
            break
        batch.append((l, r, cnt))
        used.update((l, r))
        if l == r:
            break
    while len(batch) > 1:
        boundary = top[len(batch)] if len(batch) < len(top) else None
        if boundary is not None and int(boundary["cnt"]) == batch[-1][2]:
            batch.pop()
        else:
            break
    return batch


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    batch_size: int = 8,
) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. '16), Spark-first: the
    corpus reduces ONCE to distinct (word, freq); each ROUND is a
    pair-count aggregation over that table (map-side partials, tiny
    shuffle of symbol pairs), one small top-(batch_size+1) collect,
    and a chained Catalyst fold applying every rule the round proved
    safe to batch (``_exact_merge_batch`` — disjoint prefix + strict
    count boundary, so the result is bit-identical to 1-at-a-time
    sequential BPE). Driver round-trips drop from n_merges to
    ~n_merges/batch_size; at a real 50k-merge vocabulary that is the
    difference between 50k Spark jobs and a few thousand. Ties break
    (cnt DESC, left ASC, right ASC) for cross-run determinism.

    Returns the learned merge table (merge_rank, left_sym, right_sym,
    pair_count) — the artifact a tokenizer ships. The number of rounds
    the last call took is exposed as ``bpe_learn.last_rounds`` (bench/
    test observability for the scale knob).
    """
    spark = docs.sparkSession
    symbols = word_frequencies(docs, text_col).select(
        "w", "freq", F.split("w", "").alias("syms")
    )
    symbols = symbols.persist()
    symbols.count()
    rules: list[tuple[int, str, str, int]] = []
    rounds = 0
    try:
        while len(rules) < n_merges:
            want = min(batch_size, n_merges - len(rules))
            top = (
                bpe_pair_counts(symbols)
                .orderBy(F.desc("cnt"), "left_sym", "right_sym")
                .limit(want + 1)
                .collect()
            )
            rounds += 1
            if not top or top[0]["cnt"] < 2:
                break
            batch = _exact_merge_batch(top, want)
            col = F.col("syms")
            for l, r, _ in batch:
                col = _merge_pair_col(col, l, r)
            for l, r, cnt in batch:
                rules.append((len(rules) + 1, l, r, cnt))
            nxt = symbols.select("w", "freq", col.alias("syms")).persist()
            nxt.count()
            symbols.unpersist()
            symbols = nxt
    finally:
        symbols.unpersist()
    bpe_learn.last_rounds = rounds
    return spark.createDataFrame(
        rules, "merge_rank int, left_sym string, right_sym string, pair_count bigint"
    )


def bpe_encode(
    docs: DataFrame,
    rules: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merges (rank order) to tokenize the corpus:
    (doc_id, n_words, n_tokens) where n_tokens counts post-merge
    subword symbols. The train-time trick reused at encode time: the
    merge folds run over the DISTINCT word table (vocabulary), and
    per-doc counts come from joining word-level subtoken counts back —
    so the O(rules) fold work is paid once per distinct word, not once
    per corpus occurrence."""
    words = (
        docs.select(
            F.col("doc_id"),
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    enc = words.select("w").distinct().select("w", F.split("w", "").alias("syms"))
    for left, right in rules:
        enc = enc.select("w", _merge_pair_col("syms", left, right).alias("syms"))
    enc = enc.select("w", F.size("syms").alias("n_subtokens"))
    return (
        words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_subtokens").alias("n_tokens"),
        )
    )


def hard_negatives(
    candidates: DataFrame,
    positives: DataFrame,
    n_neg: int = 5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al. '20): from a
    ranked retrieval run, keep each query's top non-positive,
    non-self documents — the near-misses a contrastive retriever
    trains against (random negatives are too easy; the top of the
    retrieval list is exactly where the model is currently wrong).

    ``candidates``: any ranked run (query_id, doc_id, rank, ...) —
    BM25, vector, or hybrid; the operator is retriever-agnostic.
    ``positives``: the judged (query_id, doc_id) relation. Negatives
    keep their retrieval order (re-numbered as ``neg_rank``), so the
    output is stable under score rounding.

    Scale shape: the positives relation is bounded by the judgment
    set and broadcasts into the anti join; candidates are Q·k rows.
    Nothing corpus-sized moves. Over-fetch the run (k > n_neg +
    max positives per query) so every query fills its quota."""
    neg = (
        candidates.join(
            F.broadcast(positives.select(query_col, doc_col).distinct()),
            [query_col, doc_col],
            "left_anti",
        )
        .filter(F.col(query_col) != F.col(doc_col))
    )
    w = Window.partitionBy(query_col).orderBy(F.asc(rank_col))
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_neg)
        .drop(rank_col)
    )


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = ":split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split by NEAR-DUP
    CLUSTER, not by document — a near-duplicate of a training doc in
    the test split is evaluation leakage (the same failure benchmark
    decontamination guards against, internal to the corpus), and a
    per-doc hash split plants exactly that. Docs absent from the
    cluster relation are their own singleton cluster, so the split
    degrades to ``dataset_split`` on a dedup-clean corpus.

    Returns (doc_id, cluster_id, split); every member of a cluster
    lands in the same split by construction (the hash is a function
    of cluster_id alone). Scale shape: one left join keyed on doc_id
    against the (long, long) cluster relation; the bucket hash is a
    pure Catalyst expression."""
    assigned = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    bucket = _md5_bucket(F.col("cluster_id"), salt, 100)
    return assigned.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def training_triples(
    positives: DataFrame,
    negatives: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    neg_rank_col: str = "neg_rank",
) -> DataFrame:
    """Contrastive training-example assembly (the DPR data format):
    one row per (query, positive) pair carrying the query's mined
    hard negatives as an ORDERED id array — (query_id, pos_id,
    neg_ids). Every positive of a query shares the same negative
    list, exactly how in-batch-negative trainers consume the data.

    Scale shape: negatives reduce to one array row per query first
    (collect_list is bounded by n_neg), then a query-keyed join with
    the positives — both sides are judgment-sized, never
    corpus-sized."""
    negs = (
        negatives.groupBy(query_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(neg_rank_col, doc_col))
                ),
                lambda s: s[doc_col],
            ).alias("neg_ids")
        )
    )
    return (
        positives.select(query_col, F.col(doc_col).alias("pos_id"))
        .join(negs, query_col)
        .select(query_col, "pos_id", "neg_ids")
    )


def _word_ngrams_all(col: Column | str, n: int) -> Column:
    """Word n-grams WITH multiplicity (``word_shingles`` minus the
    ``array_distinct``) — DSIR features are occurrence counts, not
    set membership."""
    toks = tokenize(col)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(grams)


def dsir_scores(
    train: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """DSIR importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every training
    doc by how much more likely its hashed n-gram bag is under the
    TARGET distribution than under the RAW (training) distribution —
    the published recipe for steering a web-scale corpus toward a
    target domain without training a classifier.

    Features = unigrams + bigrams WITH multiplicity, hashed into
    ``n_buckets`` md5 buckets (the paper's hashing trick; md5 keeps
    it engine-portable). Both categorical distributions get add-one
    smoothing; ``dsir_score`` = Σ_occurrences ln(p_target(b)) −
    ln(p_raw(b)), rounded for hash stability. Returns (doc_id,
    n_feats, dsir_score) for train docs with ≥1 feature.

    Scale shape: the corpus is scanned once into the feature stream;
    bucket count tables are ≤ ``n_buckets`` rows, so the log-ratio
    table broadcasts and scoring is map-side; only (doc_id, partial
    sums) reach the final shuffle. The target side is small by
    definition (it is the domain sample you are steering toward)."""

    from inside_vectordb_spark.functions.text import word_ngram_stream

    def feats(docs: DataFrame) -> DataFrame:
        # one hoisted token array feeds both gram widths (the inlined
        # concat-of-transforms form re-evaluates the split per emitted
        # feature; see word_ngram_stream)
        # no empty-gram filter needed: word_ngram_stream guards the
        # n=1 phantom centrally (review r9)
        base = word_ngram_stream(
            docs, id_col, text_col, 1, distinct=False, extra_ns=(2,)
        ).select(F.col(id_col).alias("doc_id"), F.col("gram").alias("feat"))
        return base.select(
            "doc_id", _md5_bucket(F.col("feat"), ":dsir", n_buckets).alias("bucket")
        )

    # The per-bucket log-ratio table is bounded by n_buckets (≤4096
    # rows), so it is materialized EAGERLY to the driver and the
    # returned plan joins the literal relation broadcast. To avoid
    # tokenizing the corpus TWICE (once for the eager counts, once in
    # the returned scoring plan — the r7 shape, a bench-visible 1.6 s
    # regression), the feature stream is pre-aggregated to per-(doc,
    # bucket) occurrence counts and THAT relation is persisted
    # DISK_ONLY: the global bucket counts derive from it (sum of cnt),
    # and the scoring plan reads it back instead of re-tokenizing.
    # This is deliberately NOT the rejected r6 shape — that persisted
    # the raw per-OCCURRENCE stream MEMORY_AND_DISK (~16 B/occurrence,
    # ~5× the raw text at 100 TB, competing for executor memory);
    # the aggregated counts relation is bounded by distinct (doc,
    # bucket) pairs (≤ min(doc_len, n_buckets) per doc), lives on
    # disk only, and Spark frees the blocks LRU/session-end.
    # F.log stays JVM-side, so scores are bit-identical either way.
    from pyspark import StorageLevel

    tr_doc_counts = (
        feats(train)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .persist(StorageLevel.DISK_ONLY)
    )
    tg_counts = feats(target).groupBy("bucket").agg(F.count("*").alias("ct"))
    tr_counts = tr_doc_counts.groupBy("bucket").agg(
        F.sum("cnt").alias("cr")
    )
    tg_total = tg_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    tr_total = tr_counts.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("rt"))
    lratio_rows = (
        tr_counts.join(tg_counts, "bucket", "left")
        .crossJoin(F.broadcast(tg_total))
        .crossJoin(F.broadcast(tr_total))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("cr") + F.lit(1.0))
                    / (F.col("rt") + F.lit(float(n_buckets)))
                )
            ).alias("__lr"),
        )
    ).collect()
    spark = train.sparkSession
    lratio = spark.createDataFrame(lratio_rows, "bucket long, __lr double")
    return (
        tr_doc_counts.join(F.broadcast(lratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_feats"),
            # cnt × lr ≡ summing lr once per occurrence (the rounding
            # absorbs the ulp-level association difference, same as it
            # already absorbs distributed sum order); + 0.0 normalizes
            # IEEE -0.0 (log-ratio sums straddle 0)
            (F.round(F.sum(F.col("cnt") * F.col("__lr")), round_to) + F.lit(0.0)).alias(
                "dsir_score"
            ),
        )
    )


def dsir_select(
    train: DataFrame,
    target: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic DSIR selection: the ``budget`` highest-scoring
    training docs (rounded-score rank, doc_id tie-break — the
    deterministic twin of the paper's Gumbel-noise resampling, same
    way ``seeded_sample`` twins ``rand()``)."""
    scores = dsir_scores(train, target, id_col, text_col, n_buckets)
    return scores.orderBy(
        F.desc("dsir_score"), F.asc("doc_id")
    ).limit(budget)


def token_budget_select(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data selection under a token budget: keep the highest-quality
    documents whose cumulative token count fits the budget — the
    subcorpus-selection step a compute-bounded training run performs
    after curation (pick the best ``budget`` tokens, not a random
    sample). Deterministic total order: (quality DESC, doc_id ASC).

    Returns (doc_id, n_words, quality, cum_tokens) for the selected
    prefix.

    Scale shape — the point: a naive ``Window.orderBy`` cumulative
    sum collapses to ONE partition (Spark warns, and at 100 TB it is
    a non-starter). This computes the global prefix sum the
    distributed way: deterministic range buckets on the sort key
    (``operators/ranks.py`` — literal quantile boundaries, NOT
    ``repartitionByRange``, whose per-job sampling can assign a row
    to different partitions in the totals action vs the final plan
    and corrupt the offsets), per-BUCKET running sums (parallel
    windows), then per-bucket totals — bounded by the bucket count —
    collect to the driver, prefix-accumulate, and broadcast back as
    offsets. One hash shuffle on the bucket id, no global sort on one
    executor; the selected prefix's filter is a pure projection
    afterward."""
    from pyspark.sql.types import LongType, StructField, StructType

    from inside_vectordb_spark.operators.ranks import deterministic_range_ids
    from inside_vectordb_spark.operators.textstats import quality_scores

    spark = docs.sparkSession
    qs = quality_scores(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", "n_words", "quality"
    )
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = deterministic_range_ids(qs, "quality", n_parts, ascending=False)
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__run", F.sum("n_words").over(w))
    totals = sorted(
        (r["__pid"], r["t"])
        for r in local.groupBy("__pid").agg(F.max("__run").alias("t")).collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t
    off = spark.createDataFrame(
        offsets,
        StructType(
            [StructField("__pid", LongType()), StructField("__off", LongType())]
        ),
    )
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn("cum_tokens", (F.col("__off") + F.col("__run")).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_words", "quality", "cum_tokens")
    )
