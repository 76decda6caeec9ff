"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference extension suite (BASELINE.json north star). All
hashes are PORTABLE (md5 / pure arithmetic) so every stage is
oracle-checkable against DuckDB, and — more importantly at 100 TB —
deterministic across engines, partitionings, and reruns.

Scale design notes:
- Exact dedup: hash-groupBy, one shuffle on the content hash. The
  md5 is computed map-side; only (hash, id) pairs shuffle, never text.
- MinHash LSH: shingle → K minhashes → B bands; candidate generation
  is a self-join on (band_idx, band_key) — i.e. a shuffle keyed on
  tiny band signatures, NOT an O(N²) comparison. Verification
  (exact Jaccard) runs only on candidates. This is the standard
  web-scale near-dup recipe (the GPL MinHashLSH in Spark MLlib uses
  the same bucket-join shape).
- SimHash: one pass, no joins, 16-bit weighted-majority signature;
  near-dup candidates = equal signature (or banded halves).
- Embedding near-dup: cosine over a blocking key (label here; at
  scale an LSH/IVF bucket) — never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inside_vectordb_spark.functions.text import tokenize, word_shingles
from inside_vectordb_spark.functions.vector import cosine_similarity

MINHASH_K = 12  # signature length
MINHASH_BANDS = 4  # → rows-per-band = 3; s-curve threshold ≈ (1/4)^(1/3) ≈ 0.63


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy.

    Returns (text_hash, n_dups, keeper_id) for hash groups with >1 doc;
    keeper is the smallest id (deterministic survivor policy)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


# One multiply-add hash family per signature slot, derived from ONE
# md5 per shingle: base b (60 bits) splits into two 30-bit halves
# (b1, b2); h_i = (a_i·b1 + c_i·b2 + d_i) mod P. Products stay < 2^47
# so the arithmetic is exact (and identical) in any 64-bit engine —
# no overflow, fully portable to the DuckDB oracle. Constants are
# fixed odd 16-bit values (seeded once, frozen here).
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1
_HALF = 1 << 30


def _minhash_params(k: int = MINHASH_K) -> list[tuple[int, int, int]]:
    import numpy as _np

    rng = _np.random.RandomState(7)
    return [
        (int(a) | 1, int(c) | 1, int(d))
        for a, c, d in rng.randint(1, 1 << 16, size=(k, 3))
    ]


MINHASH_PARAMS = _minhash_params()


def shingle_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, shset ARRAY<STRING>): each doc's distinct word-shingle
    set — the shared input of signature generation AND Jaccard
    verification. Compute once per pipeline run: shingling is the
    CPU-heavy projection, and the full near-dup pipeline otherwise
    re-derives it three times (signatures + both verify probes)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(text_col, shingle_n).alias("shset"),
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = MINHASH_K,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, mh0..mh{k-1} BIGINT) MinHash signature from distinct
    word n-gram shingles.

    Plan shape: explode shingles → ONE md5 per (doc, shingle) row →
    k multiply-add minima as partial aggregates. The partial (map-side)
    aggregation means only ~n_docs × k longs reach the shuffle, never
    the shingle rows; the md5 count is 1/k of a hash-per-slot scheme —
    at sf0.1 that is 7.5M md5s instead of 90M. Docs with < n words
    yield no signature (no shingles), mirroring MinHashLSH's
    non-empty-set requirement.

    ``sets``: optionally a precomputed (possibly persisted)
    ``shingle_sets`` relation to derive from instead of re-shingling
    ``docs``."""
    if sets is None:
        # hoisted-tokenization stream: explode over an inline shingle
        # array re-evaluates the split per emitted shingle (see
        # functions/text.py:word_ngram_stream; ~7× at sf0.1)
        from inside_vectordb_spark.functions.text import word_ngram_stream

        sh = word_ngram_stream(docs, id_col, text_col, shingle_n).select(
            F.col(id_col).alias("doc_id"), F.col("gram").alias("sh")
        )
    else:
        sh = sets.select("doc_id", F.explode("shset").alias("sh"))
    b = F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10).cast("bigint")
    based = sh.select(
        "doc_id", (b % _HALF).alias("b1"), F.shiftright(b, 30).alias("b2")
    )
    # generate exactly k parameter triples: slicing the module-level
    # k=12 table silently truncated any k > 12 to a 12-wide signature
    # (review r7) — _minhash_params is deterministic, so the first 12
    # are always the same triples
    params = MINHASH_PARAMS[:k] if k <= MINHASH_K else _minhash_params(k)
    return based.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("b1") * F.lit(a) + F.col("b2") * F.lit(c) + F.lit(d))
                % F.lit(MINHASH_PRIME)
            ).alias(f"mh{i}")
            for i, (a, c, d) in enumerate(params)
        ]
    )


def minhash_band_keys(
    signatures: DataFrame, bands: int = MINHASH_BANDS, k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, band_idx, band_key): band_key concatenates the band's
    row hashes — the LSH bucket id. ``bands`` must divide ``k``
    evenly: integer division would otherwise silently drop the
    trailing ``k % bands`` hashes and flatten the s-curve to the
    truncated signature's (review r7; same rule simhash enforces)."""
    if k % bands:
        raise ValueError(
            f"bands ({bands}) must divide the signature length k ({k}) "
            f"evenly — {k % bands} trailing hash(es) would be ignored"
        )
    rows_per_band = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select(
        "doc_id", F.explode(band_structs).alias("b")
    ).select("doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))


def band_pairs(keys: DataFrame, other: DataFrame | None = None) -> DataFrame:
    """Canonical distinct (doc_a < doc_b) pairs sharing ≥1
    (band_idx, band_key) — THE banding join, shared by the batch
    candidate generator and both streaming sites so the
    pair-canonicalization rule can never diverge between the batch
    oracle and the maintained index.

    One argument: self-join of ``keys``. Two arguments: cross pairs
    between ``keys`` (stored side) and ``other`` (delta side, small
    by contract → broadcast)."""
    if other is None:
        a = keys.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
        b = keys.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
        joined = a.join(b, ["band_idx", "band_key"]).select("doc_a", "doc_b")
    else:
        a = keys.select(F.col("doc_id").alias("id_old"), "band_idx", "band_key")
        b = other.select(F.col("doc_id").alias("id_new"), "band_idx", "band_key")
        joined = a.join(F.broadcast(b), ["band_idx", "band_key"]).select(
            F.least("id_old", "id_new").alias("doc_a"),
            F.greatest("id_old", "id_new").alias("doc_b"),
        )
    return joined.filter(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b"
    ).distinct()


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing ≥1 LSH band — the
    candidate set for near-dup verification. The self-join shuffles
    on (band_idx, band_key); bucket skew (a giant bucket of identical
    docs) is handled by AQE skew-join at scale."""
    keys = minhash_band_keys(
        minhash_signatures(docs, id_col, text_col, shingle_n, k, sets=sets),
        bands,
        k,
    )
    return band_pairs(keys)


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct word-shingle sets for given
    (doc_a, doc_b) pairs: |A∩B| / |A∪B|. Shingle arrays are joined
    in (broadcast when small); set math runs JVM-side."""
    sets_ = (
        sets
        if sets is not None
        else shingle_sets(docs, id_col, text_col, shingle_n)
    )
    out = (
        pairs.join(sets_.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shset", "sh_a"), "doc_a")
        .join(sets_.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shset", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "doc_a",
        "doc_b",
        F.round(
            F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union), 6
        ).alias("jaccard"),
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥
    threshold. Returns (doc_a, doc_b, jaccard).

    The shingle-set relation is computed ONCE and persisted
    (memory-and-disk) — signatures and both verify probes read the
    materialized sets instead of re-shingling the corpus three times.
    Spark evicts the blocks LRU (and the production path would
    checkpoint them to storage between pipeline stages); correctness
    never depends on the persist."""
    sets = shingle_sets(docs, id_col, text_col, shingle_n)
    from pyspark import StorageLevel

    sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = minhash_candidate_pairs(docs, id_col, text_col, shingle_n, sets=sets)
    j = ngram_jaccard(docs, pairs, id_col, text_col, shingle_n, sets=sets)
    return j.filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 16


def _hex15_to_long(hexcol: Column) -> Column:
    """First 15 hex chars of an md5 → BIGINT (60 bits, positive).
    Portable: DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`."""
    return F.conv(F.substring(hexcol, 1, 15), 16, 10).cast("bigint")


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(doc_id, simhash): weighted-majority bit signature over token
    hashes — token multiplicity IS the weight (classic Charikar
    simhash). One explode + one groupBy; no joins. Empty/whitespace
    docs tokenize to [''] — that phantom token is FILTERED, so such
    docs get no signature row instead of a shared md5('')-derived
    signature that would make every empty doc a near-dup candidate
    of every other (review r7; same rule every other token consumer
    in the engine applies). Tokens come through the hoisted
    ``word_ngram_stream`` (n=1, with multiplicity) — an inline
    ``explode(tokenize(...))`` re-evaluates the split per emitted
    token, the engine's documented O(len²) generator hazard."""
    from inside_vectordb_spark.functions.text import word_ngram_stream

    # no empty-token filter needed: word_ngram_stream guards the n=1
    # phantom centrally (review r9)
    toks = word_ngram_stream(docs, id_col, text_col, 1, distinct=False).select(
        F.col(id_col).alias("doc_id"), F.col("gram").alias("tok")
    )
    # hash ONCE into a column: inlining the md5 into every per-bit
    # aggregate would evaluate it ``bits`` times per token row.
    # The per-bit aggregates and the signature fold are built as
    # parsed SQL strings (optimization r12): the Column-operator form
    # cost ~130 py4j round trips per construction for identical
    # Catalyst trees.
    hashed = toks.select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"
        ).alias("__h"),
    )
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"sum((shiftright(__h, {j}) & 1) * 2 - 1)").alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig_sql = "CAST((" + " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(bits)
    ) + ") AS BIGINT)"
    return bit_sums.select("doc_id", F.expr(sig_sql).alias("simhash"))


def embedding_near_duplicates_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.8,
    n_tables: int = 4,
    n_bits: int | None = None,
    seed: int = 42,
    max_bucket_size: int | None = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by LSH buckets — the
    production form of ``embedding_near_duplicates`` (no label column
    needed): candidate pairs share a hyperplane-LSH bucket in ≥1 of
    ``n_tables`` tables, then exact cosine verifies. Same capped
    bucket-join shape as ``ann_lsh_topk`` — never a cross product;
    high-threshold near-dups collide with high probability (cosine
    ≥ 0.8 ⇒ sign-agreement per plane ≈ 1 - θ/π ≈ 0.8).

    ``n_bits=None`` (default) scales the bucket width with the
    corpus: bits = log2(N / ~8 docs-per-bucket). A FIXED bit width is
    quadratic in disguise — mean bucket size grows with N, so the
    unrelated-pair noise floor grows as N²/2^bits (the round-10 scale
    soak measured exactly 100× candidate records at 10× corpus with
    bits pinned at 8). Scaling bits holds docs-per-bucket — and with
    it candidate records per doc — constant, while true near-dups
    (per-plane agreement ≈ cos-driven) keep colliding in ≥1 table.
    The recall trade is the standard LSH s-curve: more bits sharpens
    the gate, n_tables compensates."""
    from inside_vectordb_spark.operators.ann import lsh_bucket_ids

    if n_bits is None:
        import math as _math

        from inside_vectordb_spark.io import fast_count

        n = fast_count(embeddings) or embeddings.count()
        n_bits = max(4, _math.ceil(_math.log2(max(n / 8.0, 2.0))))
    b = lsh_bucket_ids(embeddings, id_col, vec_col, dim, n_tables, n_bits, seed)
    e = embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    return _bucketed_cosine_pairs(b, e, max_bucket_size, threshold, round_to)


def _bucketed_cosine_pairs(
    b: DataFrame,
    e: DataFrame,
    max_bucket_size: int | None,
    threshold: float,
    round_to: int,
) -> DataFrame:
    """The candidate → verify tail BOTH embedding near-dup variants
    share (review r7 — previously copy-pasted, so a cap/tie-rule fix
    could silently reach only one): cap each (table, bucket) at
    ``max_bucket_size`` by id order, self-join within buckets for
    canonical (id_a < id_b) distinct pairs, then exact rounded cosine
    on candidate vectors only. ``b`` = (id, table_idx, bucket);
    ``e`` = (__id, __v).

    Both inputs are persisted (memory-and-disk) before reuse — the
    band table is referenced by BOTH sides of the candidate self-join
    and ``e`` by both verify probes, so without materialization the
    entire upstream lineage (for the det variant: a full corpus scan
    plus the n_tables×bits sign-plane fold) executes once PER
    REFERENCE — two signature folds and four corpus scans, verified
    live in the r7 plan audit. Same discipline as
    ``minhash_near_duplicates`` persisting its shingle sets. Spark
    evicts the blocks LRU; correctness never depends on the persist
    (reference anchor: O4/O8's batch-and-cache loop,
    003-hnswlib_demo.py:207-251)."""
    from pyspark import StorageLevel

    if max_bucket_size is not None:
        w = Window.partitionBy("table_idx", "bucket").orderBy("id")
        b = (
            b.withColumn("__bpos", F.row_number().over(w))
            .filter(F.col("__bpos") <= max_bucket_size)
            .drop("__bpos")
        )
    b = b.persist(StorageLevel.MEMORY_AND_DISK)
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = (
        b.select(F.col("id").alias("id_a"), "table_idx", "bucket")
        .join(
            b.select(F.col("id").alias("id_b"), "table_idx", "bucket"),
            ["table_idx", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        pairs.join(
            e.withColumnRenamed("__id", "id_a").withColumnRenamed("__v", "v_a"),
            "id_a",
        )
        .join(
            e.withColumnRenamed("__id", "id_b").withColumnRenamed("__v", "v_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("v_a", "v_b"), round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_duplicates_det(
    embeddings: DataFrame,
    threshold: float = 0.8,
    n_tables: int = 4,
    bits_per_table: int = 8,
    dim: int = 64,
    max_bucket_size: int | None = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Hash-verifiable twin of ``embedding_near_duplicates_lsh``:
    the same banded hyperplane-LSH blocking, but with DETERMINISTIC
    ±1 sign planes (``operators/ann_sign.py``'s md5-parity Charikar
    construction), so bucket assignment is pure Catalyst and the
    whole candidate → verify pipeline restates as DuckDB SQL.

    Table ``t`` uses planes ``[t*bits, (t+1)*bits)`` of one shared
    ``sign_planes(n_tables*bits, dim)`` derivation — disjoint plane
    sets per table, exactly the multi-table banding of the stochastic
    sibling. Candidates share a bucket in ≥1 table (s-curve: at the
    0.8-cosine threshold per-bit agreement is ≈ 1 − θ/π ≈ 0.8, so
    P[pair collides] = 1 − (1 − 0.8^bits)^tables); exact cosine then
    verifies. Scale shape: one narrow scan to bucket, a capped
    bucket-keyed self-join (never all-pairs), rerank on candidates
    only — vectors join back by id, signatures never carry text."""
    from inside_vectordb_spark.operators.ann_sign import sign_planes

    planes = sign_planes(n_tables * bits_per_table, dim)
    e = embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    # ONE signature fold over all n_tables×bits planes, hoisted into
    # its own projection (the multiple slice references below block
    # project-collapse, so the 32 plane dots run once per vector);
    # table t's bucket = bits [t*b, (t+1)*b) of the signature, which
    # is bit-identical to folding table t's plane slice separately —
    # the oracle keeps the per-slice bucket_sql form. Building the
    # buckets as an array of per-table folds instead made Spark
    # re-evaluate all folds per posexplode emission AND per self-join
    # side (~4× wall at sf0.1).
    # Optimization r12: the 32-plane fold as ONE parsed SQL string —
    # each plane a left-assoc literal sum (identical rounding chain to
    # the aggregate(zip_with) fold it replaces, see
    # ann_sign.spark_plane_dot_sql) — instead of ~2,200 py4j round
    # trips of Column operators (~2 s of measured driver latency per
    # construction at 32 planes × 64 dims), and flat codegen-able
    # arithmetic instead of interpreted higher-order functions at
    # execution time.
    from inside_vectordb_spark.operators.ann_sign import spark_plane_dot_sql

    sig_sql = "CAST((" + " + ".join(
        f"(CASE WHEN ({spark_plane_dot_sql('__v', signs)}) >= 0 "
        f"THEN {1 << pidx} ELSE 0 END)"
        for pidx, signs in enumerate(planes)
    ) + ") AS BIGINT)"
    mask = (1 << bits_per_table) - 1
    sigd = e.select("__id", "__v", F.expr(sig_sql).alias("__sig"))
    b = sigd.select(
        F.col("__id").alias("id"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sig"), t * bits_per_table)
                    .bitwiseAND(F.lit(mask))
                    .cast("int")
                    for t in range(n_tables)
                ]
            )
        ).alias("table_idx", "bucket"),
    )
    return _bucketed_cosine_pairs(b, e, max_bucket_size, threshold, round_to)


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup pairs into transitive clusters: (doc_id,
    cluster_id) where cluster_id = the smallest id reachable through
    the pair graph. This is the stage LSH pipelines need between
    "verified pairs" and "one keeper per group" — pairs (a,b),(b,c)
    must collapse to ONE cluster {a,b,c}, which no per-pair filter can
    do (the reference stops at pairwise similarity; web-scale dedup —
    e.g. the CCNet/Gopher pipelines — requires the component step).

    Algorithm: min-label propagation with pointer jumping. Each round
    (1) every node takes ``min(label(self), min(label(neighbors)))``
    (one shuffle keyed by node id), then (2) path-halves:
    ``label(v) := label(label(v))`` (one shuffle keyed by label).
    Neighbor propagation alone converges in O(diameter) rounds — a
    path graph would blow any fixed iteration budget — but the jump
    step compresses label chains geometrically, giving the standard
    O(log n) bound (the hash-to-min shape of Rastogi et al.; the
    large-star/small-star contraction of Kiveris et al. is the same
    idea with edge rewriting). Near-dup clusters are dense (diameter
    1-2 — every member collides with the keeper), so real corpora
    settle in 2-3 rounds; ``max_iter`` bounds adversarial chains.

    Scale notes per round: both shuffles move (long, long) pairs only
    — never text; the neighbor min is a map-side partial aggregate,
    so ~|V| rows reach the exchange. ``localCheckpoint`` truncates
    lineage each round (iterative joins otherwise stack plans
    exponentially); a cluster run would use ``checkpoint`` to a
    reliable store instead. The per-round convergence probe is a
    LIMIT-1 count (a scalar to the driver, not data).

    CONTRACT (advice r12): ``pairs`` should be DISTINCT (src, dst)
    pairs — every in-repo caller feeds canonical deduplicated pairs.
    Duplicated input pairs stay CORRECT (every aggregation here is a
    duplicate-insensitive MIN; there is deliberately no up-front
    ``.distinct()`` exchange) but pay their duplicated join/aggregate
    volume on every round — callers with heavily duplicated pair
    lists should dedup before calling.
    """
    # Symmetrize with one explode, not a self-union: the union form
    # evaluates the (expensive) pairs subtree twice inside the
    # materializing job — with the full MinHash pipeline upstream that
    # doubles the dominant cost before iteration even starts.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
                    ),
                    F.struct(
                        F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    # No edge-dedup exchange (optimization r12): every aggregation in
    # the loop is a MIN — duplicate edges cannot change any label —
    # and the in-repo callers already feed canonical distinct pairs,
    # so the old ``.distinct()`` was a pure extra shuffle of the edge
    # list. (A caller with a massively duplicated edge list would
    # trade per-round join volume for this saved shuffle; min-algebra
    # correctness is unaffected either way.)
    from pyspark import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    labels = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        if labels is None:
            # Round 1 specialization (optimization r12): initial
            # labels ARE the node ids, so neighbor-min is ONE
            # aggregation straight off the edge list — no init
            # distinct, no edges⋈labels join (the symmetrized dst set
            # is exactly the node universe). Identical to running the
            # general round against labels(v) = v.
            stepped = edges.groupBy(F.col("dst").alias("id")).agg(
                F.min("src").alias("nmin")
            ).select(
                "id",
                F.col("id").alias("start"),
                F.least("id", "nmin").alias("mid"),
            )
        else:
            neighbor_min = (
                edges.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("nmin"))
            )
            stepped = (
                labels.join(neighbor_min, "id", "left")
                .select(
                    "id",
                    F.col("label").alias("start"),
                    F.least("label", F.coalesce("nmin", "label")).alias("mid"),
                )
            )
        # ONE action per round (optimization r12; was an eager
        # checkpoint job + a probe-count job, i.e. 2× the driver/AQE
        # job overhead per round): the LAZY localCheckpoint of the
        # neighbor-min step is materialized — all partitions, lineage
        # truncated — by the convergence count itself. Converging on
        # the HALF-round (neighbor-min) check is exact: edges are
        # symmetrized, so "no node saw a smaller neighbor label" means
        # label(v) ≤ label(u) for every edge in BOTH directions ⇒
        # labels are uniform per component; labels only decrease and
        # only hold member ids, and label(m) ≤ m for the component min
        # m, so the uniform value IS m — the global fixed point, at
        # which the pointer jump below is the identity. The jump can
        # therefore never fire after the check passes, and both loop
        # forms take the same rounds and produce the same labels.
        stepped = stepped.localCheckpoint(eager=False)
        changed = stepped.filter(F.col("mid") < F.col("start")).count()
        if changed == 0:
            labels = stepped.select("id", F.col("mid").alias("label"))
            break
        # Pointer jump: label(v) := label(label(v)). Every label value
        # is itself a node id, so the lookup side is total. Derived
        # lazily from the checkpointed step — the next round's count
        # materializes it; its recompute base is the cached step, so
        # the double reference below costs one cheap join, not a
        # pipeline replay.
        jump = stepped.select(
            F.col("id").alias("mid"), F.col("mid").alias("jlabel")
        )
        labels = stepped.join(jump, "mid", "left").select(
            "id",
            F.least("mid", F.coalesce("jlabel", "mid")).alias("label"),
        )
    edges.unpersist()
    # scale-sensitive observability: rounds actually taken (tracked
    # round-over-round in the bench report — a corpus whose cluster
    # graph suddenly needs more rounds is a skew/adversarial signal)
    connected_components.last_rounds = rounds
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def near_duplicate_clusters(
    docs: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Full fuzzy-dedup resolution: MinHash-LSH pairs → exact-Jaccard
    verify → transitive clusters. Returns (doc_id, cluster_id); rows
    with ``doc_id != cluster_id`` are the drop set, keeping exactly
    one survivor (the minimum id) per near-dup cluster."""
    pairs = minhash_near_duplicates(docs, threshold, id_col, text_col, shingle_n)
    return connected_components(pairs)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    Blocking keeps this linear-ish: pairs are only formed inside a
    block (here the synthetic ``label``; in production an LSH/IVF
    bucket from operators/ann.py). Returns (id_a, id_b, cos_sim)."""
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(block_col).alias("blk")
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "blk")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("v_a", "v_b"), round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def fuzzy_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag training docs whose
    shingle-set Jaccard against ANY benchmark doc reaches
    ``threshold`` — the paraphrase-robust complement of exact n-gram
    decontamination (``textstats.decontaminate`` catches verbatim
    leakage; this catches lightly-edited leakage, the documented gap
    in GPT-3's appendix-C procedure).

    Bipartite LSH shape: the BENCHMARK side is small by contract, so
    its band keys AND its shingle sets ride broadcasts — the training
    corpus never shuffles; candidate generation is a band-key hash
    join and verification touches only candidate pairs.

    Returns (doc_id, bench_id, jaccard): one row per flagged training
    doc, matched to its highest-Jaccard benchmark doc (ties: lowest
    bench_id)."""
    tsets = shingle_sets(train, id_col, text_col, shingle_n)
    bsets = shingle_sets(bench, id_col, text_col, shingle_n)
    tkeys = minhash_band_keys(
        minhash_signatures(train, id_col, text_col, shingle_n, sets=tsets)
    )
    bkeys = minhash_band_keys(
        minhash_signatures(bench, id_col, text_col, shingle_n, sets=bsets)
    ).select(F.col("doc_id").alias("bench_id"), "band_idx", "band_key")
    cand = (
        tkeys.join(F.broadcast(bkeys), ["band_idx", "band_key"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    jac = F.when(
        F.size(F.array_union("ta.shset", "tb.shset")) == 0, F.lit(0.0)
    ).otherwise(
        F.size(F.array_intersect("ta.shset", "tb.shset"))
        / F.size(F.array_union("ta.shset", "tb.shset"))
    )
    verified = (
        cand.join(tsets.alias("ta"), "doc_id")
        .join(
            F.broadcast(bsets.select(F.col("doc_id").alias("bench_id"), "shset")).alias("tb"),
            "bench_id",
        )
        .select("doc_id", "bench_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("jaccard"), F.asc("bench_id"))
    return (
        verified.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "bench_id", "jaccard")
    )


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup SEARCH (completing the tier beyond signature
    computation): banded candidate generation + exact Hamming verify.
    The signature is split into ``n_bands`` equal bit-slices; two docs
    whose signatures differ in at most ``max_hamming`` bits must share
    at least one identical band whenever ``max_hamming < n_bands``
    (pigeonhole), so the band self-join finds EVERY true near-dup pair
    — the same recall guarantee Manku et al.'s simhash dedup (WWW '07)
    builds Google's near-dup detection on, with no all-pairs stage.

    Returns (doc_a, doc_b, hamming), doc_a < doc_b, hamming ≤
    ``max_hamming``. Scale shape: signatures are one explode+groupBy;
    the band join shuffles (band_key, id, sig) triples only — never
    text — and hot band buckets are bounded by signature entropy (a
    degenerate corpus where everything collides is already one
    exact-dup group)."""
    if max_hamming >= n_bands:
        raise ValueError(
            "recall guarantee requires max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})"
        )
    if bits % n_bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // n_bands
    mask = (1 << width) - 1
    sig = simhash(docs, id_col=id_col, text_col=text_col, bits=bits)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band_idx", "bk.band_val")
    a = bands.select(
        F.col("band_idx"), F.col("band_val"),
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("__sa"),
    )
    b = bands.select(
        F.col("band_idx"), F.col("band_val"),
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("__sb"),
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "__sa", "__sb")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
