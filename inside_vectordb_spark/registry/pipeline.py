"""Training-data pipeline registry: dedup + text analysis.

Every stage of the MinHash pipeline (signatures → band keys →
candidate pairs → verified near-dups) is independently registered and
oracle-checked — the oracle re-states the same portable-hash math in
DuckDB SQL, so this isn't a rows-only rubber stamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators import dedup as dd
from inside_vectordb_spark.functions.text import tokenize, tokenize_sql
from inside_vectordb_spark.operators import textstats as ts
from inside_vectordb_spark import _meta_io as mio
from inside_vectordb_spark.registry import register

# ---- shared DuckDB fragments -------------------------------------------

# spelled via the canonical tokenize_sql helper (advice r10): the old
# inline fragment embedded raw control characters (unescaped
# '\t\n\f\r') into the regex literal — functionally identical, but
# fragile to whitespace-normalizing tooling and a second spelling of
# the ONE cross-engine tokenizer rule
_TOKS = tokenize_sql("text")

_SHINGLES = f"""
    list_distinct(list_transform(
        range(1, greatest(len({_TOKS}) - 2, 0) + 1),
        i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2])))
"""

_SH_CTE = f"""
    shs AS (SELECT doc_id, {_SHINGLES} AS shset FROM documents),
    sh AS (SELECT doc_id, unnest(shset) AS sh FROM shs)
"""

_K = dd.MINHASH_K
_BANDS = dd.MINHASH_BANDS
_RPB = _K // _BANDS

# Same one-md5 + multiply-add family as operators/dedup.py: exact
# 64-bit integer arithmetic, identical in both engines.
_SIG_SELECT = ", ".join(
    f"min((b1 * {a} + b2 * {c} + {d}) % {dd.MINHASH_PRIME}) AS mh{i}"
    for i, (a, c, d) in enumerate(dd.MINHASH_PARAMS[:_K])
)

_SIG_CTE = f"""
    {_SH_CTE},
    based AS (
      SELECT doc_id,
             ('0x' || substr(md5(sh), 1, 15))::BIGINT % 1073741824 AS b1,
             ('0x' || substr(md5(sh), 1, 15))::BIGINT // 1073741824 AS b2
      FROM sh),
    sig AS (SELECT doc_id, {_SIG_SELECT} FROM based GROUP BY doc_id)
"""

_BANDS_CTE = (
    "bands AS ("
    + " UNION ALL ".join(
        f"""SELECT doc_id, {b} AS band_idx,
            concat_ws('|', {', '.join(f'mh{b * _RPB + r}' for r in range(_RPB))}) AS band_key
            FROM sig"""
        for b in range(_BANDS)
    )
    + ")"
)

_PAIRS_CTE = f"""
    {_BANDS_CTE},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
"""

_JACCARD = """
    CASE WHEN len(list_distinct(sa.shset || sb.shset)) = 0 THEN 0.0
         ELSE len(list_intersect(sa.shset, sb.shset)) * 1.0
              / len(list_distinct(sa.shset || sb.shset)) END
"""



# The quality heuristic's SQL, factored into THREE shared pieces
# (review r7: the raw-counts select, the ratio select, and the
# weighted formula were duplicated verbatim between _QUALITY_CTE and
# _QUALITY_SQL — a weight/bound tweak applied to one would silently
# diverge quality_scores from the percentile gate and curation DAGs).
_QUALITY_RAW_SELECT = f"""SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE len({_TOKS}) * 1.0 END AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 AS n_alpha,
             length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g')) * 1.0 AS n_nonspace,
             CASE WHEN trim(text) = '' THEN 0.0
                  ELSE len(list_filter({_TOKS},
                       t -> t IN ('the','a','and','of','to','is'))) * 1.0 END AS stop_hits
      FROM documents"""

_QUALITY_RATIO_SELECT = """SELECT doc_id, n,
             CASE WHEN n = 0 THEN 0.0 ELSE n_nonspace / n END AS avg_wl,
             CASE WHEN n = 0 THEN 0.0 ELSE stop_hits / n END AS stop_ratio,
             CASE WHEN n_nonspace = 0 THEN 0.0 ELSE n_alpha / n_nonspace END AS alpha_ratio"""

_QUALITY_EXPR = """round(0.25 * (CASE WHEN n >= 5 AND n <= 1000 THEN 1.0 ELSE 0.0 END)
                 + 0.25 * (CASE WHEN avg_wl >= 2.0 AND avg_wl <= 13.0 THEN 1.0 ELSE 0.0 END)
                 + 0.25 * least(stop_ratio * 5, 1.0)
                 + 0.25 * alpha_ratio, 6)"""

_QUALITY_CTE = f"""
    qt AS ({_QUALITY_RAW_SELECT}),
    qr AS ({_QUALITY_RATIO_SELECT}
      FROM qt),
    qual AS (
      SELECT doc_id,
             {_QUALITY_EXPR} AS quality
      FROM qr)
"""

# ---- dedup ---------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keeper_id
    FROM documents GROUP BY md5(text) HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups via content-hash groupBy."""
    return dd.exact_duplicates(eio.load_table(spark, sf_dir, "documents"))


@register(
    "minhash_signatures",
    oracle=f"WITH {_SIG_CTE} SELECT * FROM sig",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (K=12) from word 3-shingles."""
    return dd.minhash_signatures(eio.load_table(spark, sf_dir, "documents"))


@register(
    "minhash_candidate_pairs",
    oracle=f"WITH {_SIG_CTE}, {_PAIRS_CTE} SELECT doc_a, doc_b FROM pairs",
)
def minhash_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket candidate pairs (4 bands × 3 rows)."""
    return dd.minhash_candidate_pairs(eio.load_table(spark, sf_dir, "documents"))


@register(
    "minhash_near_duplicates",
    oracle=f"""
    WITH {_SIG_CTE}, {_PAIRS_CTE}
    SELECT p.doc_a, p.doc_b, round({_JACCARD}, 6) AS jaccard
    FROM pairs p
    JOIN shs sa ON sa.doc_id = p.doc_a
    JOIN shs sb ON sb.doc_id = p.doc_b
    WHERE round({_JACCARD}, 6) >= 0.2
    """,
)
def minhash_near_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: candidates verified by exact Jaccard."""
    return dd.minhash_near_duplicates(
        eio.load_table(spark, sf_dir, "documents"), threshold=0.2
    )


@register(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE}, {_PAIRS_CTE},
    nd AS (
      SELECT p.doc_a, p.doc_b FROM pairs p
      JOIN shs sa ON sa.doc_id = p.doc_a
      JOIN shs sb ON sb.doc_id = p.doc_b
      WHERE round({_JACCARD}, 6) >= 0.2),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM nd
              UNION SELECT doc_b AS src, doc_a AS dst FROM nd),
    reach(id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of verified near-dup pairs: (doc_id,
    cluster_id = min reachable id). The oracle states the same
    fixpoint as a recursive CTE — the Spark side reaches it by
    min-label propagation (O(diameter) rounds, (id,label)-only
    shuffles; see operators/dedup.py:connected_components)."""
    return dd.near_duplicate_clusters(
        eio.load_table(spark, sf_dir, "documents"), threshold=0.2
    )


@register(
    "ngram_jaccard_neighbors",
    oracle=f"""
    WITH shs AS (SELECT doc_id, {_SHINGLES} AS shset FROM documents)
    SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, round({_JACCARD}, 6) AS jaccard
    FROM shs sa JOIN shs sb ON sb.doc_id = sa.doc_id + 1
    """,
)
def ngram_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard exercised densely: similarity of each doc with
    its id-successor (deterministic linear pair set, no LSH gate)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("doc_a")).join(
        docs.select((F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b")),
        "doc_a",
    )
    return dd.ngram_jaccard(docs, pairs)


@register(
    "simhash_signatures",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
          FROM tok WHERE tok <> ''),
    bits AS (SELECT doc_id,
        {', '.join(f'sum(((h >> {j}) & 1) * 2 - 1) AS s{j}' for j in range(dd.SIMHASH_BITS))}
      FROM h GROUP BY doc_id)
    SELECT doc_id,
      CAST({' + '.join(f'CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END' for j in range(dd.SIMHASH_BITS))} AS BIGINT) AS simhash
    FROM bits
    """,
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charikar SimHash (16-bit) over token hashes."""
    return dd.simhash(eio.load_table(spark, sf_dir, "documents"))


# 60-bit signatures for the SEARCH query (Manku et al. run 64): the
# 4 bands are then 15 bits wide → 32768 values per band, so band
# buckets hold ~N/32768 docs and candidate counts stay near-linear.
# (16-bit signatures — the display query above — give 16 values per
# band: candidates grow quadratically, measured 4.1 s at sf0.1 vs
# sub-second at 60 bits.) 60, not 64, keeps 2^j inside signed BIGINT
# for the SQL twin.
_SIMHASH_ND_BITS = 60

_SIMHASH_SIG60_CTE = f"""
    tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    hh AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
           FROM tok WHERE tok <> ''),
    sbits AS (SELECT doc_id,
        {', '.join(f'sum(((h >> {j}) & 1) * 2 - 1) AS s{j}' for j in range(_SIMHASH_ND_BITS))}
      FROM hh GROUP BY doc_id),
    sig AS (SELECT doc_id,
      CAST({' + '.join(f'CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END' for j in range(_SIMHASH_ND_BITS))} AS BIGINT) AS simhash
    FROM sbits)
"""


@register(
    "simhash_near_duplicates",
    oracle=f"""
    WITH {_SIMHASH_SIG60_CTE},
    bands AS (
      SELECT doc_id, simhash, b AS band_idx,
             (simhash >> (15 * b)) & 32767 AS band_val
      FROM sig, unnest([0, 1, 2, 3]) AS t(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def simhash_near_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup SEARCH (Manku et al. WWW '07): 60-bit
    signatures, 4-band candidate join (15-bit bands → ~N/32768 docs
    per bucket) + exact Hamming verify at radius 3 — with
    max_hamming < n_bands the pigeonhole guarantee makes the banded
    join exhaustive (every true pair shares a band), so this is the
    complete dedup operator, not a signature display. Bands shuffle
    (band_key, id, sig) triples only; text never moves."""
    return dd.simhash_near_duplicates(
        eio.load_table(spark, sf_dir, "documents"), bits=_SIMHASH_ND_BITS
    )


_COS_AB = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    "  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@register(
    "embedding_near_duplicates",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_AB}, 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_COS_AB}, 6) >= 0.8
    """,
)
def embedding_near_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dups within a blocking key (label)."""
    return dd.embedding_near_duplicates(
        eio.load_table(spark, sf_dir, "embeddings"), threshold=0.8
    )


@register("embedding_near_duplicates_lsh")
def embedding_near_duplicates_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production blocking: LSH buckets instead of a label column
    (rows-only — np.random hyperplanes are not SQL-expressible; the
    hash-verifiable twin is ``embedding_near_duplicates_det``; recall
    behavior is asserted in tests/test_ann.py on a clustered corpus)."""
    return dd.embedding_near_duplicates_lsh(
        eio.load_table(spark, sf_dir, "embeddings"), dim=64, threshold=0.8
    )


def _nd_det_oracle(
    threshold: float = 0.8,
    n_tables: int = 4,
    bits_per_table: int = 8,
    dim: int = 64,
) -> str:
    """Full SQL restatement of the deterministic banded sign-LSH
    near-dup search: per-table md5-parity plane buckets (the exact
    ``bucket_sql`` fold order ``sign_bucket`` uses), capped buckets,
    bucket-keyed candidate pairs, exact-cosine verify."""
    from inside_vectordb_spark.operators.ann_sign import bucket_sql, sign_planes

    planes = sign_planes(n_tables * bits_per_table, dim)
    per_table = " UNION ALL ".join(
        f"SELECT id, {t} AS table_idx, "
        f"{bucket_sql('v', planes[t * bits_per_table:(t + 1) * bits_per_table])}"
        " AS bucket FROM e"
        for t in range(n_tables)
    )
    cos = (
        "list_dot_product(ea.v, eb.v)"
        " / (sqrt(list_dot_product(ea.v, ea.v))"
        "  * sqrt(list_dot_product(eb.v, eb.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    b AS ({per_table}),
    capped AS (
      SELECT id, table_idx, bucket,
             row_number() OVER (PARTITION BY table_idx, bucket
                                ORDER BY id) AS rn
      FROM b),
    c AS (SELECT id, table_idx, bucket FROM capped WHERE rn <= 2000),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, bb.id AS id_b
      FROM c a JOIN c bb USING (table_idx, bucket)
      WHERE a.id < bb.id)
    SELECT id_a, id_b, round({cos}, 6) AS cos_sim
    FROM pairs
    JOIN e ea ON ea.id = pairs.id_a
    JOIN e eb ON eb.id = pairs.id_b
    WHERE round({cos}, 6) >= {threshold}
    """


@register("embedding_near_duplicates_det", oracle=_nd_det_oracle(threshold=0.35))
def embedding_near_duplicates_det_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup search blocked by DETERMINISTIC
    banded sign-LSH (4 tables × 8 md5-parity planes) — the
    hash-verifiable twin of ``embedding_near_duplicates_lsh``,
    completing the det-twin program for the near-dup tier: every
    stage (plane signs, bucket fold order, bucket cap, candidate
    join, cosine verify) restates in the DuckDB oracle.

    The registered threshold is 0.35, NOT the production 0.8 default:
    the synthetic embeddings fixture has no true near-dups (max
    pairwise cosine ≈ 0.51 at sf0.01), so at 0.8 every variant
    hash-matches on the empty set — a trivial signal. At 0.35 the
    banded blocking and the verify filter both do real work (14
    surviving pairs at sf0.01) and the hash certifies actual
    values."""
    return dd.embedding_near_duplicates_det(
        eio.load_table(spark, sf_dir, "embeddings"), threshold=0.35
    )


# Floors for the planted-near-dup recall envelope. At the production
# threshold (0.8) the synthetic fixture has NO true pairs (max
# pairwise cosine ≈ 0.51), and at a threshold low enough to have
# pairs (0.35) BOTH blockings are deliberately lossy s-curve samples
# (measured: the stochastic and det candidate sets overlap at only
# 0.17-0.29) — so a raw vs-det-twin floor would certify noise. The
# envelope instead PLANTS deterministic near-dup twins (cos ≈ 0.9998)
# and asserts recall of that ground truth for both blockings at the
# threshold the operator actually targets; s-curve math puts the
# per-pair miss probability below 1e-5 at these corpus sizes, and the
# measured recall is 1.0 at sf0.001/0.01/0.1 for both arms. The 0.9
# floor leaves margin for the adaptive-bit-width step at other
# corpus sizes.
_ND_RECALL_FLOORS = {"det": 0.9, "lsh": 0.9}
_ND_PLANT_OFFSET = 10_000_000
_ND_PLANT_MOD = 5

_ND_LSH_RECALL_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{m}' AS method, CAST(0.8 AS DOUBLE) AS threshold, "
    f"CAST({f} AS DOUBLE) AS recall_floor, true AS floor_ok"
    for m, f in sorted(_ND_RECALL_FLOORS.items())
)


@register("embedding_near_duplicates_lsh_recall", oracle=_ND_LSH_RECALL_ORACLE)
def embedding_near_duplicates_lsh_recall_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality envelope for the near-dup BLOCKING stage (r11 verdict
    #3), the ``ann_stochastic_recall_floor`` pattern: every 5th vector
    gets a planted twin (id + 1e7, alternate dims scaled ±2% → cosine
    ≈ 0.9998), then both near-dup variants run at the production
    threshold 0.8 on the augmented corpus and their recall of the
    planted pairs is asserted against a pinned floor AS DATA. The
    verify stage makes precision exact by construction (every emitted
    pair is exact-cosine-checked ≥ threshold — and the original corpus
    has no 0.8-pairs, so emitted ≈ planted); what can be lost is
    candidate-generation recall, which is exactly what this row
    bounds, for the stochastic hyperplanes AND the det md5-parity
    planes in one tagged pass."""
    from pyspark.sql import functions as F

    emb = eio.load_table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % _ND_PLANT_MOD == 0).select(
        (F.col("vec_id") + _ND_PLANT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x * F.when(i % 2 == 0, F.lit(1.02)).otherwise(F.lit(0.98))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    # pinned once: BOTH near-dup variants consume this frame several
    # times each (signature fold, bucket count, verify probes) and the
    # union+transform lineage would otherwise re-scan embeddings per
    # consumer (measured: 17 scans in the unpinned plan → 1)
    planted = (
        emb.select("vec_id", "embedding", "label")
        .unionByName(twins)
        .localCheckpoint(eager=True)
    )
    # the planted ground truth: (original, twin) canonical pairs
    truth = emb.filter(F.col("vec_id") % _ND_PLANT_MOD == 0).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + _ND_PLANT_OFFSET).alias("id_b"),
    )
    n_truth = truth.count()  # N/5, metadata-cheap
    arms = {
        "det": dd.embedding_near_duplicates_det(planted, threshold=0.8),
        "lsh": dd.embedding_near_duplicates_lsh(
            planted, dim=64, threshold=0.8
        ),
    }
    tagged = None
    for m, pairs in arms.items():
        part = pairs.select(
            F.lit(m).alias("method"), "id_a", "id_b"
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    hits = (
        tagged.join(truth, ["id_a", "id_b"])
        .groupBy("method")
        .agg(F.count("*").alias("n_hits"))
    )
    floors = spark.createDataFrame(
        sorted(_ND_RECALL_FLOORS.items()), "method string, recall_floor double"
    )
    return (
        floors.join(F.broadcast(hits), "method", "left")
        .select(
            "method",
            F.lit(0.8).alias("threshold"),
            "recall_floor",
            (
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(n_truth))
                >= F.col("recall_floor")
            ).alias("floor_ok"),
        )
        .orderBy("method")
    )


# ---- text analysis -------------------------------------------------------

_MARKERS_SQL = {
    lang: "(" + ", ".join(f"'{m}'" for m in ms) + ")"
    for lang, ms in ts.LANG_MARKERS.items()
}


def _ratio_sql(lang: str) -> str:
    return f"""
    round(CASE WHEN trim(text) = '' THEN 0.0
          ELSE len(list_filter({_TOKS}, t -> t IN {_MARKERS_SQL[lang]})) * 1.0
               / len({_TOKS}) END, 6)
    """


@register(
    "lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             {_ratio_sql('en')} AS score_en,
             {_ratio_sql('de')} AS score_de,
             {_ratio_sql('fr')} AS score_fr
      FROM documents)
    SELECT doc_id, score_en, score_de, score_fr,
           CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
                WHEN score_de >= score_fr THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM s
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language-ID heuristic."""
    return ts.lang_id(eio.load_table(spark, sf_dir, "documents"))


@register(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{ts.BPE_ISH_PATTERN}')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    return ts.token_counts(eio.load_table(spark, sf_dir, "documents"))


# Quality computation as a standalone SELECT, shared by the
# quality_scores oracle and the percentile-gate oracle — assembled
# from the SAME three fragments as _QUALITY_CTE (review r7).
_QUALITY_SQL = f"""
    WITH t AS ({_QUALITY_RAW_SELECT}),
    r AS ({_QUALITY_RATIO_SELECT}
      FROM t)
    SELECT doc_id, CAST(n AS INT) AS n_words,
           round(avg_wl, 6) AS avg_word_len,
           round(stop_ratio, 6) AS stopword_ratio,
           round(alpha_ratio, 6) AS alpha_ratio,
           {_QUALITY_EXPR} AS quality
    FROM r
"""


@register("quality_scores", oracle=_QUALITY_SQL)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality gate."""
    return ts.quality_scores(eio.load_table(spark, sf_dir, "documents"))


@register(
    "quality_percentile_gate",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL}),
    th AS (SELECT round(quantile_cont(quality, 0.25), 6) AS th FROM q)
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN q.quality >= th.th THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           any_value(th.th) AS threshold
    FROM documents d JOIN q ON q.doc_id = d.doc_id CROSS JOIN th
    GROUP BY d.source ORDER BY d.source
    """,
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-RELATIVE quality filtering: the gate threshold is the
    exact 25th percentile of the corpus's own quality distribution
    (the CCNet-style per-corpus calibration — an absolute cutoff
    tuned on one snapshot silently over/under-filters the next),
    reported as per-source pass counts.

    Scale shape: exact ``percentile`` is safe here because the score
    domain is discretized (6-decimal rounding of quarter-weighted
    ratios → bounded distinct values, so the aggregation buffer stays
    small regardless of corpus size); for an unbounded-domain metric
    use the ``doc_length_percentiles_approx`` pattern
    (approx_percentile) instead. The 1-row threshold rides a
    broadcast nested loop; everything else is one groupBy(source)
    with map-side partials. The threshold is rounded to 6 decimals on
    BOTH engines before the >= comparison so tie docs gate
    identically."""
    docs = eio.load_table(spark, sf_dir, "documents")
    q = ts.quality_scores(docs).select("doc_id", "quality")
    th = q.agg(
        F.round(F.expr("percentile(quality, 0.25)"), 6).alias("th")
    )
    return (
        docs.select("doc_id", "source")
        .join(q, "doc_id")
        .join(F.broadcast(th))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("quality") >= F.col("th"), 1).otherwise(0)
            ).alias("n_pass"),
            F.any_value(F.col("th")).alias("threshold"),
        )
        .orderBy("source")
    )


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive bag-of-words fingerprint."""
    return ts.doc_fingerprints(eio.load_table(spark, sf_dir, "documents"))


@register(
    "pii_redaction",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, text,
        regexp_replace(text, '{ts.PII_EMAIL}', '<EMAIL>', 'g') AS after_email,
        regexp_replace(regexp_replace(text, '{ts.PII_EMAIL}', '<EMAIL>', 'g'),
            '{ts.PII_PHONE}', '<PHONE>', 'g') AS after_phone
      FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '{ts.PII_EMAIL}')) AS INT) AS n_emails,
      CAST(len(regexp_extract_all(after_email, '{ts.PII_PHONE}')) AS INT)
          AS n_phones,
      CAST(len(regexp_extract_all(after_phone, '{ts.PII_IPV4}')) AS INT)
          AS n_ips,
      md5(regexp_replace(after_phone, '{ts.PII_IPV4}', '<IP>', 'g'))
          AS redacted_hash
    FROM staged
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: email/phone/IPv4 redaction with per-class counts
    (patterns valid in both Java regex and RE2; planted-PII behavior
    asserted in tests/test_textquality.py)."""
    return ts.pii_redact(eio.load_table(spark, sf_dir, "documents"))


@register(
    "repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n
      FROM documents),
    base AS (
      SELECT doc_id, CAST(n AS INT) AS n_words,
             round(CASE WHEN n = 0 THEN 0.0
                   ELSE (n - len(list_distinct(toks))) * 1.0 / n END, 6)
                 AS dup_word_frac
      FROM t),
    bg AS (
      SELECT doc_id, unnest(list_transform(
               range(1, greatest(n - 1, 0) + 1),
               i -> concat_ws(' ', toks[i], toks[i+1]))) AS bg
      FROM t WHERE n >= 2),
    per AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
    top AS (
      SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
      FROM per GROUP BY doc_id)
    SELECT b.doc_id, b.n_words, b.dup_word_frac,
           coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM base b LEFT JOIN top t USING (doc_id)
    """,
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction and
    top-bigram share — the boilerplate/spam filter."""
    return ts.repetition_stats(eio.load_table(spark, sf_dir, "documents"))


@register(
    "decontamination",
    oracle=f"""
    WITH shs AS (SELECT doc_id, {_SHINGLES} AS shset FROM documents),
    ev AS (SELECT DISTINCT unnest(shset) AS sh FROM shs WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, shset FROM shs WHERE doc_id % 97 <> 0),
    hits AS (
      SELECT e.doc_id, CAST(count(*) AS INT) AS n_overlap
      FROM (SELECT doc_id, unnest(shset) AS sh FROM tr) e
      JOIN ev USING (sh) GROUP BY e.doc_id)
    SELECT t.doc_id, CAST(len(t.shset) AS INT) AS n_shingles, h.n_overlap,
           round(h.n_overlap * 1.0 / len(t.shset), 6) AS contamination
    FROM tr t JOIN hits h USING (doc_id)
    WHERE round(h.n_overlap * 1.0 / len(t.shset), 6) >= 0.05
    """,
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs whose 3-shingle sets
    overlap the held-out slice (doc_id % 97 == 0 stands in for the
    benchmark suite) above 5% — tuned to the synthetic corpus's
    low-collision shingle distribution so the gate visibly fires.
    Eval shingles are broadcast; the corpus never shuffles."""
    docs = eio.load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    return ts.decontaminate(tr, ev, threshold=0.05)


def _curation_survivors(docs: DataFrame, drops: DataFrame) -> DataFrame:
    """The quality-gate + exact-dedup-keeper + near-dup-anti-join
    survivor chain BOTH curation DAGs share (review r7 — previously
    copy-pasted, so a gate/keeper tweak could reach only one).
    ``drops`` is a single-column ``doc_b`` relation of near-dup
    casualties; the two variants differ only in how it is derived
    (pairwise rule vs transitive clusters)."""
    keepers = (
        docs.select(F.md5("text").alias("__h"), "doc_id")
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    scored = docs.withColumn("quality", ts.quality_expr("text"))
    survivors = (
        scored.filter(F.col("quality") >= 0.5)
        .join(keepers, "doc_id", "left_semi")
        .join(drops, scored.doc_id == drops.doc_b, "left_anti")
    )
    return survivors.select("doc_id", "lang", "n_chars", "quality")


@register(
    "corpus_curation",
    oracle=f"""
    WITH {_SIG_CTE}, {_PAIRS_CTE}, {_QUALITY_CTE},
    nd AS (
      SELECT DISTINCT p.doc_b FROM pairs p
      JOIN shs sa ON sa.doc_id = p.doc_a
      JOIN shs sb ON sb.doc_id = p.doc_b
      WHERE round({_JACCARD}, 6) >= 0.2),
    keepers AS (
      SELECT md5(text) AS h, min(doc_id) AS k FROM documents GROUP BY 1)
    SELECT d.doc_id, d.lang, d.n_chars, q.quality
    FROM documents d
    JOIN qual q USING (doc_id)
    JOIN keepers ON md5(d.text) = keepers.h
    WHERE q.quality >= 0.5
      AND d.doc_id = keepers.k
      AND d.doc_id NOT IN (SELECT doc_b FROM nd)
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation as ONE lazy DAG: quality
    gate (heuristic score >= 0.5) ∧ exact-dedup survivor (lowest
    doc_id per content hash) ∧ near-dup survivor (not the higher id
    of any verified MinHash pair). All three predicates are computed
    globally, so stage order cannot change the result — the form a
    production curation run wants, since each filter is a separate
    reusable gate. Plan at 100 TB: the quality gate is a pure
    Catalyst projection (zero shuffle — no self-join against
    ``quality_scores``); the exact-dedup keeper shuffles only
    ``(md5(text), doc_id)`` pairs with a map-side partial min (the
    ``exact_duplicates`` shape), then rejoins by id — the full-text
    rows never move over the network; near-dup drops arrive as a
    (small) anti-join side."""
    docs = eio.load_table(spark, sf_dir, "documents")
    drops = (
        dd.minhash_near_duplicates(docs, threshold=0.2)
        .select("doc_b").distinct()
    )
    return _curation_survivors(docs, drops)


@register(
    "corpus_curation_clustered",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE}, {_PAIRS_CTE}, {_QUALITY_CTE},
    nd0 AS (
      SELECT p.doc_a, p.doc_b FROM pairs p
      JOIN shs sa ON sa.doc_id = p.doc_a
      JOIN shs sb ON sb.doc_id = p.doc_b
      WHERE round({_JACCARD}, 6) >= 0.2),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM nd0
              UNION SELECT doc_b AS src, doc_a AS dst FROM nd0),
    reach(id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
    nd AS (SELECT id AS doc_b FROM comp WHERE id <> cluster_id),
    keepers AS (
      SELECT md5(text) AS h, min(doc_id) AS k FROM documents GROUP BY 1)
    SELECT d.doc_id, d.lang, d.n_chars, q.quality
    FROM documents d
    JOIN qual q USING (doc_id)
    JOIN keepers ON md5(d.text) = keepers.h
    WHERE q.quality >= 0.5
      AND d.doc_id = keepers.k
      AND d.doc_id NOT IN (SELECT doc_b FROM nd)
    """,
)
def corpus_curation_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corpus_curation`` with the CLUSTER-correct near-dup survivor
    rule: exactly one survivor (the min id) per TRANSITIVE near-dup
    cluster. The pairwise rule (drop the larger id of each verified
    pair) keeps every local-min — a doc smaller than all its direct
    neighbors survives even when its cluster contains a smaller
    member it never directly paired with; the component pass closes
    that gap (pairs (1,3),(2,3): pairwise keeps {1,2}, clustered
    keeps {1}). This is the form a production dedup actually ships
    (one representative per cluster), at the cost of the O(log n)
    label-propagation rounds on the (small) pair graph."""
    docs = eio.load_table(spark, sf_dir, "documents")
    clusters = dd.near_duplicate_clusters(docs, threshold=0.2)
    drops = (
        clusters.filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias("doc_b"))
    )
    return _curation_survivors(docs, drops)


_PACK_SHARDS = 64  # registered variant: fixed so the oracle can mirror it


@register(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS INT)
                 AS n_ws_tokens
      FROM documents),
    c AS (
      SELECT doc_id, shard, n_ws_tokens,
             sum(n_ws_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(shard * 1000000000000 + (cum - n_ws_tokens) // 512 AS BIGINT)
               AS seq_id,
           n_ws_tokens
    FROM c
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (start-offset bucketing; see
    ``operators.textstats.pack_sequences`` for the overflow
    contract). The registered variant
    pins ``n_shards`` (so the DuckDB oracle can mirror the shard
    arithmetic); the operator itself defaults to 4× cluster
    parallelism — the shard count is the packing window's parallelism
    and must scale with the cluster, not sit at a constant."""
    docs = eio.load_table(spark, sf_dir, "documents")
    return ts.pack_sequences(docs, n_shards=_PACK_SHARDS)


_LTOKS = tokenize_sql("lower(text)")

_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_ctes(depth: int) -> str:
    """CTE chain q→…→bm_r: BM25 ranked lists at the given depth, for
    the 6 deterministic first-5-token queries. Shared by the bm25 and
    hybrid-RRF oracles."""
    return f"""
    q AS (
      SELECT doc_id AS query_id,
             concat_ws(' ', {_LTOKS}[1], {_LTOKS}[2], {_LTOKS}[3],
                       {_LTOKS}[4], {_LTOKS}[5]) AS qt
      FROM documents WHERE doc_id < 6),
    toks AS (SELECT doc_id, unnest({_LTOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY doc_id, term),
    dl AS (SELECT doc_id,
                  CASE WHEN trim(text) = '' THEN 0 ELSE len({_LTOKS}) END AS dl
           FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    qterms AS (
      SELECT query_id, unnest(list_distinct(list_filter(regexp_split_to_array(qt, '[ \\t\\n\\f\\r]+'), t -> t <> ''))) AS term
      FROM q),
    dft AS (SELECT term, count(*) AS df FROM tf
            WHERE term IN (SELECT term FROM qterms) GROUP BY term),
    per AS (
      SELECT qt.query_id, tf.doc_id,
             ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
             * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)) AS w
      FROM tf
      JOIN qterms qt USING (term)
      JOIN dft USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    bm_agg AS (SELECT query_id, doc_id, round(sum(w), 6) AS bm25
               FROM per GROUP BY query_id, doc_id),
    bm_r AS (SELECT query_id, doc_id, bm25,
                    CAST(row_number() OVER (PARTITION BY query_id
                                            ORDER BY bm25 DESC, doc_id) AS INT) AS rank
             FROM bm_agg
             QUALIFY rank <= {depth})
    """


_TFIDF_ORACLE = f"""
    WITH q AS (
      SELECT doc_id AS query_id,
             concat_ws(' ', {_LTOKS}[1], {_LTOKS}[2], {_LTOKS}[3],
                       {_LTOKS}[4], {_LTOKS}[5]) AS qt
      FROM documents WHERE doc_id < 6),
    toks AS (SELECT doc_id, unnest({_LTOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term <> '' GROUP BY doc_id, term),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    docw AS (
      SELECT doc_id, term,
             (1 + ln(tf)) * (ln((1.0 + n.n_docs) / (1.0 + df)) + 1) AS wd
      FROM tf JOIN dft USING (term) CROSS JOIN nd n),
    dnorm AS (SELECT doc_id, sqrt(sum(wd * wd)) AS dnorm
              FROM docw GROUP BY doc_id),
    qtf AS (
      SELECT query_id, term, count(*) AS tf FROM (
        SELECT query_id,
               unnest(list_filter(regexp_split_to_array(qt, '[ \\t\\n\\f\\r]+'), t -> t <> '')) AS term
        FROM q)
      WHERE term <> '' GROUP BY query_id, term),
    qw AS (
      SELECT query_id, term,
             (1 + ln(tf)) *
             (ln((1.0 + n.n_docs) / (1.0 + coalesce(df, 0))) + 1) AS wq
      FROM qtf LEFT JOIN dft USING (term) CROSS JOIN nd n),
    qnorm AS (SELECT query_id, sqrt(sum(wq * wq)) AS qnorm
              FROM qw GROUP BY query_id),
    per AS (
      SELECT qw.query_id, d.doc_id,
             (qw.wq / qn.qnorm) * (d.wd / dn.dnorm) AS w
      FROM docw d
      JOIN qw USING (term)
      JOIN dnorm dn ON dn.doc_id = d.doc_id
      JOIN qnorm qn ON qn.query_id = qw.query_id),
    agg AS (SELECT query_id, doc_id, round(sum(w), 6) AS tfidf
            FROM per GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, tfidf, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY tfidf DESC, doc_id) AS INT) AS rank
      FROM agg) WHERE rank <= 10
"""


@register("tfidf_topk", oracle=_TFIDF_ORACLE)
def tfidf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine top-10 per query — the vector-space scorer
    (sublinear tf, sklearn smooth idf, full-vocabulary L2 norms on
    both sides) next to the probabilistic BM25 arm, over the same 6
    deterministic first-5-token queries. Unlike BM25, document norms
    need the FULL dictionary (operators/tfidf.py documents the
    index-time df/norm precompute at scale); the oracle restates
    every arithmetic step including both norms."""
    from inside_vectordb_spark.operators.tfidf import tfidf_topk

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return tfidf_topk(docs, queries, k=10)


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_bm25_ctes(10)}
    SELECT query_id, doc_id, bm25, rank FROM bm_r
    """,
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query — the lexical-retrieval arm the
    reference's cosine ranking lacks (hybrid-retrieval stacks run
    both). Queries are derived deterministically: the first 5 tokens
    of docs 0-5. The oracle restates the full scorer (tf, df, idf,
    length normalization, ranked window) in DuckDB SQL, so every
    arithmetic step is cross-engine pinned."""
    from inside_vectordb_spark.operators.bm25 import bm25_topk

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return bm25_topk(docs, queries, k=10)


_RM3_ORACLE = f"""
    WITH {_bm25_ctes(5)},
    rel AS (
      SELECT b.query_id, t.term,
             round(sum((t.tf * 1.0 / d.dl) * b.bm25), 6) AS rw
      FROM bm_r b
      JOIN tf t ON t.doc_id = b.doc_id
      JOIN dl d ON d.doc_id = b.doc_id
      WHERE d.dl > 0
      GROUP BY 1, 2),
    fresh AS (
      SELECT r.* FROM rel r
      WHERE NOT EXISTS (SELECT 1 FROM qterms qt
                        WHERE qt.query_id = r.query_id
                          AND qt.term = r.term)),
    expsel AS (
      SELECT query_id, term, rw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rw DESC, term) AS trank
      FROM fresh QUALIFY trank <= 10),
    sumrw AS (SELECT query_id, sum(rw) AS s FROM expsel GROUP BY 1),
    wts AS (
      SELECT query_id, term, 0.6 AS mult FROM qterms
      UNION ALL
      SELECT e.query_id, e.term, round(0.4 * e.rw / s.s, 6) AS mult
      FROM expsel e JOIN sumrw s USING (query_id)),
    dfall AS (SELECT term, count(*) AS df FROM tf
              WHERE term IN (SELECT DISTINCT term FROM wts) GROUP BY term),
    per2 AS (
      SELECT w.query_id, tf.doc_id,
             ln(1 + (s.n_docs - dfall.df + 0.5) / (dfall.df + 0.5))
             * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                                        + {_BM25_B} * dl.dl / s.avgdl))
             * w.mult AS w
      FROM tf
      JOIN wts w USING (term)
      JOIN dfall USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    agg2 AS (SELECT query_id, doc_id, round(sum(w), 6) AS rm3
             FROM per2 GROUP BY 1, 2),
    r2 AS (SELECT query_id, doc_id, rm3,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY rm3 DESC, doc_id) AS INT)
                    AS rank
           FROM agg2 QUALIFY rank <= 10)
    SELECT query_id, doc_id, rm3, rank FROM r2
    """


@register("bm25_rm3_topk", oracle=_RM3_ORACLE)
def bm25_rm3_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback over BM25 (Lavrenko & Croft; the
    Anserini baseline): top-5 feedback docs per query, 10
    score-weighted expansion terms, alpha=0.6 interpolated weighted
    rescoring — the full two-pass pipeline (operators/rm3.py) with
    every arithmetic step restated in one DuckDB oracle."""
    from inside_vectordb_spark.operators.rm3 import bm25_rm3_topk

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return bm25_rm3_topk(docs, queries, k=10, fb_docs=5, fb_terms=10, alpha=0.6)


_COS_QC = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    "  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
)


@register(
    "hybrid_rrf_topk",
    oracle=f"""
    WITH {_bm25_ctes(50)},
    qv AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 6),
    vscored AS (
      SELECT q.query_id, c.vec_id AS doc_id, {_COS_QC} AS score
      FROM qv q CROSS JOIN embeddings c),
    vr AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
           FROM vscored QUALIFY rank <= 50),
    contrib AS (
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM bm_r
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM vr),
    agg AS (SELECT query_id, doc_id, round(sum(contrib), 6) AS rrf
            FROM contrib GROUP BY query_id, doc_id),
    fused AS (SELECT query_id, doc_id, rrf,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY rrf DESC, doc_id) AS INT) AS rank
              FROM agg)
    SELECT query_id, doc_id, rrf, rank FROM fused WHERE rank <= 10
    """,
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical arm (first-5-token queries over
    docs 0-5) fused with the exact-cosine vector arm (embeddings 0-5
    as query vectors; the testdata's embeddings row i is modeled as
    document i's vector) by reciprocal-rank fusion at depth 50, top
    10 fused hits per query. Fusion touches only the Q·50 candidate
    lists, so its cost is corpus-scale-independent; the oracle
    restates both arms AND the fusion, making this the one
    driver-checkable query that exercises lexical scoring, vector
    scoring, and rank algebra together."""
    from inside_vectordb_spark.operators.bm25 import bm25_topk
    from inside_vectordb_spark.operators.hybrid import rrf_fuse
    from inside_vectordb_spark.operators.topk import exact_cosine_topk

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    tqueries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    emb = eio.load_table(spark, sf_dir, "embeddings")
    vqueries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bm_run = bm25_topk(docs, tqueries, k=50)
    vec_run = exact_cosine_topk(vqueries, emb, k=50)
    return rrf_fuse([bm_run, vec_run], k=10)


def _tfidf_tail_ctes(depth: int) -> str:
    """CTE chain tdft→…→tf_r: TF-IDF cosine ranked lists at the given
    depth over the q/toks/tf base CTEs that ``_bm25_ctes`` defines
    (same queries, same tokenization) — prefixed names so both arms
    compose in one WITH clause."""
    return f"""
    tdft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    tnd AS (SELECT count(*) AS n_docs FROM documents),
    tdocw AS (
      SELECT doc_id, term,
             (1 + ln(tf)) * (ln((1.0 + n.n_docs) / (1.0 + df)) + 1) AS wd
      FROM tf JOIN tdft USING (term) CROSS JOIN tnd n),
    tdnorm AS (SELECT doc_id, sqrt(sum(wd * wd)) AS dnorm
               FROM tdocw GROUP BY doc_id),
    tqtf AS (
      SELECT query_id, term, count(*) AS tf FROM (
        SELECT query_id,
               unnest(list_filter(regexp_split_to_array(qt, '[ \\t\\n\\f\\r]+'), t -> t <> '')) AS term
        FROM q)
      WHERE term <> '' GROUP BY query_id, term),
    tqw AS (
      SELECT query_id, term,
             (1 + ln(tf)) *
             (ln((1.0 + n.n_docs) / (1.0 + coalesce(df, 0))) + 1) AS wq
      FROM tqtf LEFT JOIN tdft USING (term) CROSS JOIN tnd n),
    tqnorm AS (SELECT query_id, sqrt(sum(wq * wq)) AS qnorm
               FROM tqw GROUP BY query_id),
    tper AS (
      SELECT tqw.query_id, d.doc_id,
             (tqw.wq / qn.qnorm) * (d.wd / dn.dnorm) AS w
      FROM tdocw d
      JOIN tqw USING (term)
      JOIN tdnorm dn ON dn.doc_id = d.doc_id
      JOIN tqnorm qn ON qn.query_id = tqw.query_id),
    tagg AS (SELECT query_id, doc_id, round(sum(w), 6) AS tfidf
             FROM tper GROUP BY query_id, doc_id),
    tf_r AS (SELECT query_id, doc_id, tfidf,
                    CAST(row_number() OVER (PARTITION BY query_id
                                            ORDER BY tfidf DESC, doc_id) AS INT) AS rank
             FROM tagg
             QUALIFY rank <= {depth})
    """


@register(
    "hybrid_rrf3_topk",
    oracle=f"""
    WITH {_bm25_ctes(50)},
    {_tfidf_tail_ctes(50)},
    qv AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 6),
    vscored AS (
      SELECT q.query_id, c.vec_id AS doc_id, {_COS_QC} AS score
      FROM qv q CROSS JOIN embeddings c),
    vr AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
           FROM vscored QUALIFY rank <= 50),
    contrib AS (
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM bm_r
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM tf_r
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM vr),
    agg3 AS (SELECT query_id, doc_id, round(sum(contrib), 6) AS rrf
             FROM contrib GROUP BY query_id, doc_id),
    fused AS (SELECT query_id, doc_id, rrf,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY rrf DESC, doc_id) AS INT) AS rank
              FROM agg3)
    SELECT query_id, doc_id, rrf, rank FROM fused WHERE rank <= 10
    """,
)
def hybrid_rrf3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-arm hybrid retrieval: BM25 (probabilistic lexical),
    TF-IDF cosine (vector-space lexical), and exact embedding cosine,
    fused by reciprocal rank at depth 50 — the multi-retriever shape
    production stacks actually run (rrf_fuse takes any number of
    runs; fusion cost stays Q·depth per arm, corpus-scale-free). The
    oracle restates ALL THREE scorers and the fusion in one SQL
    statement."""
    from inside_vectordb_spark.operators.bm25 import bm25_topk
    from inside_vectordb_spark.operators.hybrid import rrf_fuse
    from inside_vectordb_spark.operators.tfidf import tfidf_topk
    from inside_vectordb_spark.operators.topk import exact_cosine_topk

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    tqueries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    emb = eio.load_table(spark, sf_dir, "embeddings")
    vqueries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return rrf_fuse(
        [
            bm25_topk(docs, tqueries, k=50),
            tfidf_topk(docs, tqueries, k=50),
            exact_cosine_topk(vqueries, emb, k=50),
        ],
        k=10,
    )


@register(
    "mixture_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             CAST(20 + ('0x' || substr(md5(source), 1, 4))::BIGINT % 60 AS INT)
                 AS rate_pct,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                 AS bucket
      FROM documents)
    SELECT doc_id, source, rate_pct FROM r WHERE bucket < rate_pct
    """,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling (dataset mixing for training
    runs): each source gets a deterministic keep-rate in [20%, 80%)
    derived from its name hash; rows are kept by id-hash bucket. Both
    hashes are engine-portable md5 arithmetic, so the mixture is
    reproducible anywhere and auditable per row — pure Catalyst
    filter, zero shuffle, pushdown-friendly."""
    docs = eio.load_table(spark, sf_dir, "documents")
    rate = (
        F.conv(F.substring(F.md5("source"), 1, 4), 16, 10).cast("long") % 60 + 20
    ).cast("int")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return (
        docs.withColumn("rate_pct", rate)
        .filter(bucket < F.col("rate_pct"))
        .select("doc_id", "source", "rate_pct")
    )


from inside_vectordb_spark.operators.mmr import mmr_oracle_sql  # noqa: E402

_MMR_ORACLE = mmr_oracle_sql(eio.N_QUERY_VECTORS, 10, 50, 0.7)


@register("mmr_diversified_topk", oracle=_MMR_ORACLE)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-rank (Carbonell & Goldstein '98): exact
    top-50 relevance candidates → greedy λ·rel − (1−λ)·max-sim
    selection of 10 per query (λ=0.7). The redundancy-aware stage the
    reference's plain top-k pipeline (002:170-228) lacks; on near-dup
    heavy training corpora plain top-k returns copies. Greedy loop is
    per-query applyInPandas (parallel across queries, candidate join
    is the only shuffle); oracle = DuckDB RECURSIVE CTE carrying the
    selected-set as list state (operators/mmr.py)."""
    from inside_vectordb_spark.operators.mmr import mmr_topk

    return mmr_topk(
        eio.query_vectors(spark, sf_dir),
        eio.load_table(spark, sf_dir, "embeddings"),
        k=10,
        n_candidates=50,
        lam=0.7,
    )


@register(
    "temperature_mixture",
    oracle="""
    WITH shares AS (
      SELECT source, count(*) AS n_docs,
             count(*) * 1.0 / (SELECT count(*) FROM documents) AS share
      FROM documents GROUP BY source),
    rates AS (
      SELECT source, n_docs,
             round(pow(share, -0.5) /
                   (SELECT max(pow(share, -0.5)) FROM shares), 6) AS keep_rate
      FROM shares),
    kept AS (
      SELECT d.doc_id, d.source, r.keep_rate
      FROM documents d JOIN rates r USING (source)
      WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'),
             1, 8))::BIGINT % 1000000 < CAST(round(r.keep_rate * 1000000, 0) AS BIGINT))
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           any_value(keep_rate) AS keep_rate
    FROM kept GROUP BY source
    """,
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual-corpus
    rebalancing rule, sampling rate ∝ share^(α−1) with α = 0.5 here):
    rare sources are up-weighted relative to dominant ones, rates
    normalized so the most over-represented source keeps 100%.
    Membership is md5-bucketed per doc — deterministic, auditable,
    rerun-stable. Plan: one tiny aggregate for shares (broadcast
    back), then a pure filter — the corpus never shuffles."""
    docs = eio.load_table(spark, sf_dir, "documents")
    total = docs.count()
    shares = docs.groupBy("source").agg(
        (F.count("*") * 1.0 / F.lit(float(total))).alias("share")
    )
    max_w = shares.agg(F.max(F.pow("share", -0.5))).collect()[0][0]
    rates = shares.select(
        "source",
        F.round(F.pow("share", -0.5) / F.lit(float(max_w)), 6).alias("keep_rate"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":temp"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        # round-before-cast: Spark's cast(long) truncates while DuckDB's
        # rounds, and round6*1e6 is not exactly integral in floats
        .filter(bucket < F.round(F.col("keep_rate") * 1_000_000, 0).cast("long"))
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.any_value("keep_rate").alias("keep_rate"),
    )


@register(
    "source_quota_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id)
                 AS keep_rank
      FROM documents)
    SELECT doc_id, source, CAST(keep_rank AS INT) AS keep_rank
    FROM ranked WHERE keep_rank <= 10
    """,
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (the C4/RefinedWeb per-host cap): at
    most 10 docs survive from each source, chosen by a deterministic
    md5 priority so the kept set is rerun- and growth-stable. The
    rank ≤ cap predicate rides Catalyst's WindowGroupLimit pushdown —
    map tasks pre-trim to their local top-10 per source before the
    exchange, so no domain's full contents ever shuffle (the flagship
    top-k shape applied to curation)."""
    from inside_vectordb_spark.operators.traindata import source_cap

    return source_cap(eio.load_table(spark, sf_dir, "documents"), cap=10)


_PPL_BUCKET_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+'), t -> t <> '')) AS term
      FROM documents),
    t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    counts AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
    stats AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM counts),
    lp AS (
      SELECT t.doc_id,
             ln((c.cnt + 0.5) / (s.total + 0.5 * s.vocab)) AS lp
      FROM t JOIN counts c USING (term) CROSS JOIN stats s),
    scores AS (
      SELECT doc_id, round(exp(-avg(lp)), 4) AS perplexity
      FROM lp GROUP BY doc_id),
    scored AS (
      SELECT d.source, s.perplexity,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY s.perplexity, s.doc_id) AS rk,
             count(*) OVER (PARTITION BY d.source) AS n
      FROM scores s JOIN documents d USING (doc_id))
    SELECT source,
           CASE WHEN rk <= CAST(floor(n / 3.0) AS BIGINT) THEN 'head'
                WHEN rk <= CAST(floor(2.0 * n / 3.0) AS BIGINT) THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(perplexity), 4) AS mean_ppl,
           round(max(perplexity), 4) AS max_ppl
    FROM scored GROUP BY 1, 2
"""


@register("perplexity_buckets", oracle=_PPL_BUCKET_ORACLE)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail terciles (Wenzek et al. '19 §4.4): each
    source's scored docs split into perplexity thirds by explicit rank
    arithmetic on ROUNDED scores with id tie-breaks (cross-engine
    stable; no engine ntile()). Rank + per-source count share one
    (source)-keyed window exchange over the tiny scored projection;
    only 3 rows per source leave the stage (operators/lm.py)."""
    from inside_vectordb_spark.operators.lm import perplexity_buckets as pb

    return pb(eio.load_table(spark, sf_dir, "documents"))


_WINNOW_CTES = """
    WITH h AS (
      SELECT doc_id,
             CASE WHEN length(text) - 8 + 1 < 1 THEN CAST([] AS BIGINT[])
                  ELSE list_transform(range(1, length(text) - 8 + 2),
                       i -> (CAST(ascii(substr(text, CAST(i+0 AS INT), 1)) AS BIGINT) * 884666972 + CAST(ascii(substr(text, CAST(i+1 AS INT), 1)) AS BIGINT) * 1513951109 + CAST(ascii(substr(text, CAST(i+2 AS INT), 1)) AS BIGINT) * 2006264048 + CAST(ascii(substr(text, CAST(i+3 AS INT), 1)) AS BIGINT) * 489383267 + CAST(ascii(substr(text, CAST(i+4 AS INT), 1)) AS BIGINT) * 18191447 + CAST(ascii(substr(text, CAST(i+5 AS INT), 1)) AS BIGINT) * 69169 + CAST(ascii(substr(text, CAST(i+6 AS INT), 1)) AS BIGINT) * 263 + CAST(ascii(substr(text, CAST(i+7 AS INT), 1)) AS BIGINT) * 1) % 2147483647)
             END AS H
      FROM documents),
    mins AS (
      SELECT doc_id,
             CASE WHEN len(H) = 0 THEN CAST([] AS BIGINT[])
                  ELSE list_transform(range(1, greatest(len(H) - 4 + 1, 1) + 1),
                       i -> list_min(H[CAST(i AS INT):CAST(i + 4 - 1 AS INT)]))
             END AS M
      FROM h)
"""

_WINNOW_ORACLE = (
    _WINNOW_CTES
    + """
    SELECT doc_id,
           CAST(len(list_distinct(M)) AS INT) AS n_fps,
           array_to_string(list_sort(list_distinct(M)), ',') AS fp_csv
    FROM mins
"""
)


@register("winnowing_fingerprints", oracle=_WINNOW_ORACLE)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (Karp-Rabin 8-gram rolling hash,
    window-4 minima): the local-similarity fingerprint that guarantees
    a shared fingerprint for any shared substring of length >= 11 --
    the rolling-hash complement to the bag-of-words md5 fingerprint."""
    return ts.winnowing_fingerprints(eio.load_table(spark, sf_dir, "documents"))


@register(
    "winnowing_candidates",
    oracle=_WINNOW_CTES
    + """
    , fpd AS (SELECT DISTINCT doc_id, unnest(list_distinct(M)) AS fp FROM mins),
    rare AS (SELECT fp FROM fpd GROUP BY fp HAVING count(*) <= 5),
    rfp AS (SELECT doc_id, fp FROM fpd JOIN rare USING (fp)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS INT) AS n_shared
      FROM rfp a JOIN rfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
    """,
)
def winnowing_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plagiarism/near-dup candidate pairs from shared winnowing
    fingerprints: docs sharing >= 2 RARE fingerprints (document
    frequency <= 5). The rarity gate is the scale guard — common
    substrings (stopword runs) would otherwise make the
    fingerprint-keyed self-join quadratic in the hottest keys; with
    it, each join key fans out to <= 5 docs (<= 10 pairs), the same
    bounded-bucket discipline as the LSH candidate join. Only
    (fingerprint, doc_id) longs shuffle."""
    from inside_vectordb_spark.operators.textstats import winnowing_fingerprints

    fps = winnowing_fingerprints(eio.load_table(spark, sf_dir, "documents"))
    fpd = (
        fps.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.col("fp_csv"), ","))
            ).alias("fp"),
        )
        .filter(F.col("fp") != "")
    )
    rare = fpd.groupBy("fp").agg(F.count("*").alias("df")).filter(F.col("df") <= 5)
    rfp = fpd.join(rare.select("fp"), "fp")
    a = rfp.alias("a")
    b = rfp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("int").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("doc_a", "doc_b", "n_shared")
    )


@register(
    "corpus_merge_upsert",
    oracle="""
    WITH chg AS (
      SELECT doc_id, upper(text) AS text, lang, source, n_chars,
             'update' AS op
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id, text, lang, source, n_chars, 'delete'
      FROM documents WHERE doc_id % 10 = 7
      UNION ALL
      SELECT doc_id + 1000000, text, lang, 'ingest', n_chars, 'insert'
      FROM documents WHERE doc_id % 10 = 1
    ),
    keys AS (SELECT DISTINCT doc_id FROM chg)
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d ANTI JOIN keys k ON d.doc_id = k.doc_id
    UNION ALL
    SELECT doc_id, text, lang, source, n_chars FROM chg WHERE op <> 'delete'
    """,
)
def corpus_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO the document snapshot: a deterministic change batch
    (10% updated, 10% deleted, 10% re-ingested under new ids) applied
    with ``operators.merge.merge_upsert`` — broadcast anti join on the
    change keys, base never shuffles (plan pinned). The scale story is
    copy-on-write: ``touched_buckets`` (tested) gives the pruning
    manifest a bucketed 100-TB layout would rewrite."""
    from inside_vectordb_spark.operators.merge import merge_upsert

    docs = eio.load_table(spark, sf_dir, "documents")
    changes = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select(
            "doc_id", F.upper("text").alias("text"), "lang", "source",
            "n_chars", F.lit("update").alias("op"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 7).select(
                "doc_id", "text", "lang", "source", "n_chars",
                F.lit("delete").alias("op"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang",
                F.lit("ingest").alias("source"), "n_chars",
                F.lit("insert").alias("op"),
            )
        )
    )
    return merge_upsert(docs, changes)


@register(
    "text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[\p{Cc}\p{Cf}]', ' ', 'g'),
                '[ \t\n\r\f\x0B]+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization pre-pass (C4/RefinedWeb shape): the
    content key every dedup tier should hash instead of raw bytes.
    Pure Catalyst (functions/text.py:normalize_text) — zero shuffle,
    and at 100 TB it fuses into the same codegen stage as whatever
    consumes it."""
    from inside_vectordb_spark.functions.text import normalize_text

    return eio.load_table(spark, sf_dir, "documents").select(
        "doc_id", normalize_text("text").alias("norm_text")
    )


@register(
    "rerank_cross_encoder",
    oracle=f"""
    WITH {_bm25_ctes(20)},
    qtok AS (
      SELECT query_id,
             CASE WHEN trim(qt) = '' THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(list_filter(regexp_split_to_array(lower(qt), '[ \\t\\n\\f\\r]+'), t -> t <> ''))
             END AS qset
      FROM q),
    dtok AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+'), t -> t <> ''))
             END AS dset
      FROM documents),
    ce AS (
      SELECT b.query_id, b.doc_id,
             round(CASE WHEN len(list_distinct(qt.qset || dt.dset)) = 0 THEN 0.0
                   ELSE len(list_intersect(qt.qset, dt.dset)) * 1.0
                        / len(list_distinct(qt.qset || dt.dset))
                   END, 6) AS ce_score
      FROM bm_r b
      JOIN qtok qt USING (query_id)
      JOIN dtok dt USING (doc_id))
    SELECT query_id, doc_id, ce_score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY ce_score DESC, doc_id) AS INT) AS rank
      FROM ce) WHERE rank <= 5
    """,
)
def rerank_cross_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: BM25 over-fetches top-20 candidates, a
    pairwise scorer reranks each (query, doc) TEXT pair to top-5 —
    the cross-encoder stage every production stack runs after the
    cheap retriever. Candidates ride a broadcast into the document
    scan; scoring is one Arrow-batched mapInPandas stage
    (operators/rerank.py). The deterministic Jaccard scorer carries a
    FULL DuckDB oracle; the real model branch is import-gated
    sentence-transformers CrossEncoder with identical plumbing."""
    from inside_vectordb_spark.operators.bm25 import bm25_topk
    from inside_vectordb_spark.operators.rerank import cross_encoder_rerank

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    cand = bm25_topk(docs, queries, k=20).select("query_id", "doc_id")
    return cross_encoder_rerank(cand, queries, docs, k=5)


def _build_snapshot_history(spark: SparkSession, docs: DataFrame, art: str) -> None:
    """The canonical v1→v2→v3 snapshot history every snapshot query
    reads: v1 = the corpus, v2 = a MERGE batch (delete ids<5, edit
    5-9, insert 3 clones under +1M ids), v3 = a second edit batch
    (10-14 → edited_v3). Each merge is the broadcast-anti CoW plan."""
    from inside_vectordb_spark.operators.merge import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    write_snapshot(docs, art, 1)
    deletes = docs.filter(F.col("doc_id") < 5).withColumn("op", F.lit("delete"))
    updates = (
        docs.filter(F.col("doc_id").between(5, 9))
        .withColumn("source", F.lit("edited_v2"))
        .withColumn("op", F.lit("update"))
    )
    inserts = (
        docs.filter(F.col("doc_id") < 3)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("source", F.lit("inserted_v2"))
        .withColumn("op", F.lit("insert"))
    )
    merge_into_snapshot(spark, art, deletes.unionByName(updates).unionByName(inserts))
    batch2 = (
        read_snapshot(spark, art)
        .filter(F.col("doc_id").between(10, 14))
        .withColumn("source", F.lit("edited_v3"))
        .withColumn("op", F.lit("update"))
    )
    merge_into_snapshot(spark, art, batch2)


_SNAPSHOT_RECIPE = "v1-merge-v2-merge-v3/1"


def _snapshot_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return eio.load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _ensure_snapshot_history(spark: SparkSession, sf_dir: str) -> str:
    """Build the shared snapshot fixture ONCE per (sf_dir, corpus
    fingerprint) and reuse it across the time-travel / change-feed /
    incremental-view queries — same ``ensure_*`` pattern as the
    persisted ANN indexes (operators/ann_sign.py:ensure_sign_index).
    The measured operator is then the time travel / diff / refresh
    itself, not O(base) fixture I/O on every invocation; a changed
    corpus or recipe at the same path still triggers a rebuild."""
    import os

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint
    from inside_vectordb_spark.operators.merge import snapshot_versions

    docs = _snapshot_docs(spark, sf_dir)
    art = os.path.join(
        mio.artifacts_root(),
        "snapshots",
        "shared_" + (os.path.basename(sf_dir.rstrip("/")) or "default"),
    )
    want = {
        "recipe": _SNAPSHOT_RECIPE,
        "corpus": _corpus_fingerprint(docs, "doc_id"),
    }
    if (
        mio.read_json(mio.join(art, "_fixture.json")) == want
        and snapshot_versions(art) == [1, 2, 3]
    ):
        return art
    mio.remove_tree(art)
    _build_snapshot_history(spark, docs, art)
    # fixture marker written LAST: a half-built fixture is rebuilt
    mio.write_json(mio.join(art, "_fixture.json"), want)
    return art


@register(
    "snapshot_time_travel",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id >= 10
    UNION ALL
    SELECT doc_id, lang, 'edited_v2' AS source, n_chars
    FROM documents WHERE doc_id BETWEEN 5 AND 9
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, lang, 'inserted_v2' AS source, n_chars
    FROM documents WHERE doc_id < 3
    """,
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write snapshot versioning + time travel (Delta/Iceberg
    ``VERSION AS OF``): v1 = the corpus, v2 = a MERGE batch (delete
    ids<5, edit 5-9, insert 3 clones), v3 = a second edit batch — then
    read **v2** back, proving superseded versions stay readable. Each
    merge is the broadcast-anti CoW plan (the base never shuffles) and
    a version commit is one log rewrite AFTER the data lands — the
    minimal atomic-commit protocol of every lakehouse table format.
    The oracle restates v2 declaratively from the raw table. The
    fixture history is built once per session/corpus
    (_ensure_snapshot_history) so the measured operator is the
    version-pinned READ, not fixture I/O."""
    from inside_vectordb_spark.operators.merge import read_snapshot

    art = _ensure_snapshot_history(spark, sf_dir)
    return read_snapshot(spark, art, version=2)


@register(
    "snapshot_vacuum",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id BETWEEN 10 AND 14 THEN 'edited_v3' ELSE source END
             AS source,
           n_chars
    FROM documents WHERE doc_id >= 10
    UNION ALL
    SELECT doc_id, lang, 'edited_v2' AS source, n_chars
    FROM documents WHERE doc_id BETWEEN 5 AND 9
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, lang, 'inserted_v2' AS source, n_chars
    FROM documents WHERE doc_id < 3
    """,
)
def snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot retention (Delta VACUUM / Iceberg expire_snapshots):
    build the same v1→v2→v3 history as snapshot_time_travel, expire
    everything but the newest version (log rewritten FIRST so readers
    never resolve deleted data), and read the survivor — which must
    still be the full v3 state. Expired reads raise; that contract is
    pinned in tests. The oracle restates v3 declaratively."""
    import os

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.operators.merge import (
        read_snapshot,
        vacuum_snapshots,
    )

    # vacuum DESTROYS versions, so it builds its own disposable copy of
    # the canonical history (shared recipe, private path) each run
    art = os.path.join(
        mio.artifacts_root(),
        "snapshots",
        "vacuum_" + (os.path.basename(sf_dir.rstrip("/")) or "default"),
    )
    mio.remove_tree(art)
    _build_snapshot_history(spark, _snapshot_docs(spark, sf_dir), art)
    removed = vacuum_snapshots(art, keep_last=1)
    assert removed == [1, 2]
    return read_snapshot(spark, art)


@register(
    "decontamination_fuzzy",
    oracle=f"""
    WITH {_SIG_CTE}, {_BANDS_CTE},
    tb AS (SELECT doc_id AS bench_id, band_idx, band_key FROM bands
           WHERE doc_id % 97 = 0),
    tt AS (SELECT doc_id, band_idx, band_key FROM bands WHERE doc_id % 97 <> 0),
    cand AS (SELECT DISTINCT t.doc_id, b.bench_id
             FROM tt t JOIN tb b USING (band_idx, band_key)),
    ver AS (
      SELECT c.doc_id, c.bench_id, round({_JACCARD}, 6) AS jaccard
      FROM cand c
      JOIN shs sa ON sa.doc_id = c.doc_id
      JOIN shs sb ON sb.doc_id = c.bench_id)
    SELECT doc_id, bench_id, jaccard FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY jaccard DESC, bench_id) AS rn
      FROM ver WHERE jaccard >= 0.2) WHERE rn = 1
    """,
)
def decontamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (MinHash) benchmark decontamination: training docs
    near-duplicating ANY held-out doc (Jaccard ≥ 0.2) — catches the
    paraphrased leakage exact n-gram decontamination misses. The
    benchmark side's band keys AND shingle sets ride broadcasts; the
    training corpus never shuffles (operators/dedup.py:
    fuzzy_decontaminate). Same %97 benchmark split as the exact
    `decontamination` query so the two gates are directly comparable."""
    docs = eio.load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return dd.fuzzy_decontaminate(train, bench, threshold=0.2)


@register(
    "snapshot_change_feed",
    oracle="""
    SELECT 'delete' AS op, doc_id, lang, source, n_chars
    FROM documents WHERE doc_id < 5
    UNION ALL
    SELECT 'update' AS op, doc_id, lang, 'edited_v2' AS source, n_chars
    FROM documents WHERE doc_id BETWEEN 5 AND 9
    UNION ALL
    SELECT 'update' AS op, doc_id, lang, 'edited_v3' AS source, n_chars
    FROM documents WHERE doc_id BETWEEN 10 AND 14
    UNION ALL
    SELECT 'insert' AS op, doc_id + 1000000 AS doc_id, lang,
           'inserted_v2' AS source, n_chars
    FROM documents WHERE doc_id < 3
    """,
)
def snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed: the row-level diff v1→v3 across the same
    snapshot history as snapshot_time_travel — deletes carry v1
    values, updates/inserts carry v3 values; applying the feed to v1
    reproduces v3 (the merge operator's inverse). One full outer join
    on the key; struct-compare change detection
    (operators/merge.py:snapshot_diff). The fixture history is built
    once per session/corpus (_ensure_snapshot_history) so the bench
    number measures the DIFF, not O(base) fixture writes."""
    from inside_vectordb_spark.operators.merge import snapshot_diff

    art = _ensure_snapshot_history(spark, sf_dir)
    return snapshot_diff(spark, art, 1, 3)


@register(
    "incremental_view_refresh",
    oracle="""
    WITH v3 AS (
      SELECT lang, n_chars FROM documents WHERE doc_id >= 5
      UNION ALL
      SELECT lang, n_chars FROM documents WHERE doc_id < 3)
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM v3 GROUP BY lang
    """,
)
def incremental_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-lang (count, sum) rollup of
    snapshot v1 is refreshed to the v3 state using ONLY the change
    feed — +postimage/insert, −preimage/delete — never rescanning the
    base table. At 100 TB this is the difference between touching
    O(|delta|) rows and recomputing a full-table aggregate on every
    refresh; additive aggregates (count/sum, and avg as sum/count)
    refresh exactly this way in every materialized-view engine. The
    oracle recomputes the view from the v3 state directly, so the
    hash match IS the proof that feed-refresh ≡ full recompute."""
    from inside_vectordb_spark.operators.merge import read_snapshot, snapshot_diff

    art = _ensure_snapshot_history(spark, sf_dir)

    base = read_snapshot(spark, art, 1).groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    feed = snapshot_diff(spark, art, 1, 3, preimages=True)
    sign = F.when(
        F.col("op").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy("lang").agg(
        F.sum(sign).alias("d_docs"),
        F.sum(sign * F.col("n_chars")).alias("d_chars"),
    )
    return (
        base.join(delta, "lang", "full_outer")
        .select(
            "lang",
            (F.coalesce("n_docs", F.lit(0)) + F.coalesce("d_docs", F.lit(0))).alias(
                "n_docs"
            ),
            (
                F.coalesce("total_chars", F.lit(0)) + F.coalesce("d_chars", F.lit(0))
            ).alias("total_chars"),
        )
        .filter(F.col("n_docs") > 0)
    )


_LM_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\f\\r]+'), t -> t <> '')) AS term
      FROM documents),
    t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    counts AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
    stats AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM counts),
    lp AS (
      SELECT t.doc_id,
             ln((c.cnt + 0.5) / (s.total + 0.5 * s.vocab)) AS lp
      FROM t JOIN counts c USING (term) CROSS JOIN stats s)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(-avg(lp), 6) AS cross_entropy,
           round(exp(-avg(lp)), 4) AS perplexity
    FROM lp GROUP BY doc_id
"""


@register("lm_perplexity_scores", oracle=_LM_ORACLE)
def lm_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. '19): per-doc
    cross-entropy + perplexity under an add-alpha smoothed unigram LM
    estimated from the corpus itself — the hash-verifiable stand-in
    for the KenLM gate every web-scale curation pipeline runs
    (operators/lm.py documents the swap point). One unigram-table
    pass + one term-keyed scoring join; text never shuffles."""
    from inside_vectordb_spark.operators.lm import unigram_lm_scores

    return unigram_lm_scores(eio.load_table(spark, sf_dir, "documents"))


@register(
    "cluster_safe_split",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE}, {_PAIRS_CTE},
    nd AS (
      SELECT p.doc_a, p.doc_b FROM pairs p
      JOIN shs sa ON sa.doc_id = p.doc_a
      JOIN shs sb ON sb.doc_id = p.doc_b
      WHERE round({_JACCARD}, 6) >= 0.2),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM nd
              UNION SELECT doc_b AS src, doc_a AS dst FROM nd),
    reach(id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
    cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
    asg AS (
      SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cl USING (doc_id)),
    b AS (
      SELECT doc_id, cluster_id,
             ('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':split'),
              1, 8))::BIGINT % 100 AS bucket
      FROM asg)
    SELECT doc_id, cluster_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def cluster_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split: near-dup clusters (the MinHash →
    verify → connected-components chain) are the split unit, so no
    near-duplicate pair ever straddles train/test — the in-corpus
    counterpart of benchmark decontamination. Singleton docs hash by
    their own id, identical to the plain dataset_split
    (operators/traindata.py:cluster_safe_split)."""
    from inside_vectordb_spark.operators.traindata import cluster_safe_split

    docs = eio.load_table(spark, sf_dir, "documents")
    clusters = dd.near_duplicate_clusters(docs, threshold=0.2)
    return cluster_safe_split(docs, clusters)


@register(
    "token_budget_select",
    oracle=f"""
    WITH qs AS ({_QUALITY_SQL}),
    c AS (
      SELECT doc_id, n_words, quality,
             sum(n_words) OVER (ORDER BY quality DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM qs)
    SELECT doc_id, n_words, quality, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 4000
    """,
)
def token_budget_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-bounded data selection: the best-quality documents
    whose cumulative token count fits a 4000-token budget. The global
    prefix sum runs DISTRIBUTED (range repartition → parallel
    per-partition windows → partition-count-bounded offset collect →
    broadcast add-back; operators/traindata.py:token_budget_select) —
    not the single-partition Window.orderBy that cannot survive
    100 TB. The oracle states the same selection with a plain SQL
    cumulative window, so the hash match proves the distributed
    prefix sum exactly equals the sequential one."""
    from inside_vectordb_spark.operators.traindata import token_budget_select

    return token_budget_select(
        eio.load_table(spark, sf_dir, "documents"), budget=4000
    )


@register(
    "curriculum_stages",
    oracle=f"""
    WITH lm AS ({_LM_ORACLE}),
    s AS (
      SELECT doc_id, n_tokens, cross_entropy, perplexity,
             CAST(ntile(4) OVER (ORDER BY perplexity, doc_id) AS INT) AS stage
      FROM lm)
    SELECT doc_id, perplexity, stage FROM s
    """,
)
def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning stage assignment: documents ntile'd into 4
    easy→hard stages by unigram-LM perplexity (low perplexity =
    corpus-typical = early stage), the pacing schedule curriculum
    training consumes. Deterministic total order (perplexity, doc_id);
    the oracle's SQL ntile is computed Spark-side WITHOUT the
    single-partition global window — the shared distributed
    prefix-sum ranks (``operators/ranks.py:global_row_ranks``, the
    same shape as ``token_budget_select`` / ``equi_depth_histogram``)
    plus the driver-known-N ntile expression, so the assignment
    survives a 100-TB corpus."""
    from inside_vectordb_spark.operators.lm import unigram_lm_scores
    from inside_vectordb_spark.operators.ranks import (
        global_row_ranks,
        ntile_expr,
    )

    scores = unigram_lm_scores(eio.load_table(spark, sf_dir, "documents"))
    ranked, total = global_row_ranks(scores, "perplexity", "doc_id")
    return ranked.select(
        "doc_id",
        "perplexity",
        (ntile_expr("__rank", total, 4) + 1).cast("int").alias("stage"),
    )


_G_SQL = {
    1: "SELECT unnest(t) AS gram FROM tk",
    2: """SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
          i -> concat_ws(' ', t[i], t[i+1]))) AS gram FROM tk""",
    3: """SELECT unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram FROM tk""",
}

_DIVERSITY_ORACLE = f"""
    WITH tk AS (SELECT list_filter({_TOKS}, t -> t <> '') AS t
                FROM documents),
    g1 AS ({_G_SQL[1]}), g2 AS ({_G_SQL[2]}), g3 AS ({_G_SQL[3]})
    """ + " UNION ALL ".join(
    f"""
    SELECT CAST({n} AS INT) AS n, count(*) AS total_grams,
           count(DISTINCT md5(gram)) AS distinct_grams,
           round(count(DISTINCT md5(gram)) * 1.0 / count(*), 6)
             AS distinct_ratio
    FROM g{n}"""
    for n in (1, 2, 3)
)


@register("corpus_distinct_ngrams", oracle=_DIVERSITY_ORACLE)
def corpus_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity datasheet row: distinct-1/2/3 ratios (Li et
    al. '16) — the repetitiveness number reported next to dedup
    rates. Distinctness counted over md5s so only fixed-width hashes
    shuffle."""
    return ts.distinct_ngram_ratios(eio.load_table(spark, sf_dir, "documents"))


_KL_BUCKET = "('0x' || substr(md5(term || ':kl'), 1, 8))::BIGINT % 1024"

_SOURCE_KL_ORACLE = f"""
    WITH toks AS (SELECT source,
                         unnest(list_filter({_TOKS}, t -> t <> '')) AS term
                  FROM documents),
    tb AS (SELECT source, {_KL_BUCKET} AS b FROM toks),
    cb AS (SELECT b, count(*) AS cc FROM tb GROUP BY 1),
    ctot AS (SELECT count(*) AS nc FROM tb),
    sb AS (SELECT source, b, count(*) AS cs FROM tb GROUP BY 1, 2),
    stot AS (SELECT source, count(*) AS ns FROM tb GROUP BY 1),
    buckets AS (SELECT unnest(range(0, 1024)) AS b),
    lattice AS (SELECT s.source, s.ns, k.b, COALESCE(cb.cc, 0) AS cc
                FROM stot s CROSS JOIN buckets k
                LEFT JOIN cb ON cb.b = k.b),
    filled AS (SELECT l.source, l.ns, l.b, l.cc, COALESCE(sb.cs, 0) AS cs
               FROM lattice l
               LEFT JOIN sb ON sb.source = l.source AND sb.b = l.b)
    SELECT source, ns AS n_tokens,
           round(sum( ((cs + 0.5) / (ns + 512.0))
                      * ln( ((cs + 0.5) / (ns + 512.0))
                          / ((cc + 0.5) / (nc + 512.0)) ) ), 6) + 0.0 AS kl_nats
    FROM filled CROSS JOIN ctot GROUP BY 1, 2
    """


@register("source_term_kl", oracle=_SOURCE_KL_ORACLE)
def source_term_kl_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain skew: KL(P_source || P_corpus) over 1024
    md5-bucketed unigram buckets with add-0.5 smoothing — the number
    a mixture designer reads before setting per-source temperatures
    (pairs with ``temperature_mixture``). Complete smoothed sum over
    the full bucket lattice (both distributions normalize over the
    same support, so kl_nats >= 0 by Gibbs); everything broadcast-scale except
    the one token-bucket aggregation."""
    return ts.source_term_kl(eio.load_table(spark, sf_dir, "documents"))


_ZIPF_ORACLE = f"""
    WITH tf AS (
      SELECT term, count(*) AS cnt FROM (
        SELECT unnest(list_filter({_TOKS}, t -> t <> '')) AS term
        FROM documents) GROUP BY term),
    top AS (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 100),
    xy AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term)
                          AS DOUBLE)) AS x,
                  ln(CAST(cnt AS DOUBLE)) AS y
           FROM top),
    agg AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
                   sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM xy)
    SELECT CAST(n AS INT) AS n_terms,
           round(CASE WHEN (n * sxx - sx * sx) <> 0
                 THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) + 0.0
             AS zipf_slope,
           round(CASE WHEN n > 0 AND (n * sxx - sx * sx) <> 0
                 THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                      / n END, 6) + 0.0 AS zipf_intercept
    FROM agg
    """


@register("zipf_fit", oracle=_ZIPF_ORACLE)
def zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope/intercept over the top-100 vocabulary — the
    datasheet check that term frequencies follow the rank law natural
    corpora obey (slope ≈ −1); deviations flag templated/synthetic
    text. Closed-form least squares as one aggregation, full
    oracle."""
    return ts.zipf_fit(eio.load_table(spark, sf_dir, "documents"))


@register(
    "corpus_datasheet",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, lang, n_chars, md5(text) AS th FROM documents),
    dup AS (SELECT th FROM h GROUP BY th HAVING count(*) > 1),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(CASE WHEN th IN (SELECT th FROM dup) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup_docs
      FROM h GROUP BY source)
    SELECT source, n_docs, total_chars, n_langs, n_dup_docs,
           round(n_docs * 1.0 / sum(n_docs) OVER (), 6) AS doc_share
    FROM per
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source datasheet a dataset release publishes (Gebru et
    al.'s datasheets; every open-corpus card carries this panel):
    document/char volume, language breadth, exact-duplicate exposure,
    and corpus share per source — one hash-keyed aggregate plus a
    broadcast dup-set semi join; text never shuffles (only its md5)."""
    docs = eio.load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", "lang", "n_chars", F.md5("text").alias("th")
    )
    dup = (
        h.groupBy("th").agg(F.count("*").alias("c")).filter("c > 1").select("th")
    )
    flagged = h.join(F.broadcast(dup), "th", "left_semi").select(
        "doc_id", F.lit(1).alias("__d")
    )
    per = (
        h.join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.coalesce("__d", F.lit(0))).cast("bigint").alias("n_dup_docs"),
        )
    )
    total = per.agg(F.sum("n_docs").alias("__t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "source", "n_docs", "total_chars", "n_langs", "n_dup_docs",
            F.round(F.col("n_docs") / F.col("__t"), 6).alias("doc_share"),
        )
    )


@register(
    "bm25_topk_indexed",
    oracle=f"""
    WITH {_bm25_ctes(10)}
    SELECT query_id, doc_id, bm25, rank FROM bm_r
    """,
)
def bm25_topk_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 against the PERSISTED inverted index
    (operators/lexical_index.py — the lexical sibling of the S9/S10
    ANN artifacts): postings/dictionary scans prune to the query
    terms' hash buckets, the corpus is never re-tokenized, and
    deterministic counting makes stored==fresh bit-identical — so
    this row shares the plain BM25 oracle and its green hash IS the
    stored==fresh proof on the hard signal."""
    import os

    from inside_vectordb_spark.operators.lexical_index import (
        bm25_topk_indexed,
        ensure_lexical_index,
    )

    docs = eio.load_table(spark, sf_dir, "documents")
    art = mio.art_path("lexical", sf_dir)
    ensure_lexical_index(docs, art)
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return bm25_topk_indexed(spark, queries, art, k=10)


@register("tfidf_topk_indexed", oracle=_TFIDF_ORACLE)
def tfidf_topk_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine against the persisted lexical index: the
    full-vocabulary document norms are the stored ``docnorm``
    relation (computed once from the stored postings — the index-time
    precompute the in-memory path's docstring promises), and the
    postings/dictionary scans prune to the query terms' buckets.
    Shares the plain TF-IDF oracle: the green hash is the
    stored==fresh proof."""
    import os

    from inside_vectordb_spark.operators.lexical_index import (
        ensure_lexical_index,
        tfidf_topk_indexed,
    )

    docs = eio.load_table(spark, sf_dir, "documents")
    art = mio.art_path("lexical", sf_dir)
    ensure_lexical_index(docs, art)
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return tfidf_topk_indexed(spark, queries, art, k=10)


from inside_vectordb_spark.operators.ann_sign import bucket_sql as _sbucket_sql  # noqa: E402

_SERVING_COS = (
    "round(list_dot_product(q.qv, c.v) / "
    "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6)"
)

_HYBRID_SERVING_ORACLE = f"""
    WITH {_bm25_ctes(50)},
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sb AS (SELECT vec_id, v, {_sbucket_sql('v')} AS bucket FROM e),
    sq AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sb WHERE vec_id < 6),
    scand AS (
      SELECT q.query_id, c.vec_id AS doc_id, {_SERVING_COS} AS score
      FROM sq q JOIN sb c USING (bucket)),
    sr AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
           FROM scand QUALIFY rank <= 50),
    contrib AS (
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM bm_r
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM sr),
    agg AS (SELECT query_id, doc_id, round(sum(contrib), 6) AS rrf
            FROM contrib GROUP BY query_id, doc_id),
    fused AS (SELECT query_id, doc_id, rrf,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY rrf DESC, doc_id) AS INT) AS rank
              FROM agg)
    SELECT query_id, doc_id, rrf, rank FROM fused WHERE rank <= 10
"""


@register("hybrid_serving_topk", oracle=_HYBRID_SERVING_ORACLE)
def hybrid_serving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING-path hybrid: both arms answer from persisted
    artifacts — BM25 from the stored inverted index (bucket-pruned
    postings) and vectors from the stored sign-LSH index (bucket-
    pruned candidates + exact rerank) — fused by RRF at depth 50.
    This is the query-time stack a deployment actually runs: zero
    corpus scans, all index reads; the oracle restates both stored
    pipelines and the fusion."""
    import os

    from inside_vectordb_spark.operators.ann_sign import ann_sign_topk_indexed
    from inside_vectordb_spark.operators.hybrid import rrf_fuse
    from inside_vectordb_spark.operators.lexical_index import (
        bm25_topk_indexed,
        ensure_lexical_index,
    )

    docs = eio.load_table(spark, sf_dir, "documents")
    lex_art = mio.art_path("lexical", sf_dir)
    ensure_lexical_index(docs, lex_art)
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    tqueries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    bm_run = bm25_topk_indexed(spark, tqueries, lex_art, k=50)

    emb = eio.load_table(spark, sf_dir, "embeddings")
    vqueries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sign_art = mio.art_path("ann_sign", sf_dir)
    vec_run = ann_sign_topk_indexed(
        spark, vqueries, emb, sign_art, k=50, query_id_col="query_id"
    )
    return rrf_fuse([bm_run, vec_run], k=10)


@register(
    "bm25_upsert_topk_indexed",
    oracle=f"""
    WITH {_bm25_ctes(10)}
    SELECT query_id, doc_id, bm25, rank FROM bm_r
    """,
)
def bm25_upsert_topk_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental lexical-index maintenance on the hard signal: build
    the inverted index on 80% of the corpus, upsert the other 20%
    (O(delta) postings append + O(vocab) dictionary merge + additive
    stats — operators/lexical_index.py:upsert_lexical_index), then
    search. Shares the plain BM25 oracle: the green hash proves the
    maintained index answers exactly like one built from the full
    corpus."""
    import os

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint
    from inside_vectordb_spark.operators.lexical_index import (
        LEXICAL_LAYOUT,
        bm25_topk_indexed,
        build_lexical_index,
        upsert_lexical_index,
    )

    docs = eio.load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 2)
    delta = docs.filter(F.col("doc_id") % 5 == 2)
    art = mio.art_path("lexical_upsert", sf_dir)
    meta = mio.read_json(mio.join(art, "meta.json"))
    want_fp = _corpus_fingerprint(docs, "doc_id", content_col="text")
    if (
        meta is None
        or meta.get("layout") != LEXICAL_LAYOUT
        or meta.get("corpus") != want_fp
    ):
        mio.remove_tree(art)
        build_lexical_index(base, art)
        upsert_lexical_index(delta, art)
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return bm25_topk_indexed(spark, queries, art, k=10)


@register(
    "bm25_compacted_topk",
    oracle=f"""
    WITH {_bm25_ctes(10)}
    SELECT query_id, doc_id, bm25, rank FROM bm_r
    """,
)
def bm25_compacted_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-index compaction on the hard signal: build on 80% of
    the corpus, upsert the other 20% (one postings + one doclen delta
    dir), then COMPACT — the delta dirs fold into one fresh
    generation, meta's rel lists go back to single elements, zero
    re-tokenization (``operators/lexical_index.py:
    compact_lexical_index``). Shares the plain BM25 oracle: the green
    hash proves compaction moved bytes, not rows."""
    import os

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.operators.ann_index import _corpus_fingerprint
    from inside_vectordb_spark.operators.lexical_index import (
        LEXICAL_LAYOUT,
        bm25_topk_indexed,
        build_lexical_index,
        compact_lexical_index,
        upsert_lexical_index,
    )

    docs = eio.load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 2)
    delta = docs.filter(F.col("doc_id") % 5 == 2)
    art = mio.art_path("lexical_compact", sf_dir)
    meta = mio.read_json(mio.join(art, "meta.json"))
    want_fp = _corpus_fingerprint(docs, "doc_id", content_col="text")
    if (
        meta is None
        or meta.get("layout") != LEXICAL_LAYOUT
        or meta.get("corpus") != want_fp
        or len(meta.get("postings_rels", [])) != 1
    ):
        mio.remove_tree(art)
        build_lexical_index(base, art)
        upsert_lexical_index(delta, art)
        compact_lexical_index(spark, art)
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    queries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    return bm25_topk_indexed(spark, queries, art, k=10)



# Pair score = dot of PRE-normalized vectors (normalize once per doc
# in wv, exactly like the Spark side's hoisted l2_normalize — the
# flagship O6 equivalence, hash-pinned there since r1).
_SEMDEDUP_COS_AB = "round(list_dot_product(a.nv, b.nv), 6)"

_SEMDEDUP_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e
              WHERE vec_id % 37 = 1 AND vec_id < 592),
    assign AS (
      SELECT vec_id AS doc_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.v, c.cv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                 c.cid) AS rn
        FROM e CROSS JOIN cents c) WHERE rn = 1),
    wv AS (SELECT a.doc_id, a.cid,
                  list_transform(e.v,
                    x -> x / sqrt(list_dot_product(e.v, e.v))) AS nv
           FROM assign a JOIN e ON e.vec_id = a.doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.cid,
             {_SEMDEDUP_COS_AB} AS sim
      FROM wv a JOIN wv b ON a.cid = b.cid AND a.doc_id < b.doc_id),
    f AS (SELECT * FROM p WHERE sim >= 0.35),
    d AS (SELECT doc_b AS doc_id, cid, doc_a, sim,
                 row_number() OVER (PARTITION BY doc_b, cid
                                    ORDER BY doc_a, sim) AS rn
          FROM f)
    SELECT doc_id, doc_a AS senior_twin, cid, sim FROM d WHERE rn = 1
"""


@register("semantic_dedup", oracle=_SEMDEDUP_ORACLE)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-level near-duplicate
    removal — catches paraphrases/templated rewrites that lexical
    MinHash/SimHash miss. Deterministic quantizer shards the quadratic
    pairwise pass per cluster (the paper's own k-means trick),
    upper-triangular min-id seniority rule; one row per dropped doc
    with its lowest-id senior near-twin as the drop-cause witness
    (which may itself be dropped — see semantic_dedup_dropped's
    docstring). Fully oracle-backed end to end
    (operators/semdedup.py)."""
    from inside_vectordb_spark.operators.semdedup import semantic_dedup_dropped

    # n_clusters pinned to the 16-centroid fixture the SQL twin
    # unrolls (vec_id < 37*16 = 592); production default scales with
    # corpus size via the operator's n_clusters=None path.
    return semantic_dedup_dropped(
        eio.load_table(spark, sf_dir, "embeddings"), threshold=0.35, n_clusters=16
    )


_SEMDECON_ORACLE = """
    WITH e AS (SELECT vec_id,
                      list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x / sqrt(list_dot_product(
                               CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[])))) AS nv
               FROM embeddings),
    tgt AS (SELECT vec_id AS bench_id, nv FROM e WHERE vec_id % 97 = 0),
    trn AS (SELECT vec_id, nv FROM e WHERE vec_id % 97 <> 0),
    scored AS (
      SELECT t.vec_id, g.bench_id,
             round(list_dot_product(t.nv, g.nv), 6) AS cos
      FROM trn t CROSS JOIN tgt g),
    best AS (
      SELECT vec_id, bench_id, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, bench_id) AS rn
        FROM scored) WHERE rn = 1)
    SELECT vec_id, bench_id AS nearest_bench, cos AS max_cos
    FROM best WHERE cos >= 0.35
    """


@register("decontamination_semantic", oracle=_SEMDECON_ORACLE)
def decontamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination family's third member, EMBEDDING-level:
    flag training vectors whose cosine against ANY held-out benchmark
    vector (vec_id % 97 == 0, the standing benchmark stand-in)
    reaches the leak threshold — the paraphrase-leak check n-gram
    rules miss (`decontamination_ngram` is exact overlap;
    `decontamination_bloom` its sketch-prefiltered twin; this one
    catches rewrites). One row per flagged doc with its nearest
    benchmark witness.

    Scale shape — the decisive asymmetry: the benchmark side is SMALL
    by definition, so it broadcasts (normalized once); the training
    corpus never shuffles — the scan streams past a k×dim table
    exactly like the flagship exact search, and the per-row argmax is
    a map-side struct-min aggregate. At 100 TB this is one pass over
    the training embeddings with zero exchanges on the big side."""
    from inside_vectordb_spark.functions.vector import (
        dot_product,
        l2_normalize,
    )

    emb = eio.load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("__nv")
    )
    tgt = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("bench_id"), F.col("__nv").alias("__bv")
    )
    trn = e.filter(F.col("vec_id") % 97 != 0)
    cos = F.round(dot_product("__nv", "__bv"), 6)
    return (
        trn.crossJoin(F.broadcast(tgt))
        .select(
            "vec_id",
            F.struct(
                (-cos).alias("negc"), F.col("bench_id").alias("bench_id")
            ).alias("__s"),
        )
        .groupBy("vec_id")
        .agg(F.min("__s").alias("__best"))
        .select(
            "vec_id",
            F.col("__best.bench_id").alias("nearest_bench"),
            (-F.col("__best.negc")).alias("max_cos"),
        )
        .filter(F.col("max_cos") >= 0.35)
    )


@register(
    "hybrid_linear_topk",
    oracle=f"""
    WITH {{BM25_CTES}},
    qv AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 6),
    vscored AS (
      SELECT q.query_id, c.vec_id AS doc_id, {_COS_QC} AS score
      FROM qv q CROSS JOIN embeddings c),
    vr AS (SELECT query_id, doc_id, round(score, 6) AS vscore,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
           FROM vscored QUALIFY rank <= 50),
    ls AS (SELECT query_id, min(bm25) AS lo, max(bm25) AS hi
           FROM bm_r GROUP BY 1),
    vs AS (SELECT query_id, min(vscore) AS lo, max(vscore) AS hi
           FROM vr GROUP BY 1),
    contrib AS (
      SELECT b.query_id, b.doc_id,
             0.4 * CASE WHEN s.hi > s.lo THEN (b.bm25 - s.lo) / (s.hi - s.lo)
                        ELSE 1.0 END AS c
      FROM bm_r b JOIN ls s USING (query_id)
      UNION ALL
      SELECT v.query_id, v.doc_id,
             0.6 * CASE WHEN s.hi > s.lo THEN (v.vscore - s.lo) / (s.hi - s.lo)
                        ELSE 1.0 END AS c
      FROM vr v JOIN vs s USING (query_id)),
    agg AS (SELECT query_id, doc_id, round(sum(c), 6) AS fused
            FROM contrib GROUP BY 1, 2),
    fr AS (SELECT query_id, doc_id, fused,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY fused DESC, doc_id) AS INT)
                    AS rank
           FROM agg QUALIFY rank <= 10)
    SELECT query_id, doc_id, fused, rank FROM fr
    """.replace("{BM25_CTES}", _bm25_ctes(50)),
)
def hybrid_linear_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-based hybrid fusion (the calibrated complement to the
    rank-based RRF family): per-query min-max normalization of each
    arm's rounded scores, weighted 0.6 dense / 0.4 lexical, top-10 —
    the convex-combination fusion production systems use when score
    calibration is available. Arms and fusion both restated in the
    oracle; fusion touches only the Q·50 candidate lists
    (operators/hybrid.py:linear_fuse)."""
    from inside_vectordb_spark.operators.bm25 import bm25_topk
    from inside_vectordb_spark.operators.hybrid import linear_fuse
    from inside_vectordb_spark.operators.topk import exact_cosine_topk

    docs = eio.load_table(spark, sf_dir, "documents")
    toks = F.slice(tokenize(F.lower(F.col("text"))), 1, 5)
    tqueries = docs.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", toks).alias("qtext"),
    )
    emb = eio.load_table(spark, sf_dir, "embeddings")
    vqueries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bm_run = bm25_topk(docs, tqueries, k=50)
    vec_run = exact_cosine_topk(vqueries, emb, k=50)
    return linear_fuse([(bm_run, 0.4, "bm25"), (vec_run, 0.6, "score")], k=10)
