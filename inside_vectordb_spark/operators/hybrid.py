"""Hybrid retrieval: reciprocal-rank fusion of ranked result lists.

The reference ranks by embedding cosine only; production retrieval
fuses a lexical arm (BM25) with the vector arm — RRF (Cormack et
al., SIGIR 2009: ``score(d) = Σ_runs 1/(c + rank_run(d))``) is the
standard scoreless fusion because it needs no score calibration
between arms, only ranks.

Plan shape: each input run is already a top-k list (Q·k rows — tiny
relative to the corpus, whatever the corpus size). Fusion is a
unionByName of rank-reciprocal contributions + one groupBy on
(query_id, doc_id) + a per-query window. At 100 TB the arms do all
the heavy lifting (inverted-index probe / ANN scan); fusion itself
touches only candidate lists, so its cost is independent of corpus
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60  # the canonical RRF constant


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 10,
    c: int = RRF_C,
    round_to: int = 6,
) -> DataFrame:
    """Fuse ranked runs — each (query_id, doc_id, rank, ...) — into
    (query_id, doc_id, rrf, rank). A document missing from a run
    contributes nothing for that run; ranking is on the ROUNDED rrf
    with doc_id ascending tie-break (engine-portable, same contract
    as the top-k operators)."""
    if not runs:
        raise ValueError("rrf_fuse: no runs")
    contribs = None
    for r in runs:
        s = r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(c) + F.col("rank"))).alias("contrib"),
        )
        contribs = s if contribs is None else contribs.unionByName(s)
    agg = contribs.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), round_to).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def linear_fuse(
    runs: list[tuple[DataFrame, float, str]],
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Score-based hybrid fusion — the calibrated complement to RRF:
    each run's scores are min-max normalized PER QUERY over its own
    candidate list, then combined as a weighted sum
    (``fused(d) = Σ_runs w_run · norm_run(d)``, missing docs
    contribute 0; a degenerate list where max == min normalizes to
    1.0). ``runs`` = (dataframe, weight, score_col) triples, each
    frame (query_id, doc_id, <score_col>, rank).

    Same scale shape as ``rrf_fuse``: inputs are Q·k candidate lists
    and fusion cost is corpus-scale-independent. The per-(query, run)
    min/max comes from a window over the SAME partitioning the fuse
    aggregation needs — one traversal per arm; the earlier
    aggregate-and-join-back form consumed each arm's (corpus-scale)
    search plan twice. Normalization runs on the arms' ROUNDED output
    scores, so the fused value restates cross-engine exactly."""
    if not runs:
        raise ValueError("linear_fuse: no runs")
    contribs = None
    for r, wgt, sc in runs:
        qw = Window.partitionBy("query_id")
        lo = F.min(sc).over(qw)
        hi = F.max(sc).over(qw)
        nrm = F.when(hi > lo, (F.col(sc) - lo) / (hi - lo)).otherwise(F.lit(1.0))
        s = r.select(
            "query_id", "doc_id", (F.lit(float(wgt)) * nrm).alias("contrib")
        )
        contribs = s if contribs is None else contribs.unionByName(s)
    agg = contribs.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), round_to).alias("fused")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("fused"), F.asc("doc_id"))
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
