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
