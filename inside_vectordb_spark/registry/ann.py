"""ANN registry entries. Not SQL-expressible (LSH bucketing / IVF
quantizer are not meaningfully restatable in DuckDB), so these are
rows-only driver checks — quality is asserted in
``tests/test_ann.py`` as recall-retention vs the exact engine,
mirroring the reference's own acceptance style (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators.ann import ann_ivf_topk, ann_lsh_topk
from inside_vectordb_spark.registry import register

EMB_DIM = 64  # driver testdata embedding dimension

# Knob choice: the driver's synthetic embeddings are near-uniform
# random (top-10 neighbor cosine ≈ 0.3, no label structure), so ANY
# sublinear ANN scheme must scan a large candidate fraction to keep
# recall — there is no structure to exploit. These settings hold
# recall@10 retention ≥ 0.7 vs exact on that data (tests/test_ann.py);
# the same code at the same cost reaches ≥ 0.9 recall scanning ~10%
# of a clustered corpus (test_ann.py structured-data tests), which is
# the regime real embedding corpora are in.


@register("ann_lsh_topk")
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3-analogue: hyperplane-LSH ANN top-10 (16 tables × 4 bits)."""
    return ann_lsh_topk(
        eio.query_vectors(spark, sf_dir),
        eio.load_table(spark, sf_dir, "embeddings"),
        dim=EMB_DIM,
        k=10,
        n_tables=16,
        n_bits=4,
    )


@register("ann_ivf_topk")
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4-analogue: IVF ANN top-10 (16 centroids, probe 8)."""
    return ann_ivf_topk(
        eio.query_vectors(spark, sf_dir),
        eio.load_table(spark, sf_dir, "embeddings"),
        k=10,
        n_centroids=16,
        n_probe=8,
    )
