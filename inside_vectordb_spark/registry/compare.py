"""Comparison-pipeline registry (B1-B2, B4-B6, A9-A10).

ANN results are not SQL-expressible, so these are rows-only driver
checks (stable row count + schema); the VALUE assertions live in
``tests/test_compare.py`` (exact is the recall ceiling, retention
bounds, extrema correctness) — the same acceptance style the
reference applies to its own comparison (``005:469-503``).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inside_vectordb_spark import io as eio
from inside_vectordb_spark.operators import compare as cmp_ops
from inside_vectordb_spark.operators.ann import ann_ivf_topk, ann_lsh_topk
from inside_vectordb_spark.operators.metrics import evaluation_report
from inside_vectordb_spark.operators.topk import exact_cosine_topk
from inside_vectordb_spark.registry import register
from inside_vectordb_spark.registry.ann import EMB_DIM

_K = 10


def _method_topks(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    q = eio.query_vectors(spark, sf_dir)
    c = eio.load_table(spark, sf_dir, "embeddings")
    return {
        "exact": exact_cosine_topk(q, c, k=_K),
        "lsh": ann_lsh_topk(q, c, dim=EMB_DIM, k=_K, n_tables=16, n_bits=4),
        "ivf": ann_ivf_topk(q, c, k=_K, n_centroids=16, n_probe=8),
    }


def _comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    qr = eio.qrels(spark, sf_dir)
    reports = {
        m: evaluation_report(topk, qr, k_values_recall=(_K,), k_values_precision=(_K,))
        for m, topk in _method_topks(spark, sf_dir).items()
    }
    return cmp_ops.recall_retention(cmp_ops.method_comparison(reports), baseline="exact")


@register("method_comparison")
def method_comparison_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+A10: exact vs LSH vs IVF — recall@10 / precision@10 / MRR
    per method plus recall retention vs the exact baseline (the
    reference's comparison table, ``005:87-157,469-487``)."""
    return _comparison(spark, sf_dir).orderBy("method")


@register("comparison_extrema")
def comparison_extrema_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: per-metric best-method rows (``005:493-503``)."""
    return cmp_ops.summary_extrema(_comparison(spark, sf_dir)).orderBy("stat")


@register("method_speedups")
def method_speedups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+B2+A10: wall-clock each method's full search plan (noop
    materialization — executes everything, collects nothing), then
    latency / QPS / speedup-vs-exact. Values vary run to run (it's a
    measurement); the row set and schema are the stable contract."""
    timings = []
    for method, topk in _method_topks(spark, sf_dir).items():
        t0 = time.perf_counter()
        topk.write.format("noop").mode("overwrite").save()
        timings.append((method, time.perf_counter() - t0))
    perf = spark.createDataFrame(timings, "method string, latency_sec double")
    return cmp_ops.speedup_ratios(perf, baseline="exact").orderBy("method")
