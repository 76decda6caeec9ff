"""Multi-method comparison pipeline (SURVEY.md §2.9 B4-B6, §2.4 A9-A10).

The reference's ``005-compare_benchmarks.py``: load the newest report
per method (S12), normalize the different report shapes (B4,
``005:100-123``), build the method × metric comparison table (B5,
``005:87-157``), derive speedups / recall retention vs the
brute-force baseline (A10, ``005:469-487``) and the per-metric
extrema (A9, ``005:493-503``), and format the text summary (B6,
``005:430-520``).

Comparison inputs are tiny (a handful of methods × a dozen metrics),
so the pivot/extrema math is a driver-scale DataFrame job; the
expensive part — producing each method's ranked results — is the
engine's search operators, which is where the 100 TB design lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRIC_COLS = ("recall_at_10", "precision_at_10", "mrr")


def normalize_report(raw: dict) -> dict[str, float]:
    """B4: flatten any of the reference's report shapes into one
    ``{metric: value}`` dict. The three shapes in the wild
    (``005:100-123``): metrics nested under ``performance``, flat
    ``search_latency*`` keys, and our own ``{"metrics": {...}}``
    wrapper (``sources/reports.py``)."""
    out: dict[str, float] = {}
    body = raw.get("metrics", raw)
    perf = body.get("performance", {})
    for src_ in (body, perf):
        for key, val in src_.items():
            if isinstance(val, (int, float)):
                out[key] = float(val)
    # alias the latency variants to one canonical name
    for alias in ("search_latency", "search_latency_cpu", "avg_latency_ms"):
        if alias in out and "latency" not in out:
            out["latency"] = out[alias]
    return out


def method_comparison(per_method: dict[str, DataFrame]) -> DataFrame:
    """B5: union long-form ``(metric, k, value)`` evaluation reports
    (``operators/metrics.py:evaluation_report``) tagged by method →
    one wide row per method. Fixed conditional aggregation instead of
    ``pivot`` — the column set is the contract, not data-driven."""
    tagged = None
    for method, rep in per_method.items():
        t = rep.select(F.lit(method).alias("method"), "metric", "k", "value")
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:  # a bare assert is stripped under python -O
        raise ValueError("no methods to compare")

    def pick(metric: str, k: int | None):
        cond = F.col("metric") == metric
        cond = cond & F.col("k").isNull() if k is None else cond & (F.col("k") == k)
        return F.max(F.when(cond, F.col("value")))

    return tagged.groupBy("method").agg(
        pick("recall", 10).alias("recall_at_10"),
        pick("precision", 10).alias("precision_at_10"),
        pick("mrr", None).alias("mrr"),
    )


def recall_retention(cmp: DataFrame, baseline: str = "exact", round_to: int = 6) -> DataFrame:
    """A10 (quality half): each method's recall@10 as a fraction of
    the exact baseline's — the reference's headline ANN acceptance
    number (91.8% / 94.9%, ``005:469-487``)."""
    base = cmp.filter(F.col("method") == baseline).select(
        F.col("recall_at_10").alias("__base_recall")
    )
    # LEFT join on TRUE, not crossJoin: an absent baseline method must
    # degrade to NULL retention for every row ('n/a' in the summary),
    # not silently drop the whole comparison (review r7)
    return cmp.join(F.broadcast(base), F.lit(True), "left").select(
        "method",
        *METRIC_COLS,
        F.round(
            F.when(F.col("__base_recall") > 0, F.col("recall_at_10") / F.col("__base_recall"))
            .otherwise(F.lit(None)),
            round_to,
        ).alias("recall_retention"),
    )


def speedup_ratios(perf: DataFrame, baseline: str = "exact", round_to: int = 4) -> DataFrame:
    """A10 (speed half): baseline latency / method latency
    (``005:469-487``). ``perf`` = (method, latency_sec)."""
    base = perf.filter(F.col("method") == baseline).select(
        F.col("latency_sec").alias("__base_lat")
    )
    # same absent-baseline degradation as recall_retention: NULL
    # speedup, never zero output rows
    return perf.join(F.broadcast(base), F.lit(True), "left").select(
        "method",
        "latency_sec",
        F.round(F.lit(1.0) / F.col("latency_sec"), round_to).alias("qps"),
        F.round(F.col("__base_lat") / F.col("latency_sec"), round_to).alias(
            "speedup_vs_baseline"
        ),
    )


def summary_extrema(cmp: DataFrame) -> DataFrame:
    """A9: per-metric argmax rows — (stat, method, value), ties broken
    by method name for determinism (``005:493-503`` computes the same
    best-of table). One ``stack`` + one per-stat window — the
    comparison subplan executes ONCE, not once per metric (the
    union-of-limit(1) form re-ran the full three-arm comparison per
    metric)."""
    from pyspark.sql import Window

    stack_args = ", ".join(
        f"'max_{col}', {col}" for col in METRIC_COLS
    )
    long = cmp.selectExpr(
        "method", f"stack({len(METRIC_COLS)}, {stack_args}) AS (stat, value)"
    )
    w = Window.partitionBy("stat").orderBy(F.desc("value"), F.asc("method"))
    return (
        long.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("stat", "method", "value")
    )


def run_comparison_pipeline(
    per_method: dict[str, DataFrame],
    reports_dir: str,
    baseline: str = "exact",
) -> str:
    """The full 005 loop, file boundaries included: persist one
    timestamped report per method (S11), re-load the latest per
    method (S12), normalize shapes (B4), pivot + retention (B5/A10),
    and return the formatted summary (B6). ``per_method`` maps method
    name → long-form evaluation report (metric, k, value)."""
    from inside_vectordb_spark.sources.reports import (
        load_latest_reports,
        save_metrics_report,
    )

    spark = next(iter(per_method.values())).sparkSession
    for method, rep in per_method.items():
        metrics = {
            (f"{r['metric']}@{r['k']}" if r["k"] is not None else r["metric"]): r["value"]
            for r in rep.collect()
        }
        save_metrics_report(method, metrics, reports_dir)

    loaded = load_latest_reports(reports_dir)
    rows = []
    for method, raw in loaded.items():
        flat = normalize_report(raw)
        for key, val in flat.items():
            if key == "mrr":
                rows.append((method, "mrr", None, val))
            elif "@" in key:
                metric, k = key.split("@", 1)
                rows.append((method, metric, int(k), val))
    long_df = spark.createDataFrame(
        rows, "method string, metric string, k int, value double"
    )
    per_method_loaded = {
        m: long_df.filter(F.col("method") == m).select("metric", "k", "value")
        for m in loaded
    }
    cmp = recall_retention(method_comparison(per_method_loaded), baseline=baseline)
    return summary_text(cmp.collect())


def _fmt(v, spec: str, suffix: str = "") -> str:
    """'n/a' for NULL metrics: a method's report may legitimately lack
    a metric (legacy shapes normalize_report supports) and
    method_comparison then yields NULL — the summary must render it,
    not crash on NoneType.__format__ (review r7)."""
    return f"{v:{spec}}{suffix}" if v is not None else "n/a"


def summary_text(cmp_rows: list, perf_rows: list | None = None) -> str:
    """B6: the formatted comparison summary (``005:430-520``), built
    driver-side from collected comparison rows."""
    lines = ["METHOD COMPARISON", "=" * 17, ""]
    header = f"{'method':<12} {'recall@10':>10} {'prec@10':>10} {'mrr':>8} {'retention':>10}"
    lines.append(header)
    lines.append("-" * len(header))
    for r in sorted(cmp_rows, key=lambda r: r["method"]):
        ret = r["recall_retention"]
        lines.append(
            f"{r['method']:<12} {_fmt(r['recall_at_10'], '.4f'):>10} "
            f"{_fmt(r['precision_at_10'], '.4f'):>10} "
            f"{_fmt(r['mrr'], '.4f'):>8} "
            f"{(f'{ret:.1%}' if ret is not None else 'n/a'):>10}"
        )
    if perf_rows:
        lines += ["", f"{'method':<12} {'latency_s':>10} {'qps':>10} {'speedup':>10}"]
        for r in sorted(perf_rows, key=lambda r: r["method"]):
            lines.append(
                f"{r['method']:<12} {_fmt(r['latency_sec'], '.3f'):>10} "
                f"{_fmt(r['qps'], '.2f'):>10} "
                f"{_fmt(r['speedup_vs_baseline'], '.2f', 'x'):>10}"
            )
    if not cmp_rows:
        raise ValueError("no comparison rows to summarize")
    # tie-break by alphabetically-FIRST method, matching
    # summary_extrema's (value DESC, method ASC) window order — the
    # two registered surfaces must name the same winner when recalls
    # tie (review r9: max on (value, method) picked the LAST method)
    best = min(
        cmp_rows,
        key=lambda r: (
            -(r["recall_at_10"] if r["recall_at_10"] is not None else float("-inf")),
            r["method"],
        ),
    )
    lines += [
        "",
        f"KEY FINDING: best recall@10 = {_fmt(best['recall_at_10'], '.4f')} "
        f"({best['method']})",
    ]
    return "\n".join(lines)
