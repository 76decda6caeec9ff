"""Work-counter regression gate (round-8 verdict #5).

Wall-clock on a shared host swings ±30% at IDENTICAL plans (proven
r4→r5 and again r8: five queries read >1.4× slower while their work
counters were byte-identical). The deterministic counters — rows read
from sources, bytes/records written to shuffles, exchange and scan
counts — are far more stable, so a real plan regression is detectable
without timing. This script turns the r8 manual triage into a
standing gate:

    python scripts/check_counters.py --update   # (re)record baseline
    python scripts/check_counters.py            # compare, exit 1 on drift

Baseline design — an ENVELOPE, not a point: a handful of queries
carry legitimately run-varying counters (map-side WindowGroupLimit
pre-trims emit a scheduling-order-dependent row count; AQE flips a
sort-merge join to broadcast when a runtime size estimate sits near
the threshold, moving the exchange count by one — both observed while
building this gate: ``training_triples`` records 14632↔13973,
``ann_ivf_km_topk`` exchanges 11↔12). ``--update`` therefore executes
every headline query ``--runs`` times (default 3) and records per-key
[lo, hi] ranges; the compare accepts values inside the range, with a
small relative slack on the volume keys (bytes/records) for variance
the update runs didn't happen to sample. Structural keys (exchanges,
scans) get NO slack beyond the recorded range — one extra shuffle
outside the envelope is exactly the regression this gate exists to
catch.

The baseline (``counters_baseline.json``) is committed; an
INTENTIONAL plan change must update it in the same commit, so the
diff documents the before/after work profile. Counters are plan-shape
evidence, not the correctness contract: queries whose counters can't
be computed are recorded as null and skipped, exactly like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "counters_baseline.json",
)
KEYS = ("rows_read", "cache_rows_read", "shuffle_bytes", "shuffle_records",
        "exchanges", "scans")
# relative slack on volume keys only (variance the update runs didn't
# sample); structural keys get none
SLACK = {"shuffle_bytes": 0.10, "shuffle_records": 0.10, "rows_read": 0.02,
         "cache_rows_read": 0.02}


def collect(sf_dir: str, runs: int = 1) -> dict[str, dict | None]:
    """Per headline query: {key: [lo, hi]} over ``runs`` executions,
    or None when counters are unavailable on every attempt."""
    import bench
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.plans import work_counters
    from inside_vectordb_spark.registry import QUERIES
    from inside_vectordb_spark.session import get_spark

    spark = get_spark(app_name="counter-gate")
    for t in eio.TABLES:  # same warm-up as bench.py
        eio.load_table(spark, sf_dir, t).limit(1).count()
    out: dict[str, dict | None] = {}
    for name in bench.HEADLINE:
        t0 = time.perf_counter()
        env: dict[str, list[int]] | None = None
        ok, last_err = 0, ""
        for _ in range(runs):
            try:
                w = work_counters(QUERIES[name](spark, sf_dir))
            except Exception as exc:
                last_err = type(exc).__name__
                continue
            ok += 1
            if env is None:
                env = {k: [w.get(k, 0), w.get(k, 0)] for k in KEYS}
            else:
                for k in KEYS:
                    v = w.get(k, 0)
                    env[k][0] = min(env[k][0], v)
                    env[k][1] = max(env[k][1], v)
        out[name] = env
        # honest mixed-outcome reporting (review r9): a partially-
        # sampled envelope must be visible — it under-records variance
        if ok == runs:
            status = "ok"
        elif ok:
            status = f"PARTIAL {ok}/{runs} runs (last error {last_err})"
        else:
            status = f"counters unavailable: {last_err}"
        print(f"[counters] {name:34s} {status} ({time.perf_counter()-t0:.1f}s)")
    spark.stop()
    return out


def _bounds(want) -> tuple[float, float]:
    if isinstance(want, list):
        return float(want[0]), float(want[1])
    return float(want), float(want)  # point baselines stay comparable


def compare(base: dict, cur: dict[str, dict | None]) -> list[str]:
    drifts: list[str] = []
    for name, want in base["queries"].items():
        got = cur.get(name)
        if want is None or got is None:
            if (want is None) != (got is None):
                drifts.append(f"{name}: counter availability changed")
            continue
        for key in KEYS:
            lo, hi = _bounds(want.get(key, 0))
            slack = SLACK.get(key, 0.0)
            lo, hi = lo * (1 - slack), hi * (1 + slack)
            g = got.get(key, 0)
            glo, ghi = _bounds(g)
            if glo < lo or ghi > hi:
                drifts.append(
                    f"{name}: {key} {want.get(key)} -> {g}"
                )
    missing = set(cur) - set(base["queries"])
    if missing:
        drifts.append(
            f"queries not in baseline (run --update): {sorted(missing)}"
        )
    return drifts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--update", action="store_true",
                    help="rewrite the committed baseline")
    ap.add_argument("--runs", type=int, default=3,
                    help="executions per query when recording (--update)")
    args = ap.parse_args()

    if args.update:
        cur = collect(args.sf, runs=max(1, args.runs))
        with open(BASELINE, "w") as f:
            json.dump({"sf_dir": args.sf, "queries": cur}, f, indent=1,
                      sort_keys=True)
        print(f"baseline written: {BASELINE} ({len(cur)} queries)")
        return 0

    if not os.path.exists(BASELINE):
        print(f"no baseline at {BASELINE} — run with --update first")
        return 2
    base = json.load(open(BASELINE))
    if base.get("sf_dir") != args.sf:
        print(
            f"baseline was recorded at {base.get('sf_dir')}, comparing at "
            f"{args.sf} — counters are scale-dependent; rerun --update or "
            "pass the matching --sf"
        )
        return 2
    cur = collect(args.sf, runs=1)
    drifts = compare(base, cur)
    if drifts:
        print(f"\n{len(drifts)} counter drift(s):")
        for d in drifts:
            print(f"  {d}")
        print("\nIntentional plan change? Re-run with --update and commit "
              "the new baseline alongside the change.")
        return 1
    n = sum(1 for v in cur.values() if v is not None)
    print(f"\nall counters match the baseline ({n} measured queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
