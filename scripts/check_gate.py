"""Replicate the round driver's CORRECTNESS gate locally.

Runs every `queries()` entry inside the driver's checked prefix (the
first WINDOW entries, default 50) at the driver's scale (sf0.01) and
compares against `oracle_sql()` exactly the way the driver does:
row count + sorted column names + order-insensitive values, plus the
dtype-KIND pin that predicts the driver's value-hash serialization
(see tests/test_parity.py).

Usage:
    python scripts/check_gate.py [--sf /root/testdata/sf0.01] [--all]
    python scripts/check_gate.py --only bm25_topk,hybrid_rrf_topk

--all checks every registered query, not just the driver window;
--only checks a comma-separated subset. Exit code 0 = every checked
row green.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def window_budget_report(queries: dict) -> None:
    """Rotation accounting (r11 verdict #8): per run, print which
    registered rows have never had a driver observation and the
    oldest-observation histogram, so rotation planning reads off the
    gate output instead of living in comments."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            for k in json.load(open(f)):
                last[k] = rnd
        except Exception:
            continue
    window = set(list(queries)[:WINDOW])
    never = [n for n in queries if n not in last and n not in window]
    pending = [n for n in queries if n not in last and n in window]
    hist: dict[int, int] = {}
    for n in queries:
        if n in last:
            hist[last[n]] = hist.get(last[n], 0) + 1
    print("-- window budget --")
    print(f"registered: {len(queries)}  window: {len(window)}")
    print(
        "last-observation histogram (round: count): "
        + ", ".join(f"r{r}: {c}" for r, c in sorted(hist.items()))
    )
    if pending:
        print(f"first observation pending (in window): {sorted(pending)}")
    if never:
        print(f"NEVER observed and NOT in window: {sorted(never)}")
    oldest = min(hist) if hist else None
    if oldest is not None:
        stale = sorted(n for n, r in last.items() if r == oldest)
        in_w = sum(1 for n in stale if n in window)
        print(
            f"oldest cohort r{oldest}: {len(stale)} rows, {in_w} in the "
            "current window"
        )
    print("-------------------")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", help="check every query")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import __spark_entry__ as e
    from inside_vectordb_spark.session import get_spark
    from tests.conftest import duck_con  # ONE view-registration setup
    from tests.test_parity import assert_frames_match

    spark = get_spark(app_name="gate-check")
    con = duck_con(args.sf)

    queries = e.queries()
    oracles = e.oracle_sql()
    window_budget_report(queries)
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 2
    else:
        names = list(queries) if args.all else list(queries)[:WINDOW]
    failures: list[str] = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            res = queries[name](spark, args.sf).toPandas()
            if name in oracles:
                exp = con.execute(oracles[name]).df()
                assert_frames_match(res, exp, name)
                status = f"green ({len(res)} rows)"
            else:
                status = f"rows-only ({len(res)} rows)"
        except Exception:
            failures.append(name)
            status = "FAIL"
            traceback.print_exc()
        print(f"[{i:3d}] {name:34s} {status:24s} {time.perf_counter()-t0:6.2f}s")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print(f"\nall {len(names)} checked queries green at {args.sf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
