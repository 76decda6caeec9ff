"""Capture `.explain("formatted")` for named queries into
plans/r13/<query>_<tag>.txt — the optimization round's before/after
plan evidence (OPTIMIZATION_r12.md cites these files).

Usage:
    python scripts/r13_plan.py before bm25_rm3_topk,method_comparison
    python scripts/r13_plan.py after  bm25_rm3_topk
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    from inside_vectordb_spark.registry import QUERIES
    from inside_vectordb_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="r13-plans")
    rc = 0
    for name in names:
        try:
            df = QUERIES[name](spark, SF)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"[r13_plan] {name}: FAILED {exc}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({tag}) at {SF} --\n")
            f.write(text)
        print(f"[r13_plan] wrote {path}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
