"""Time a subset of registry queries through the noop sink — the
optimization round's fast iteration loop (full bench.py takes ~12 min;
this times just the queries under the knife, same methodology:
min-of-N noop-sink materializations after a table warm-up).

Usage:
    python scripts/r13_time.py q1,q2,... [runs] [conf.key=value ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1].split(",")
    runs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    extra = {}
    for arg in sys.argv[3:]:
        k, _, v = arg.partition("=")
        extra[k] = v
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.registry import QUERIES
    from inside_vectordb_spark.session import get_spark

    spark = get_spark(app_name="r13-time", extra_conf=extra or None)
    for t in eio.TABLES:
        eio.load_table(spark, SF, t).limit(1).count()
    total = 0.0
    for name in names:
        fn = QUERIES[name]
        samples = []
        for _ in range(runs_n):
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        total += samples[0]
        print(
            f"{name:40s} min {samples[0]:7.3f}  median "
            f"{statistics.median(samples):7.3f}  n={runs_n}",
            flush=True,
        )
    print(f"{'TOTAL(min)':40s} {total:11.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
