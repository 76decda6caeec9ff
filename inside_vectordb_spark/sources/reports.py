"""Metrics-report sink/scan (S11/S12).

Reference shape: ``utils.py:113-135`` writes
``{dir}/{method}/{method}_{YYYYmmdd_HHMMSS}.json`` with the metric
dict nested under the method name; ``005-compare_benchmarks.py:46-80``
globs each method directory and keeps the newest file by mtime.

Reports are tiny driver-side dicts (a handful of scalars), so the
sink is a plain ``json.dump`` — putting a Spark job between a dict
and a 1 KB file would be overhead theatre. The SCAN side returns the
normalized rows used by the comparison pipeline (B4/B5).
"""

from __future__ import annotations

import glob
import json
import os
import time


def save_metrics_report(
    method: str, metrics: dict, reports_dir: str = "reports", stamp: str | None = None
) -> str:
    """S11: timestamped JSON report, reference layout
    (``utils.py:113-135``). Returns the written path."""
    from inside_vectordb_spark import _meta_io as mio

    out_dir = os.path.join(reports_dir, method)
    os.makedirs(out_dir, exist_ok=True)
    stamp = stamp or time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(out_dir, f"{method}_{stamp}.json")
    # atomic (temp + rename): load_latest_reports selects exactly this
    # newest file by mtime, so a plain in-place dump could hand a
    # concurrent reader truncated JSON (review r8)
    mio.write_json(path, {"method": method, "timestamp": stamp, "metrics": metrics})
    return path


def load_latest_reports(reports_dir: str = "reports") -> dict[str, dict]:
    """S12: per method subdirectory, parse the newest (max mtime)
    report JSON (``005-compare_benchmarks.py:46-80``). Returns
    ``{method: report_dict}``; methods with no JSON files are
    skipped."""
    out: dict[str, dict] = {}
    for method_dir in sorted(glob.glob(os.path.join(reports_dir, "*"))):
        if not os.path.isdir(method_dir):
            continue
        files = glob.glob(os.path.join(method_dir, "*.json"))
        if not files:
            continue
        # tie-break equal mtimes on the filename's embedded stamp
        # (advice r10: two reports written milliseconds apart can tie
        # on coarse-mtime filesystems, letting glob order pick the
        # older one) — the zero-padded %Y%m%d_%H%M%S stamp makes
        # lexicographic == chronological, deterministically
        latest = max(
            files, key=lambda f: (os.path.getmtime(f), os.path.basename(f))
        )
        with open(latest) as f:
            out[os.path.basename(method_dir)] = json.load(f)
    return out
