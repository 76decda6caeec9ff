"""Pin the work-counter regression gate's mechanics.

The expensive part (recomputing every headline query's counters at
sf0.1) runs once per round via ``scripts/check_counters.py``; these
tests pin what CAN go silently stale between runs: the committed
baseline exists, covers exactly the bench headline, was recorded at
the bench scale, and the comparator actually fires on drift.
"""

from __future__ import annotations

import json
import os

import bench

BASELINE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "counters_baseline.json")


def _load():
    assert os.path.exists(BASELINE), (
        "counters_baseline.json missing — run "
        "`python scripts/check_counters.py --update` and commit it"
    )
    return json.load(open(BASELINE))


def test_baseline_covers_headline():
    base = _load()
    missing = [n for n in bench.HEADLINE if n not in base["queries"]]
    extra = [n for n in base["queries"] if n not in bench.HEADLINE]
    assert not missing, (
        f"headline queries without a counter baseline: {missing} — "
        "rerun check_counters.py --update in the same commit"
    )
    assert not extra, f"baseline rows for unregistered headline: {extra}"


def test_baseline_recorded_at_bench_scale():
    base = _load()
    assert base["sf_dir"] == "/root/testdata/sf0.1"


def test_baseline_counters_have_expected_shape():
    base = _load()
    measured = {n: v for n, v in base["queries"].items() if v is not None}
    # the overwhelming majority of headline queries must have real
    # counters — an all-null baseline would make the gate vacuous
    assert len(measured) >= 0.9 * len(base["queries"])
    for name, v in measured.items():
        assert {"rows_read", "shuffle_bytes", "shuffle_records",
                "exchanges", "scans"} <= set(v), name


def test_comparator_fires_on_drift():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_counters",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "scripts", "check_counters.py"),
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    env = {"rows_read": [100, 100], "cache_rows_read": [0, 0],
           "shuffle_bytes": [1000, 1100], "shuffle_records": [50, 55],
           "exchanges": [3, 4], "scans": [2, 2]}
    point = {"rows_read": 100, "cache_rows_read": 0, "shuffle_bytes": 1050,
             "shuffle_records": 52, "exchanges": 3, "scans": 2}
    base = {"queries": {"q": env}}
    # a point observation inside the envelope passes
    assert cc.compare(base, {"q": dict(point)}) == []
    # structural drift OUTSIDE the recorded range fires (no slack)
    assert cc.compare(base, {"q": {**point, "exchanges": 5}})
    assert cc.compare(base, {"q": {**point, "scans": 3}})
    # rows drift beyond the 2% slack fires, inside passes
    assert cc.compare(base, {"q": {**point, "rows_read": 101}}) == []
    assert cc.compare(base, {"q": {**point, "rows_read": 150}})
    # shuffle bytes inside range+10% passes, outside fires
    assert cc.compare(base, {"q": {**point, "shuffle_bytes": 1200}}) == []
    assert cc.compare(base, {"q": {**point, "shuffle_bytes": 1500}})
    # availability change fires
    assert cc.compare(base, {"q": None})
    # new headline query without a baseline row fires
    assert cc.compare(base, {"q": dict(point), "new_q": dict(point)})
    # legacy point-valued baselines stay comparable
    assert cc.compare({"queries": {"q": dict(point)}}, {"q": dict(point)}) == []
