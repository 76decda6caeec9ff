"""Scale-soak artifact checks (round-10 verdict #3).

``counters_scale.json`` is produced by ``scripts/scale_soak.py``: the
heavy dedup/ANN tier measured at three corpus scales (1×, 4×, 10× of
sf0.1 with similarity-destroying replication), per-counter growth
exponents fitted per scale pair. These tests assert the COMMITTED
artifact — the "safe at 100 TB" shape arguments as measured numbers:

- every heavy query's rows_read / shuffle_records / shuffle_bytes
  growth exponent stays near-linear (min over scale pairs, so a
  one-time broadcast→shuffle plan transition doesn't read as a
  blowup while a true quadratic — superlinear on every pair — does);
- the artifact covers the declared heavy list (a query silently
  dropped from the soak would otherwise pass by absence).

Regenerate with ``python scripts/scale_soak.py`` after changing any
covered operator; the script exits nonzero when a bound fails, so a
re-quadratized join cannot be committed green.
"""

from __future__ import annotations

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "counters_scale.json")


@pytest.fixture(scope="module")
def soak():
    assert os.path.exists(ARTIFACT), (
        "counters_scale.json missing — run scripts/scale_soak.py"
    )
    return json.load(open(ARTIFACT))


def test_soak_covers_the_heavy_list(soak):
    import scripts.scale_soak as ss

    missing = set(ss.HEAVY) - set(soak["queries"])
    assert not missing, f"heavy queries missing from the soak: {missing}"
    assert "semantic_dedup_scaled" in soak["queries"]
    # the streaming STATE subject (r11): its rows/state counters come
    # from query progress, not the plan auditor — dropping it would
    # silently lose the streaming tier's only measured exponent
    assert "dedup_exact_stream_state" in soak["queries"]
    stream = soak["queries"]["dedup_exact_stream_state"]["counters"]
    assert all(c["rows_read"] > 0 for c in stream.values()), (
        "stream subject measured zero input rows — the r11 staging bug class"
    )


def test_soak_measured_three_scales(soak):
    assert len(soak["scales"]) == 3 and soak["scales"][0] == 1
    for q in soak["queries"].values():
        assert set(q["counters"]) == {str(r) for r in soak["scales"]}


def test_every_growth_exponent_is_near_linear(soak):
    bad = {
        name: q["exponents"]
        for name, q in soak["queries"].items()
        if not q["ok"]
    }
    assert not bad, f"superlinear work growth: {bad}"


def test_exponents_bounded_where_counters_are_material(soak):
    """Re-derive the verdicts from the raw counters (the ok flags must
    not be hand-editable into green)."""
    import math

    scales = soak["scales"]
    floor = soak["abs_floor"]
    for name, q in soak["queries"].items():
        for c in soak["bounded_counters"]:
            vals = [q["counters"][str(r)].get(c, 0) for r in scales]
            es = [
                math.log(vals[i + 1] / vals[i])
                / math.log(scales[i + 1] / scales[i])
                for i in range(len(scales) - 1)
                if vals[i] and vals[i + 1]
            ]
            if not es or vals[-1] < floor:
                continue
            assert min(es) <= soak["max_exponent"] + 1e-9, (
                f"{name}.{c}: min growth exponent {min(es):.2f} exceeds "
                f"{soak['max_exponent']}"
            )
