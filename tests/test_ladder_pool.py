"""The pooled SIZE_LADDER entries are mechanical, not hand-picked.

The at-scale scaling rungs are replicated across independently gated
windows and reported as the median-of-medians over ALL runs
(BENCH/BASELINE.md "Criterion status").  This pins that the committed
pooled entry is exactly what tools/ladder_pool.py produces from the
archived window artifacts — i.e. the reported number is reproducible
from its inputs and nobody quietly promoted the better window.

No Spark session needed: pure JSON arithmetic.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from ladder_pool import pool  # noqa: E402

BENCH = os.path.join(ROOT, "BENCH")


def _load(name):
    with open(os.path.join(BENCH, name)) as f:
        return json.load(f)


def _ladder():
    return _load("SIZE_LADDER.json")


def test_pool_reproduces_committed_1600k_entry():
    windows = [_load("WINDOW_1600K_A.json"), _load("WINDOW_1600K_B.json")]
    pooled = pool(windows)
    committed = _ladder()["1600000"]
    for key in (
        "efficiency_e2e",
        "t_low_median_s",
        "t_high_median_s",
        "low_runs_s",
        "high_runs_s",
        "pairing_efficiencies",
        "clustered_rows",
    ):
        assert pooled[key] == committed[key], key
    # per-window stamps survive the pool
    assert [w["efficiency_e2e"] for w in pooled["windows"]] == [
        w["efficiency_e2e"] for w in committed["windows"]
    ]
    assert [w["cpu_inflation"] for w in pooled["windows"]] == [
        w["cpu_inflation"] for w in committed["windows"]
    ]


def test_pooled_median_is_over_all_runs_not_best_window():
    """The pooled efficiency must NOT equal the best window's reading
    unless the medians genuinely coincide — the report is the pool."""
    committed = _ladder()["1600000"]
    best = max(w["efficiency_e2e"] for w in committed["windows"])
    worst = min(w["efficiency_e2e"] for w in committed["windows"])
    assert worst <= committed["efficiency_e2e"] <= best


def test_pool_rejects_mismatched_arm_counts():
    import pytest

    bad = {
        "low_runs_s": [10.0, 11.0],
        "high_runs_s": [3.0],
        "efficiency_e2e": 0.9,
        "calibration": {},
    }
    with pytest.raises(SystemExit):
        pool([bad])
