#!/usr/bin/env python
"""Pool replicated scaling windows into one SIZE_LADDER entry.

The at-scale rungs of the size ladder are REPLICATED: the same gated
interleaved protocol (bench_scaling.py) runs more than once, in
independently calibrated windows, and the reported efficiency is the
median-of-medians over ALL runs — not the best window.  Round 5's
1.6M entry was assembled by hand from its two windows; this tool makes
the merge mechanical and reproducible for any rung.

Inputs are window artifacts in either shape:
  * raw bench_scaling.py output (keys: low/high/value/cpu_calibration), or
  * a SIZE_LADDER row previously written by tools/scaling_size_ladder.py
    (keys: low_runs_s/high_runs_s/calibration/...).

Usage:
  python tools/ladder_pool.py N_DOCS window_a.json [window_b.json ...]
    # prints the pooled entry and patches BENCH/SIZE_LADDER.json[N_DOCS]
  python tools/ladder_pool.py --print N_DOCS window_a.json ...
    # prints only
"""

from __future__ import annotations

import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH", "SIZE_LADDER.json")


def _normalize(w: dict) -> dict:
    """Reduce either artifact shape to one window record."""
    if "low" in w and "high" in w:  # raw bench_scaling output
        cal = w.get("cpu_calibration", {})
        lo, hi = w["low"], w["high"]
        return {
            "low_runs_s": lo["times_s"],
            "high_runs_s": hi["times_s"],
            "fp_low_runs_s": lo.get("fp_stage_times_s"),
            "fp_high_runs_s": hi.get("fp_stage_times_s"),
            "efficiency_e2e": w["value"],
            "efficiency_fp_stage": w.get("fp_stage_efficiency"),
            "calibration": {
                "raw_efficiency_begin": cal.get("raw_efficiency_begin"),
                "raw_efficiency": cal.get("raw_efficiency"),
                "raw_low_tasks_per_s": cal.get("raw_low_tasks_per_s"),
                "raw_high_tasks_per_s": cal.get("raw_high_tasks_per_s"),
            },
            "shuffle_low": lo.get("shuffle"),
            "shuffle_high": hi.get("shuffle"),
            "shuffle_bytes_per_doc_low": lo.get("shuffle_bytes_per_doc"),
            "shuffle_bytes_per_doc_high": hi.get("shuffle_bytes_per_doc"),
            "clustered_rows": lo.get("clustered_rows"),
        }
    # SIZE_LADDER row shape
    return {
        "low_runs_s": w["low_runs_s"],
        "high_runs_s": w["high_runs_s"],
        "fp_low_runs_s": w.get("fp_low_runs_s"),
        "fp_high_runs_s": w.get("fp_high_runs_s"),
        "efficiency_e2e": w["efficiency_e2e"],
        "efficiency_fp_stage": w.get("efficiency_fp_stage"),
        "calibration": w.get("calibration", {}),
        "shuffle_low": w.get("shuffle_low"),
        "shuffle_high": w.get("shuffle_high"),
        "shuffle_bytes_per_doc_low": w.get("shuffle_bytes_per_doc_low"),
        "shuffle_bytes_per_doc_high": w.get("shuffle_bytes_per_doc_high"),
        "clustered_rows": w.get("clustered_rows"),
    }


def _inflation(w: dict) -> float | None:
    lo = (w.get("shuffle_low") or {}).get("executor_run_s")
    hi = (w.get("shuffle_high") or {}).get("executor_run_s")
    return round(hi / lo, 3) if lo and hi else None


def pool(windows: list[dict]) -> dict:
    ws = [_normalize(w) for w in windows]
    low_all = [t for w in ws for t in w["low_runs_s"]]
    high_all = [t for w in ws for t in w["high_runs_s"]]
    if len(low_all) != len(high_all):
        raise SystemExit("windows are not interleaved pairs: arm run counts differ")
    eff = round(statistics.median(low_all) / statistics.median(high_all) / 4, 3)
    # pool fp-stage times only when EVERY window carries them (SIZE_LADDER
    # rows do not); otherwise a times-pool would silently weight only the
    # raw-shaped windows — fall back to the median of per-window readings
    if all(w["fp_low_runs_s"] and w["fp_high_runs_s"] for w in ws):
        fp_lo = [t for w in ws for t in w["fp_low_runs_s"]]
        fp_hi = [t for w in ws for t in w["fp_high_runs_s"]]
        fp_eff = round(statistics.median(fp_lo) / statistics.median(fp_hi) / 4, 3)
    else:
        fp_eff = round(
            statistics.median(
                w["efficiency_fp_stage"] for w in ws if w["efficiency_fp_stage"]
            ),
            3,
        )
    # per interleaved pair: run i of the low arm against run i of the high arm
    pairings = sorted(
        round(lo / hi / 4, 3) for lo, hi in zip(low_all, high_all)
    )
    last = ws[-1]
    entry = {
        "efficiency_e2e": eff,
        "efficiency_fp_stage": fp_eff,
        "t_low_median_s": round(statistics.median(low_all), 3),
        "t_high_median_s": round(statistics.median(high_all), 3),
        "low_runs_s": low_all,
        "high_runs_s": high_all,
        "pairing_efficiencies": pairings,
        "calibration": {
            "begin": [w["calibration"].get("raw_efficiency_begin") for w in ws],
            "end": [w["calibration"].get("raw_efficiency") for w in ws],
            "note": (
                f"pooled over {len(ws)} independently gated windows; "
                "per-window stamps in windows[]"
            ),
        },
        "clustered_rows": last["clustered_rows"],
        "shuffle_low": ws[0]["shuffle_low"],
        "shuffle_high": ws[0]["shuffle_high"],
        "shuffle_bytes_per_doc_low": last["shuffle_bytes_per_doc_low"],
        "shuffle_bytes_per_doc_high": last["shuffle_bytes_per_doc_high"],
        "windows": [
            {
                "low_runs_s": w["low_runs_s"],
                "high_runs_s": w["high_runs_s"],
                "efficiency_e2e": w["efficiency_e2e"],
                "efficiency_fp_stage": w["efficiency_fp_stage"],
                "calibration": w["calibration"],
                "cpu_inflation": _inflation(w),
            }
            for w in ws
        ],
    }
    # additional windows' shuffle read-backs, keyed _window_b, _window_c, ...
    for i, w in enumerate(ws[1:]):
        suffix = chr(ord("b") + i)
        entry[f"shuffle_low_window_{suffix}"] = w["shuffle_low"]
        entry[f"shuffle_high_window_{suffix}"] = w["shuffle_high"]
    return entry


def main() -> None:
    argv = sys.argv[1:]
    print_only = "--print" in argv
    argv = [a for a in argv if a != "--print"]
    if len(argv) < 2:
        raise SystemExit(__doc__)
    n_docs, paths = argv[0], argv[1:]
    windows = []
    for p in paths:
        with open(p) as f:
            windows.append(json.load(f))
    entry = pool(windows)
    print(json.dumps(entry, indent=2, sort_keys=True))
    if not print_only:
        with open(OUT) as f:
            ladder = json.load(f)
        ladder[str(int(n_docs))] = entry
        with open(OUT, "w") as f:
            json.dump(ladder, f, indent=2, sort_keys=True)
        print(f"# patched {OUT}[{int(n_docs)}]", file=sys.stderr)


if __name__ == "__main__":
    main()
