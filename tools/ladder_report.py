#!/usr/bin/env python
"""Render BENCH/RESULTS.json + BENCH/SIZE_LADDER.json into the marked
blocks of BENCH/BASELINE.md (SIZELADDER + SHUFFLE), so the evidence
tables are regenerated mechanically from the raw artifacts.

Usage: python tools/ladder_report.py          # patches BENCH/BASELINE.md
       python tools/ladder_report.py --print  # prints the blocks only
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "BENCH")


def _cal(c: dict) -> str:
    if "begin" in c:  # pooled entry (tools/ladder_pool.py): per-window stamps
        return " · ".join(
            f"{chr(ord('A') + i)}: {b:.2f}/{e:.2f}"
            for i, (b, e) in enumerate(zip(c["begin"], c["end"]))
        )
    b = c.get("raw_efficiency_begin")
    e = c.get("raw_efficiency")
    return f"{b:.2f} / {e:.2f}" if b is not None else f"{e:.2f}"


def size_ladder_block(ladder: dict) -> str:
    lines = [
        "<!-- SIZELADDER:BEGIN -->",
        "| n_docs | T_2 median (s) | T_8 median (s) | e2e eff | fp-stage eff | shuffle MB r+w (T_2 / T_8) | shuffle B/doc (T_2 / T_8) | window calibration |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n in sorted(ladder, key=int):
        r = ladder[n]

        def mb(side):
            s = r.get(f"shuffle_{side}") or {}
            if "error" in s or not s:
                return "-"
            return f"{s.get('shuffle_read_mb', 0) + s.get('shuffle_write_mb', 0):.0f}"

        bpd_lo = r.get("shuffle_bytes_per_doc_low")
        bpd_hi = r.get("shuffle_bytes_per_doc_high")
        bpd = (
            f"{bpd_lo:.0f} / {bpd_hi:.0f}"
            if bpd_lo is not None and bpd_hi is not None
            else "-"
        )
        windows = r.get("windows")
        if windows:
            runs = len(r["low_runs_s"])
            label = f"{int(n):,} ({len(windows)} windows, {runs} runs/arm)"
            wins = ", ".join(str(w["efficiency_e2e"]) for w in windows)
            eff = f"{r['efficiency_e2e']} pooled (windows: {wins})"
        else:
            label = f"{int(n):,}"
            eff = str(r["efficiency_e2e"])
        lines.append(
            f"| {label} | {r['t_low_median_s']:.1f} | {r['t_high_median_s']:.1f} "
            f"| {eff} | {r['efficiency_fp_stage']} "
            f"| {mb('low')} / {mb('high')} | {bpd} | {_cal(r['calibration'])} |"
        )
    lines.append("<!-- SIZELADDER:END -->")
    return "\n".join(lines)


def shuffle_block(results: dict) -> str:
    lines = ["<!-- SHUFFLE:BEGIN -->"]
    lo, hi = results.get("low", {}), results.get("high", {})
    slo, shi = lo.get("shuffle") or {}, hi.get("shuffle") or {}
    if "error" in slo or not slo:
        lines += ["(no shuffle metrics in BENCH/RESULTS.json)", "<!-- SHUFFLE:END -->"]
        return "\n".join(lines)
    lines += [
        f"Timed-run executor metrics at n = {results['n_docs']:,} docs (REST"
        " read-back of the e2e job's stages; byte totals are"
        " load-independent):",
        "",
        "| level | shuffle read MB | shuffle write MB | input MB | executor CPU s | e2e wall s (median) |",
        "|---|---|---|---|---|---|",
    ]
    for name, lvl, s in (("local[2]", lo, slo), ("local[8]", hi, shi)):
        lines.append(
            f"| {name} | {s['shuffle_read_mb']} | {s['shuffle_write_mb']} "
            f"| {s['input_mb']} | {s['executor_run_s']} | {lvl['median_s']} |"
        )
    infl = (
        round(shi["executor_run_s"] / slo["executor_run_s"], 2)
        if slo.get("executor_run_s")
        else None
    )
    lines += [
        "",
        f"**Executor CPU-time inflation at 4x threads: {infl}x** for the"
        " same job on the same bytes — the same instructions simply run"
        " slower when 8 workers contend for one memory system.  That"
        " inflation, not extra work and not fixed overhead, is the e2e"
        " efficiency gap; per-node memory bandwidth is exactly what a"
        " real 4N-executor cluster multiplies and one VM cannot.",
        "<!-- SHUFFLE:END -->",
    ]
    return "\n".join(lines)


def main() -> None:
    with open(os.path.join(BENCH, "SIZE_LADDER.json")) as f:
        ladder = json.load(f)
    with open(os.path.join(BENCH, "RESULTS.json")) as f:
        results = json.load(f)
    sl = size_ladder_block(ladder)
    sh = shuffle_block(results)
    if "--print" in sys.argv:
        print(sl + "\n\n" + sh)
        return
    path = os.path.join(BENCH, "BASELINE.md")
    text = open(path).read()
    text = re.sub(
        r"<!-- SIZELADDER:BEGIN -->.*?<!-- SIZELADDER:END -->", sl, text, flags=re.S
    )
    if "<!-- SHUFFLE:BEGIN -->" in text:
        text = re.sub(
            r"<!-- SHUFFLE:BEGIN -->.*?<!-- SHUFFLE:END -->", sh, text, flags=re.S
        )
    else:
        anchor = "## Why the single-box number must be read against a ladder"
        text = text.replace(anchor, "## Shuffle-byte evidence\n\n" + sh + "\n\n" + anchor)
    open(path, "w").write(text)
    print("BENCH/BASELINE.md updated")


if __name__ == "__main__":
    main()
