#!/usr/bin/env python
"""Per-stage shuffle profile of the scaling-bench e2e job.

Runs bench_scaling.dedup_job once (after a warm-up) at a chosen
parallelism and dumps EVERY completed stage's shuffle read/write,
input/output and executor time, ordered by stage id — the attribution
step behind the shuffle-byte scaling evidence (BENCH/BASELINE.md).

Usage: python tools/profile_e2e.py [cpus] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench_scaling as bs  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if len(sys.argv) > 2:
        bs.N_DOCS = int(sys.argv[2])
    corpus = bs.corpus_path()
    from deduplicator_spark.session import build_session

    spark = build_session(
        app_name=f"profile-e2e-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from deduplicator_spark.sources.pages import synth_pages

        synth_pages(
            spark, bs.N_DOCS, partitions=bs.CORPUS_FILES, tok_scale=bs.TOK_SCALE
        ).write.mode("overwrite").parquet(corpus)
    # warm-up
    bs.dedup_job(spark, corpus)
    sc = spark.sparkContext
    sc.setJobGroup("profiled", "timed e2e run")
    t0 = time.time()
    n = bs.dedup_job(spark, corpus)
    wall = time.time() - t0
    sc.setJobGroup("", "")

    import urllib.request

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def get(path: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{path}", timeout=15
        ) as r:
            return json.load(r)

    jobs = get("jobs")
    stage_job = {}
    for j in jobs:
        if j.get("jobGroup") != "profiled":
            continue
        for sid in j.get("stageIds", []):
            stage_job[sid] = j.get("jobId")
    stages = get("stages?status=complete")
    mb = 1024 * 1024
    rows = []
    for s in stages:
        sid = s.get("stageId")
        if sid not in stage_job:
            continue
        rows.append(
            {
                "stage": sid,
                "job": stage_job[sid],
                "tasks": s.get("numCompleteTasks"),
                "read_mb": round(s.get("shuffleReadBytes", 0) / mb, 1),
                "write_mb": round(s.get("shuffleWriteBytes", 0) / mb, 1),
                "input_mb": round(s.get("inputBytes", 0) / mb, 1),
                "output_mb": round(s.get("outputBytes", 0) / mb, 1),
                "cpu_s": round(s.get("executorRunTime", 0) / 1000.0, 1),
                "name": (s.get("name") or "")[:48],
            }
        )
    rows.sort(key=lambda d: d["stage"])
    tot_r = sum(r["read_mb"] for r in rows)
    tot_w = sum(r["write_mb"] for r in rows)
    tot_c = sum(r["cpu_s"] for r in rows)
    print(f"\nwall={wall:.1f}s clusters={n} cpus={cpus} n_docs={bs.N_DOCS}")
    print(f"total shuffle read={tot_r:.0f}MB write={tot_w:.0f}MB executor_cpu={tot_c:.0f}s stages={len(rows)}")
    hdr = f"{'stg':>4} {'job':>4} {'tsk':>4} {'readMB':>8} {'writeMB':>8} {'inMB':>7} {'cpu_s':>7}  name"
    print(hdr)
    for r in rows:
        print(
            f"{r['stage']:>4} {r['job']:>4} {r['tasks']:>4} {r['read_mb']:>8} "
            f"{r['write_mb']:>8} {r['input_mb']:>7} {r['cpu_s']:>7}  {r['name']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
