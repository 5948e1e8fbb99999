#!/usr/bin/env python
"""Scaling-efficiency evidence: the same end-to-end near-dup dedup job
on the same input at two parallelism levels (local[N] vs local[4N] —
the sandbox stand-in for N vs 4N executors, per BASELINE.md).

Prints one JSON line and (with --write) updates BENCH/BASELINE.md.

Efficiency definition (BASELINE.md): eff = (T_N / T_4N) / 4 — 1.0 is
perfect linear scaling, the target is >= 0.8.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from deduplicator_spark.config import DedupConfig  # noqa: E402
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf  # noqa: E402
from deduplicator_spark.operators.components import clusters_from_pairs  # noqa: E402
from deduplicator_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    verify_pairs_two_stage,
)
from deduplicator_spark.plans.chain import (  # noqa: E402
    checkpoint_parquet,
    decode_clusters,
    encode_fp,
    encode_ids,
)
from deduplicator_spark.session import build_session  # noqa: E402
from deduplicator_spark.sources.pages import synth_pages  # noqa: E402

# web-scale execution policy: buckets over 400 members use sampled-ring
# candidates (operators/buckets.py) — the planted 1500-doc boilerplate
# cluster stays connected through ~12k sampled edges instead of a
# 1.1M-pair clique, exactly the posture a 10^5-member real-world
# boilerplate bucket requires
CFG = DedupConfig(max_band_bucket=400)
# large enough that compute dominates Spark's fixed per-job overheads —
# at 50k short docs the warm job finishes in ~16s and measures the
# scheduler floor, not scaling (measured eff 0.27).  tok_scale=5 gives
# web-realistic document lengths (~200-450 tokens, matching real
# Common-Crawl pages) so per-doc fingerprint compute dominates the
# single-box shuffle floor.
N_DOCS = int(os.environ.get("SCALE_N_DOCS", "200000"))
TOK_SCALE = int(os.environ.get("SCALE_TOK_SCALE", "5"))
# N=2 vs 4N=8 (default): the N-and-4N-cores pairing where the shared
# box's memory system is least saturated at the high level — on a real
# cluster each node multiplies its own memory bandwidth / shuffle
# disks / NIC, which a single VM cannot emulate at 16+ workers (raw
# multiprocessing probe: the box itself stops scaling).  The 4-vs-16
# pairing can still be run via SCALE_N_LOW/SCALE_N_HIGH and is
# reported in BENCH/BASELINE.md alongside.
N_LOW = int(os.environ.get("SCALE_N_LOW", "2"))
N_HIGH = int(os.environ.get("SCALE_N_HIGH", "8"))
RUNS = int(os.environ.get("SCALE_RUNS", "3"))


# fixed file count, independent of which session generates the corpus:
# scan splits then provide full parallelism at EVERY level without a
# repartition — the first corpus writer used to be the local[2] session,
# leaving 2 fat files that forced the measured jobs to shuffle all 357MB
# of text before fingerprinting (a cost no real many-file ingest pays)
CORPUS_FILES = 96


def corpus_path() -> str:
    return os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"),
        f"bench_pages_n{N_DOCS}_s{CFG.seed}_t{TOK_SCALE}_p{CORPUS_FILES}",
    )


def dedup_job(spark, corpus: str) -> int:
    # NOTE: this fixture is deliberately dup-dense (~22% of docs reach
    # verification), so the stored-shingles two-stage verify is the
    # right shape here.  For realistic ~1%-dup corpora, pair
    # make_fingerprint_udf(include_shingles=False) with
    # verify_pairs_recompute instead (same output, far less Arrow
    # serialization) — both paths produce identical clusters (tested).
    fp_udf = make_fingerprint_udf(CFG)
    # no repartition: the corpus is written as CORPUS_FILES small files,
    # so scan splits already exceed every measured core count — the scan
    # feeds the UDF pipeline directly, like a real many-file ingest
    pages = spark.read.parquet(corpus)
    # parquet (not localCheckpoint): downstream references read only
    # the columns they need — see chain.checkpoint_parquet
    fp = checkpoint_parquet(
        pages.select("url", fp_udf(F.col("text")).alias("f")).select("url", "f.*"),
        "fp",
    )
    dict_ids, hash_ok = encode_ids(fp)
    fp_n = encode_fp(fp, dict_ids, hash_ok)
    banded = band_explode(fp_n, CFG)
    pairs, _ = candidate_pairs(banded, CFG)
    verified = verify_pairs_two_stage(pairs, fp_n, CFG)
    clusters = decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids)
    return clusters.count()


def fp_stage_job(spark, corpus: str) -> int:
    """The fingerprint UDF pass in isolation, in its at-scale shape
    (include_shingles=False: fixed-width signatures, no KB-scale
    shingle arrays through Arrow).  On a real cluster this stage
    dominates the cost — the N-vs-4N criterion lives or dies here, so
    it is measured separately (VERDICT r1 next-step #10)."""
    fp_udf = make_fingerprint_udf(CFG, include_shingles=False)
    pages = spark.read.parquet(corpus)
    return (
        pages.select(fp_udf(F.col("text")).alias("f"))
        .agg(F.sum("f.n_shingles"))
        .collect()[0][0]
    )


def _rest_group_metrics(spark, group: str) -> dict:
    """Aggregate executor metrics for every stage of the jobs in
    ``group``, via the Spark UI REST API (the Python status tracker
    exposes no byte counters).  This is the shuffle-byte evidence the
    scaling argument needs (VERDICT r3 #4): if shuffled bytes/doc stay
    constant across parallelism levels and corpus sizes while e2e
    efficiency sits below the raw-CPU ceiling, the non-scaling share
    is exchange bandwidth — a per-node resource a real cluster
    multiplies and a single box cannot."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{path}", timeout=15
        ) as r:
            return json.load(r)

    try:
        jobs = get("jobs")
        stage_ids = {
            sid
            for j in jobs
            if j.get("jobGroup") == group
            for sid in j.get("stageIds", [])
        }
        stages = get("stages?status=complete")
    except OSError as exc:  # UI disabled / request failed: report, don't fail the bench
        return {"error": str(exc)}
    tot = {
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
        "input_mb": 0.0,
        "output_mb": 0.0,
        "executor_run_s": 0.0,
        "n_stages": 0,
    }
    top: list[dict] = []
    mb = 1024 * 1024
    for s in stages:
        if s.get("stageId") not in stage_ids:
            continue
        tot["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / mb
        tot["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / mb
        tot["input_mb"] += s.get("inputBytes", 0) / mb
        tot["output_mb"] += s.get("outputBytes", 0) / mb
        tot["executor_run_s"] += s.get("executorRunTime", 0) / 1000.0
        tot["n_stages"] += 1
        top.append(
            {
                "stage": s.get("stageId"),
                "name": (s.get("name") or "")[:60],
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / mb, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / mb, 1),
                "executor_run_s": round(s.get("executorRunTime", 0) / 1000.0, 1),
            }
        )
    top.sort(key=lambda d: -(d["shuffle_read_mb"] + d["shuffle_write_mb"]))
    return {**{k: round(v, 1) for k, v in tot.items()}, "top_shuffle_stages": top[:6]}


def one_run(cpus: int, corpus: str, gen_if_missing: bool = False) -> tuple[float, float, int, dict]:
    """Fresh session, one warm-up, one timed e2e run + one timed
    fingerprint-stage run.  The timed e2e run executes inside a unique
    job group so its per-stage shuffle bytes can be read back from the
    REST API afterwards."""
    extra = {
        "spark.ui.showConsoleProgress": "false",
        # UI on (port auto-probes from 4040): sole consumer is the REST
        # read-back of per-stage shuffle bytes after the timed run
        "spark.ui.enabled": "true",
        # finer scan splits than the 128MB default: the 96-file corpus
        # otherwise packs into ~6-8 splits, i.e. a SINGLE task wave at
        # local[8] where one straggler extends the whole stage.  16MB
        # splits give ~4 waves at the high level so stragglers amortize
        # — the granularity a real cluster gets for free from many
        # input files per executor.
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"  # keep shuffle off slow VM disk
    spark = build_session(
        app_name=f"dedup-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,  # see session.py: 1x-cores spills on wide rows
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if gen_if_missing and not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synth_pages(
            spark, N_DOCS, partitions=CORPUS_FILES, tok_scale=TOK_SCALE
        ).write.mode("overwrite").parquet(corpus)
    dedup_job(spark, corpus)  # warm-up (JVM, Arrow workers, code paths)
    sc = spark.sparkContext
    group = f"e2e-timed-{cpus}"
    sc.setJobGroup(group, "timed e2e dedup run")
    t0 = time.monotonic()
    rows = dedup_job(spark, corpus)
    dt = round(time.monotonic() - t0, 2)
    sc.setLocalProperty("spark.jobGroup.id", None)
    shuffle = _rest_group_metrics(spark, group)
    t1 = time.monotonic()
    fp_stage_job(spark, corpus)
    fp_dt = round(time.monotonic() - t1, 2)
    spark.stop()
    return dt, fp_dt, rows, shuffle


def cpu_calibration() -> dict:
    """Raw-CPU AND memory-bandwidth scaling ceilings of this (shared)
    box — context for interpreting the Spark numbers.

    Two probes because the two resources fail independently: the
    integer-loop probe (cache-resident) senses CPU-stealing neighbors
    but is blind to bandwidth-streaming ones, and round 5 measured
    windows with 0.93-1.02 pure-CPU calibrations whose executor CPU
    still inflated 1.6-2.4x on identical bytes — bandwidth-shaped
    neighbor load the old stamp could not see.  The streaming probe
    (tools/membw_probe.py: numpy add over arrays far larger than LLC,
    aggregate GB/s at N vs 4N workers) stamps exactly the resource the
    round-4 shuffle-byte evidence pinned the e2e gap on."""
    import multiprocessing as mp

    def probe(workers: int, tasks: int) -> float:
        with mp.Pool(workers) as p:
            t0 = time.monotonic()
            p.map(_burn, range(tasks))
            return tasks / (time.monotonic() - t0)

    lo = probe(N_LOW, N_LOW * 4)
    hi = probe(N_HIGH, N_HIGH * 4)
    out = {
        "raw_low_tasks_per_s": round(lo, 1),
        "raw_high_tasks_per_s": round(hi, 1),
        "raw_efficiency": round((hi / lo) / (N_HIGH / N_LOW), 3),
    }
    try:
        from tools.membw_probe import measure as membw_measure

        out.update(membw_measure(N_LOW, N_HIGH))
    except Exception:
        pass  # probe is context, never a gate failure
    return out


def _burn(_):
    x = 0
    for i in range(8_000_000):
        x += i * i
    return x


def _write_results(result: dict, low: dict, high: dict, eff: float, calib: dict) -> None:
    """Drop raw JSON and patch ONLY the marked headline block of
    BENCH/BASELINE.md (the rest of that file is hand-maintained
    analysis)."""
    bench_dir = os.path.join(ROOT, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "RESULTS.json"), "w") as f:
        json.dump(result, f, indent=2)
    md_path = os.path.join(bench_dir, "BASELINE.md")
    if not os.path.exists(md_path):
        return
    fp_eff = round(
        (low["fp_stage_median_s"] / high["fp_stage_median_s"]) / (N_HIGH / N_LOW), 3
    )
    block = f"""<!-- HEADLINE:BEGIN -->
| parallelism | e2e runs (s) | e2e median (s) | docs/sec | fp-stage runs (s) | fp-stage median (s) |
|---|---|---|---|---|---|
| local[{N_LOW}] | {low['times_s']} | {low['median_s']} | {low['docs_per_sec']} | {low['fp_stage_times_s']} | {low['fp_stage_median_s']} |
| local[{N_HIGH}] | {high['times_s']} | {high['median_s']} | {high['docs_per_sec']} | {high['fp_stage_times_s']} | {high['fp_stage_median_s']} |

**End-to-end scaling efficiency** = (T_{N_LOW} / T_{N_HIGH}) / {N_HIGH // N_LOW} = **{eff}**
**Fingerprint-stage efficiency** (the cluster-dominant cost, at-scale shape) = **{fp_eff}**
(same-window raw-CPU calibration: {calib['raw_efficiency']})
<!-- HEADLINE:END -->"""
    import re as _re

    text = open(md_path).read()
    new = _re.sub(
        r"<!-- HEADLINE:BEGIN -->.*?<!-- HEADLINE:END -->", block, text, flags=_re.S
    )
    open(md_path, "w").write(new)


# a scaling measurement is only meaningful while the BOX ITSELF scales:
# this shared VM's raw-CPU 2->8 efficiency swings 0.66-0.99 with
# neighbor load, and any Spark reading taken in a degraded window
# underestimates the job (observed: same code measured e2e 0.538 in a
# 0.658-calibration window and 0.625+ in 0.88+ windows).  Gate the run
# on a quiet window and stamp it with begin/end calibrations so a
# mid-run degradation is visible in the artifact.
MIN_CALIB = float(os.environ.get("SCALE_MIN_CALIB", "0.85"))
# bandwidth gate (round 5): a window can pass the pure-CPU gate while a
# neighbor streams through RAM; the membw probe senses that directly.
# 0.7 default — a quiet 2->8 step measures 0.9+ on this box.
MIN_MEMBW = float(os.environ.get("SCALE_MIN_MEMBW", "0.7"))
CALIB_TRIES = int(os.environ.get("SCALE_CALIB_TRIES", "10"))


def _calib_ok(calib: dict) -> bool:
    if calib["raw_efficiency"] < MIN_CALIB:
        return False
    membw = calib.get("membw_efficiency")
    return membw is None or membw >= MIN_MEMBW


def wait_for_quiet_window() -> dict:
    calib = cpu_calibration()
    for _ in range(CALIB_TRIES - 1):
        if _calib_ok(calib):
            break
        print(
            f"# box not quiet (raw-CPU eff {calib['raw_efficiency']} vs "
            f">={MIN_CALIB}, membw eff {calib.get('membw_efficiency')} vs "
            f">={MIN_MEMBW}), waiting for a quiet window",
            file=sys.stderr,
        )
        time.sleep(90)
        calib = cpu_calibration()
    return calib


def main() -> None:
    corpus = corpus_path()
    calib_begin = wait_for_quiet_window()
    # interleave levels (ABAB...) so host-load drift hits both equally
    times: dict[int, list[float]] = {N_LOW: [], N_HIGH: []}
    fp_times: dict[int, list[float]] = {N_LOW: [], N_HIGH: []}
    shuffles: dict[int, dict] = {}
    cpu_runs: dict[int, list[float]] = {N_LOW: [], N_HIGH: []}
    rows = 0
    first = True
    for _ in range(RUNS):
        for cpus in (N_LOW, N_HIGH):
            dt, fp_dt, rows, shuffle = one_run(cpus, corpus, gen_if_missing=first)
            first = False
            times[cpus].append(dt)
            fp_times[cpus].append(fp_dt)
            shuffles[cpus] = shuffle  # byte totals are load-independent; last run suffices
            # executor CPU seconds are NOT load-independent (memory
            # stalls inflate them) — keep every run's reading so the
            # inflation evidence can use a median, not whichever run
            # happened to come last
            if "executor_run_s" in shuffle:
                cpu_runs[cpus].append(shuffle["executor_run_s"])
    for cpus in (N_LOW, N_HIGH):
        if cpus in shuffles and cpu_runs[cpus]:
            shuffles[cpus]["executor_run_s_runs"] = cpu_runs[cpus]
            shuffles[cpus]["executor_run_s"] = statistics.median(cpu_runs[cpus])
    calib = cpu_calibration()
    calib["raw_efficiency_begin"] = calib_begin["raw_efficiency"]
    if "membw_efficiency" in calib_begin:
        calib["membw_efficiency_begin"] = calib_begin["membw_efficiency"]

    def level(cpus: int) -> dict:
        return {
            "cpus": cpus,
            "times_s": times[cpus],
            "median_s": statistics.median(times[cpus]),
            "docs_per_sec": round(N_DOCS / statistics.median(times[cpus]), 1),
            "fp_stage_times_s": fp_times[cpus],
            "fp_stage_median_s": statistics.median(fp_times[cpus]),
            "fp_stage_docs_per_sec": round(
                N_DOCS / statistics.median(fp_times[cpus]), 1
            ),
            "clustered_rows": rows,
            "shuffle": shuffles.get(cpus, {}),
            "shuffle_bytes_per_doc": (
                round(
                    (
                        shuffles[cpus].get("shuffle_read_mb", 0)
                        + shuffles[cpus].get("shuffle_write_mb", 0)
                    )
                    * 1024
                    * 1024
                    / N_DOCS,
                    1,
                )
                if cpus in shuffles and "error" not in shuffles[cpus]
                else None
            ),
        }

    low, high = level(N_LOW), level(N_HIGH)
    ratio = N_HIGH / N_LOW
    eff = round((low["median_s"] / high["median_s"]) / ratio, 3)
    fp_eff = round((low["fp_stage_median_s"] / high["fp_stage_median_s"]) / ratio, 3)
    result = {
        "metric": "scaling_efficiency",
        "value": eff,
        "fp_stage_efficiency": fp_eff,
        "unit": f"(T_{N_LOW}/T_{N_HIGH})/{N_HIGH // N_LOW}",
        "n_docs": N_DOCS,
        "low": low,
        "high": high,
        "cpu_calibration": calib,
        "config": CFG.config_id,
    }
    print(json.dumps(result))
    if "--write" in sys.argv:
        _write_results(result, low, high, eff, calib)
    if "--write-legacy" in sys.argv:
        os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
        with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
            f.write(
                f"""# BENCH/BASELINE — scaling-efficiency evidence

Same end-to-end near-dup dedup job (fingerprint -> LSH bands ->
candidate pairs -> exact-Jaccard verify -> connected components), same
deterministic input ({N_DOCS} synthetic pages at web-realistic lengths
(tok_scale={TOK_SCALE}, ~200-450 tokens/doc), seed {CFG.seed}, config
`{CFG.config_id}`), at two parallelism levels — the sandbox evidence
for the N vs 4N executor criterion (BASELINE.json; no real cluster in
this environment).

| parallelism | runs (s) | median (s) | docs/sec |
|---|---|---|---|
| local[{N_LOW}] | {low['times_s']} | {low['median_s']} | {low['docs_per_sec']} |
| local[{N_HIGH}] | {high['times_s']} | {high['median_s']} | {high['docs_per_sec']} |

**Scaling efficiency** = (T_{N_LOW} / T_{N_HIGH}) / {N_HIGH // N_LOW} =
**{eff}** (target >= 0.8; 1.0 = perfect linear).

Hardware context: this sandbox is a shared VM; a pure-CPU
multiprocessing probe run in the same session measures a raw scaling
ceiling of **{calib['raw_efficiency']}** for the same {N_LOW}->{N_HIGH}
worker step ({calib['raw_low_tasks_per_s']} -> {calib['raw_high_tasks_per_s']}
tasks/s), i.e. the box itself does not deliver a clean 4x. The Spark
efficiency above should be read against that ceiling.

Both levels cluster {high['clustered_rows']} rows (identical output).

Method: levels interleaved ABAB x{RUNS} to cancel host-load drift; each
run = fresh SparkSession + 1 warm-up + 1 timed end-to-end job;
`spark.sql.shuffle.partitions` = core count. Generated by
`bench_scaling.py --write`.
"""
            )


if __name__ == "__main__":
    main()
