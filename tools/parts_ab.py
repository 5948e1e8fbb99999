#!/usr/bin/env python
"""Interleaved A/B: shuffle.partitions = 1x vs 4x cores, same session.

The only noise-proof protocol on this shared box (±2-4x swings between
sessions): alternate the two settings ABAB within ONE session per
parallelism level and compare medians.  Times the full dedup_job
(fingerprint -> LSH -> verify -> CC) per setting.

Usage: python tools/parts_ab.py [cpus] [rounds]   (default 8 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench_scaling import CFG, N_DOCS, corpus_path, dedup_job  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    extra = {
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = build_session(
        app_name=f"parts-ab-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_path()
    dedup_job(spark, corpus)  # warm-up

    samples: dict[str, list[float]] = {"1x": [], "4x": []}
    for _ in range(rounds):
        for label, parts in (("1x", cpus), ("4x", 4 * cpus)):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            t0 = time.monotonic()
            dedup_job(spark, corpus)
            samples[label].append(round(time.monotonic() - t0, 2))
    spark.stop()
    out = {
        "cpus": cpus,
        "n_docs": N_DOCS,
        "config": CFG.config_id,
        "samples": samples,
        "median": {k: statistics.median(v) for k, v in samples.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
