#!/usr/bin/env python
"""Probe: why does verify_pairs_two_stage scale negatively 2->8 cores?

Times three verify variants at two parallelism levels over the SAME
precomputed candidate pairs + fingerprints (localCheckpointed, so only
the verify stage is measured):

  v1: verify_pairs_two_stage as-is (stored shingle arrays)
  v2: same, but shuffle.partitions = 4x cores (smaller per-task sorts)
  v3: verify_pairs_two_stage_recompute (signatures only; shingles
      recomputed for survivors — the at-scale shape)

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from deduplicator_spark.config import DedupConfig  # noqa: E402
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf  # noqa: E402
from deduplicator_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    verify_pairs_two_stage,
    verify_pairs_two_stage_recompute,
)
from deduplicator_spark.plans.chain import encode_fp, encode_ids  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402

CFG = DedupConfig(max_band_bucket=400)
N_DOCS = int(os.environ.get("SCALE_N_DOCS", "200000"))
TOK_SCALE = int(os.environ.get("SCALE_TOK_SCALE", "5"))
CORPUS_FILES = 96


def corpus_path() -> str:
    return os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"),
        f"bench_pages_n{N_DOCS}_s{CFG.seed}_t{TOK_SCALE}_p{CORPUS_FILES}",
    )


def run_level(cpus: int) -> dict:
    extra = {
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = build_session(
        app_name=f"verify-probe-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,  # see session.py: 1x-cores spills on wide rows
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_path()

    fp_udf = make_fingerprint_udf(CFG)
    pages = spark.read.parquet(corpus)
    fp = (
        pages.select("url", "text", fp_udf(F.col("text")).alias("f"))
        .select("url", "text", "f.*")
        .localCheckpoint()
    )
    dict_ids, hash_ok = encode_ids(fp)
    fp_n = encode_fp(fp, dict_ids, hash_ok).localCheckpoint()
    banded = band_explode(fp_n, CFG)
    pairs, _ = candidate_pairs(banded, CFG)
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    texts = fp_n.select("url", "text").localCheckpoint()

    out: dict[str, float] = {"cpus": cpus, "n_pairs": n_pairs}

    def timed(name, fn, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            n = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            out.setdefault(name + "_rows", n)
        out[name] = round(best, 2)

    timed("v1_stored", lambda: verify_pairs_two_stage(pairs, fp_n, CFG).count())

    def v2():
        spark.conf.set("spark.sql.shuffle.partitions", str(4 * cpus))
        try:
            return verify_pairs_two_stage(pairs, fp_n, CFG).count()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))

    timed("v2_more_parts", v2)

    timed(
        "v3_recompute",
        lambda: verify_pairs_two_stage_recompute(pairs, fp_n, texts, CFG).count(),
    )
    spark.stop()
    return out


def main() -> None:
    lo = run_level(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
    hi = run_level(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    ratio = {
        k: round(lo[k] / hi[k], 2)
        for k in ("v1_stored", "v2_more_parts", "v3_recompute")
        if hi.get(k)
    }
    print(json.dumps({"low": lo, "high": hi, "speedup": ratio}))


if __name__ == "__main__":
    main()
