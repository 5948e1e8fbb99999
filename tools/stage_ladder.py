#!/usr/bin/env python
"""Per-stage scaling ladder for the flagship dedup chain.

Times each stage of bench_scaling's dedup_job separately (localCheckpoint
barriers between stages so each timing covers exactly one stage) at two
parallelism levels, printing one JSON line.  Used to attribute the e2e
scaling gap to a stage (BENCH/BASELINE.md analysis).

Usage: python tools/stage_ladder.py [low high]   (default 2 8)
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
from deduplicator_spark.operators.components import clusters_from_pairs  # noqa: E402
from deduplicator_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    verify_pairs_two_stage,
)
from deduplicator_spark.plans.chain import decode_clusters, encode_fp, encode_ids  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402
from deduplicator_spark.sources.pages import synth_pages  # noqa: E402

CFG = DedupConfig(max_band_bucket=400)
N_DOCS = int(os.environ.get("SCALE_N_DOCS", "200000"))
TOK_SCALE = int(os.environ.get("SCALE_TOK_SCALE", "5"))
CORPUS_FILES = 96


def corpus_path() -> str:
    return os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"),
        f"bench_pages_n{N_DOCS}_s{CFG.seed}_t{TOK_SCALE}_p{CORPUS_FILES}",
    )


def staged_job(spark, corpus: str) -> dict[str, float]:
    walls: dict[str, float] = {}

    def stage(name, fn):
        t0 = time.monotonic()
        out = fn()
        walls[name] = round(time.monotonic() - t0, 2)
        return out

    fp_udf = make_fingerprint_udf(CFG)

    def s_fp():
        from deduplicator_spark.plans.chain import checkpoint_parquet

        pages = spark.read.parquet(corpus)
        fp = pages.select("url", fp_udf(F.col("text")).alias("f")).select("url", "f.*")
        # parquet checkpoint — matches dedup_job's current shape
        return checkpoint_parquet(fp, "ladder_fp")

    fp = stage("fingerprint", s_fp)

    def s_encode():
        from deduplicator_spark.plans.chain import checkpoint_parquet

        dict_ids, hash_ok = encode_ids(fp)
        # parquet barrier keeps column pruning for the downstream stages
        fp_n = checkpoint_parquet(encode_fp(fp, dict_ids, hash_ok), "ladder_fp_n")
        return dict_ids, fp_n

    dict_ids, fp_n = stage("encode_ids", s_encode)

    def s_pairs():
        banded = band_explode(fp_n, CFG)
        pairs, _ = candidate_pairs(banded, CFG)
        return pairs.localCheckpoint()

    pairs = stage("candidate_pairs", s_pairs)

    def s_verify():
        return verify_pairs_two_stage(pairs, fp_n, CFG).localCheckpoint()

    verified = stage("verify", s_verify)

    def s_cc():
        clusters = decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids)
        return clusters.count()

    rows = stage("cc_decode", s_cc)
    walls["clustered_rows"] = rows
    return walls


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
        app_name=f"ladder-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,  # see session.py: 1x-cores spills on wide rows
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_path()
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synth_pages(spark, N_DOCS, partitions=CORPUS_FILES, tok_scale=TOK_SCALE).write.mode(
            "overwrite"
        ).parquet(corpus)
    staged_job(spark, corpus)  # warm-up
    walls = staged_job(spark, corpus)
    spark.stop()
    return walls


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo, hi = run_level(low), run_level(high)
    stages = [k for k in lo if k != "clustered_rows"]
    out = {
        "n_docs": N_DOCS,
        "low_cpus": low,
        "high_cpus": high,
        "low": lo,
        "high": hi,
        "speedup": {k: round(lo[k] / hi[k], 2) if hi[k] else None for k in stages},
        "efficiency": {
            k: round((lo[k] / hi[k]) / (high / low), 3) if hi[k] else None for k in stages
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
