#!/usr/bin/env python
"""Interleaved A/B: fingerprint checkpoint as localCheckpoint (row
store, no column pruning) vs parquet-on-tmpfs (columnar, pruned reads).

The chain references the fingerprint frame ~6 times (banding, est join
x2, exact verify x2, id encode); a row-store checkpoint re-reads the
KB-scale shingle arrays on every reference, a parquet checkpoint lets
each reference read only the columns it needs — the same trade the
durable pipeline path already makes.  Full dedup chain timed per
variant, ABAB medians, one session.

Usage: python tools/fp_checkpoint_ab.py [cpus] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from bench_scaling import CFG, N_DOCS, corpus_path  # noqa: E402
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf  # noqa: E402
from deduplicator_spark.operators.components import clusters_from_pairs  # noqa: E402
from deduplicator_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    verify_pairs_two_stage,
)
from deduplicator_spark.plans.chain import decode_clusters, encode_fp, encode_ids  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402

PARQUET_DIR = "/dev/shm/fp_ckpt_ab"


def chain_from(fp, dict_ids, hash_ok):
    fp_n = encode_fp(fp, dict_ids, hash_ok)
    banded = band_explode(fp_n, CFG)
    pairs, _ = candidate_pairs(banded, CFG)
    verified = verify_pairs_two_stage(pairs, fp_n, CFG)
    return decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids).count()


def job_rowstore(spark, corpus):
    fp_udf = make_fingerprint_udf(CFG)
    pages = spark.read.parquet(corpus)
    fp = (
        pages.select("url", fp_udf(F.col("text")).alias("f"))
        .select("url", "f.*")
        .localCheckpoint()
    )
    dict_ids, hash_ok = encode_ids(fp)
    return chain_from(fp, dict_ids, hash_ok)


def job_parquet(spark, corpus):
    fp_udf = make_fingerprint_udf(CFG)
    pages = spark.read.parquet(corpus)
    (
        pages.select("url", fp_udf(F.col("text")).alias("f"))
        .select("url", "f.*")
        .write.mode("overwrite")
        .parquet(PARQUET_DIR)
    )
    fp = spark.read.parquet(PARQUET_DIR)
    dict_ids, hash_ok = encode_ids(fp)
    return chain_from(fp, dict_ids, hash_ok)


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
        app_name=f"fp-ckpt-ab-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_path()
    a = job_rowstore(spark, corpus)  # warm-up both paths
    b = job_parquet(spark, corpus)
    assert a == b, (a, b)

    samples: dict[str, list[float]] = {"rowstore": [], "parquet": []}
    for _ in range(rounds):
        for label, fn in (("rowstore", job_rowstore), ("parquet", job_parquet)):
            t0 = time.monotonic()
            fn(spark, corpus)
            samples[label].append(round(time.monotonic() - t0, 2))
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": N_DOCS,
                "clustered_rows": a,
                "samples": samples,
                "median": {k: statistics.median(v) for k, v in samples.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
