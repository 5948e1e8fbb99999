#!/usr/bin/env python
"""Interleaved A/B: unpruned vs candidate-pruned verify, same session.

"old" inlines the pre-prune shapes (every doc's signature/shingle
array crosses the join exchanges); "new" is the current
verify_pairs_two_stage (both sides semi-joined to the candidate-url
set first).  Full chain timed per variant, ABAB medians.

Usage: python tools/verify_ab.py [cpus] [rounds]
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

from bench_scaling import CFG, corpus_path, N_DOCS  # noqa: E402
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf  # noqa: E402
from deduplicator_spark.operators.components import clusters_from_pairs  # noqa: E402
from deduplicator_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    verify_pairs_two_stage,
)
from deduplicator_spark.plans.chain import decode_clusters, encode_fp, encode_ids  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402


def old_verify_two_stage(pairs, fp, cfg):
    sig = fp.select("url", "minhash")
    p = (
        pairs.join(sig.withColumnsRenamed({"url": "url_a", "minhash": "sig_a"}), "url_a")
        .join(sig.withColumnsRenamed({"url": "url_b", "minhash": "sig_b"}), "url_b")
    )
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = p.withColumn("est_jaccard", agree / F.lit(cfg.num_perm)).drop("sig_a", "sig_b")
    survivors = est.filter(F.col("est_jaccard") >= cfg.est_jaccard_prefilter).select(
        "url_a", "url_b"
    )
    sh = fp.filter(F.col("n_shingles") > 0).select("url", "shingles")
    p2 = (
        survivors.join(sh.withColumnsRenamed({"url": "url_a", "shingles": "sh_a"}), "url_a")
        .join(sh.withColumnsRenamed({"url": "url_b", "shingles": "sh_b"}), "url_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        p2.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= cfg.verify_jaccard)
        .select("url_a", "url_b", "jaccard")
    )


def chain(spark, corpus, verify_fn) -> int:
    fp_udf = make_fingerprint_udf(CFG)
    pages = spark.read.parquet(corpus)
    fp = (
        pages.select("url", fp_udf(F.col("text")).alias("f"))
        .select("url", "f.*")
        .localCheckpoint()
    )
    dict_ids, hash_ok = encode_ids(fp)
    fp_n = encode_fp(fp, dict_ids, hash_ok)
    banded = band_explode(fp_n, CFG)
    pairs, _ = candidate_pairs(banded, CFG)
    verified = verify_fn(pairs, fp_n, CFG)
    clusters = decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids)
    return clusters.count()


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
        app_name=f"verify-ab-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_path()
    rows_new = chain(spark, corpus, verify_pairs_two_stage)  # warm-up
    rows_old = chain(spark, corpus, old_verify_two_stage)
    assert rows_new == rows_old, (rows_new, rows_old)

    samples: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(rounds):
        for label, fn in (("old", old_verify_two_stage), ("new", verify_pairs_two_stage)):
            t0 = time.monotonic()
            chain(spark, corpus, fn)
            samples[label].append(round(time.monotonic() - t0, 2))
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": N_DOCS,
                "clustered_rows": rows_new,
                "samples": samples,
                "median": {k: statistics.median(v) for k, v in samples.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
