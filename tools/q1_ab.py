#!/usr/bin/env python
"""Interleaved A/B of bench.py's q1 variants (VERDICT r3 #5: q1 median
drifted 27.8 -> 32.4 s between rounds with tight samples; suspects are
the bucket-pin localCheckpoint added in r3 (buckets.py pin_keyed) and
the parquet fingerprint checkpoint).

Variants, all producing identical clusters (asserted):
  head      — bench.py q1 exactly (parquet fp ckpt, pin_keyed=True)
  nopin     — pin_keyed=False (keyed band frame recomputed per pass)
  localck   — fingerprint checkpoint via localCheckpoint, pin_keyed=True

Protocol: one warm-up of each, then ABC ABC ... interleaved rounds so
host-load drift hits every variant equally.  Prints one JSON line.

Usage: [AB_RUNS=4] [AB_CPUS=32] [AB_N_DOCS=50000] python tools/q1_ab.py
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

from deduplicator_spark.config import DedupConfig  # noqa: E402
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf  # noqa: E402
from deduplicator_spark.operators.buckets import bucket_pairs  # noqa: E402
from deduplicator_spark.operators.components import clusters_from_pairs  # noqa: E402
from deduplicator_spark.operators.lsh import band_explode, verify_pairs_two_stage  # noqa: E402
from deduplicator_spark.plans.chain import (  # noqa: E402
    checkpoint_parquet,
    decode_clusters,
    encode_fp,
    encode_ids,
)
from deduplicator_spark.session import build_session  # noqa: E402

CFG = DedupConfig()
RUNS = int(os.environ.get("AB_RUNS", "4"))
CPUS = int(os.environ.get("AB_CPUS", "32"))
N_DOCS = int(os.environ.get("AB_N_DOCS", "50000"))


def chain(spark, corpus: str, fp_ckpt: str, pin_keyed: bool) -> int:
    fp_udf = make_fingerprint_udf(CFG)
    pages = spark.read.parquet(corpus)
    fp = pages.select("url", fp_udf(F.col("text")).alias("f")).select("url", "f.*")
    if fp_ckpt == "parquet":
        fp = checkpoint_parquet(fp, "q1ab_fp")
    else:
        fp = fp.localCheckpoint()
    dict_ids, hash_ok = encode_ids(fp)
    fp_n = encode_fp(fp, dict_ids, hash_ok)
    banded = band_explode(fp_n, CFG)
    pairs, _ = bucket_pairs(
        banded, ["band_idx", "band_hash"], CFG.max_band_bucket, pin_keyed=pin_keyed
    )
    verified = verify_pairs_two_stage(pairs, fp_n, CFG)
    return decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids).count()


VARIANTS = {
    "head": dict(fp_ckpt="parquet", pin_keyed=True),
    "nopin": dict(fp_ckpt="parquet", pin_keyed=False),
    "localck": dict(fp_ckpt="local", pin_keyed=True),
}


def main() -> None:
    from bench import ensure_corpus  # reuse the bench corpus exactly

    spark = build_session(
        app_name="q1-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_corpus(spark, N_DOCS)

    rows = {k: chain(spark, corpus, **v) for k, v in VARIANTS.items()}  # warm-up
    assert len(set(rows.values())) == 1, f"variants disagree: {rows}"

    samples: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for _ in range(RUNS):
        for name, kv in VARIANTS.items():
            t0 = time.monotonic()
            chain(spark, corpus, **kv)
            samples[name].append(round(time.monotonic() - t0, 2))
    out = {
        "metric": "q1_variant_ab",
        "n_docs": N_DOCS,
        "cpus": CPUS,
        "clustered_rows": rows["head"],
        "medians": {k: statistics.median(v) for k, v in samples.items()},
        "runs": samples,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
