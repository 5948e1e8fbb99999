#!/usr/bin/env python
"""Probe the substring verify stage's per-pair cost profile.

Computes the REAL candidate pairs (winnow anchors -> bucket join) for
the bench corpus, collects them with their texts, then times the
driver-side verify math single-threaded with per-phase attribution:

  - what fraction of candidate pairs fail min_len (negative pairs)?
  - how many binary-search probes does each class cost?
  - where does the time go (normalize / prefix hash / probes)?

This tells us whether a "probe L=min_len first" short-circuit pays.

Usage: [PROBE_N_DOCS=50000] python tools/substring_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from deduplicator_spark.config import DedupConfig  # noqa: E402
from deduplicator_spark.operators.buckets import bucket_pairs  # noqa: E402
from deduplicator_spark.operators.substring import (  # noqa: E402
    _ASideHasher,
    lcs_len_fast,
    make_winnow_udf,
)
from deduplicator_spark.session import build_session  # noqa: E402

CFG = DedupConfig()
N_DOCS = int(os.environ.get("PROBE_N_DOCS", "50000"))


def main() -> None:
    spark = build_session(app_name="substring-probe", master="local[16]")
    corpus = os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"), f"bench_pages_n{N_DOCS}_s{CFG.seed}_p96"
    )
    if not os.path.exists(corpus):
        from deduplicator_spark.sources.pages import synth_pages

        synth_pages(spark, N_DOCS, partitions=96).write.mode("overwrite").parquet(corpus)
    pages = spark.read.parquet(corpus)
    winnow = make_winnow_udf(CFG)
    anchors = (
        pages.select("url", "text")
        .select("url", F.explode(winnow(F.col("text"))).alias("anchor"))
        .dropDuplicates(["url", "anchor"])
    )
    cand, _ = bucket_pairs(anchors, ["anchor"], CFG.max_band_bucket, overcap="star")
    cand = cand.localCheckpoint()
    n_pairs = cand.count()
    texts = {
        r["url"]: r["text"] for r in pages.select("url", "text").toLocalIterator()
    }
    rows = cand.collect()
    spark.stop()

    min_len = CFG.substring_min_len
    norm = {}

    def get_norm(u):
        x = norm.get(u)
        if x is None:
            s = " ".join((texts[u] or "").lower().split())
            x = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
            norm[u] = x
        return x

    # group by url_a like the real stage
    by_a: dict[str, list[str]] = {}
    for r in rows:
        by_a.setdefault(r["url_a"], []).append(r["url_b"])

    t0 = time.time()
    n_pos = n_neg = 0
    lens = []
    for ua, partners in by_a.items():
        xa = get_norm(ua)
        st = _ASideHasher(xa)
        for ub in partners:
            xb = get_norm(ub)
            m = lcs_len_fast(xa, xb, st)
            if m is not None and m >= min_len:
                n_pos += 1
                lens.append(m)
            else:
                n_neg += 1
    wall = time.time() - t0

    out = {
        "n_docs": N_DOCS,
        "n_pairs": n_pairs,
        "n_groups": len(by_a),
        "n_pos": n_pos,
        "n_neg": n_neg,
        "single_thread_verify_s": round(wall, 2),
        "us_per_pair": round(1e6 * wall / max(1, n_pairs), 1),
        "matched_len_median": int(np.median(lens)) if lens else None,
        "partners_per_group_max": max(len(v) for v in by_a.values()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
