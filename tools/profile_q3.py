#!/usr/bin/env python
"""One-off profiler: break q3 (documents LSH chain at sf0.1) into
sub-stages and time each, plus Spark job counts, to localize the
r2 bench regression (VERDICT r2 'Next round' #1)."""
import os, sys, time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F
from deduplicator_spark.session import build_session
from deduplicator_spark.operators.lsh import band_explode, candidate_pairs, verify_pairs
from deduplicator_spark.config import DedupConfig

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = build_session(app_name="profile-q3", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
CFG = DedupConfig()

import __spark_entry__ as e

tracker = spark.sparkContext.statusTracker()

def jobs():
    return len(tracker.getJobIdsForGroup(None) or [])

def t(name, fn):
    j0 = len(spark.sparkContext.statusTracker().getActiveJobsIds() or [])
    t0 = time.monotonic()
    out = fn()
    print(f"{name:28s} {time.monotonic()-t0:7.2f}s", flush=True)
    return out

# warm-up: full q3 once
t("warmup_full_q3", lambda: e.q_minhash_near_dup_pairs(spark, sf_dir).count())

for rep in range(2):
    fp = t("fp_pass+localCheckpoint", lambda: e._docs_fp(spark, sf_dir).localCheckpoint())
    banded = band_explode(fp, CFG)
    pairs = t("candidate_pairs.count", lambda: (candidate_pairs(banded, CFG)[0]).localCheckpoint())
    t("verify_pairs.count", lambda: verify_pairs(pairs, fp, CFG).count())
    t("full_q3", lambda: e.q_minhash_near_dup_pairs(spark, sf_dir).count())

spark.stop()
