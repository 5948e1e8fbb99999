"""Pin the Spark-job count of the flagship dedup chain.

Per-job overhead is the measured scaling floor of the chain on a
single box (tools/stage_ladder.py: encode_ids / verify / cc_decode run
at ~0.25-0.34 efficiency because their wall time is mostly fixed
per-action cost, not compute), and on a real cluster every job is a
scheduler round-trip plus an AQE re-plan.  These tests count the jobs
an end-to-end run launches via the status tracker and fail if a change
sneaks in extra materializing actions (the r3 regression was exactly
that: a candidate-url semi-join probe re-executing the lazy pairs
subtree, plus caller-side re-checkpoints of the id dictionary).

The ceilings are deliberately loose (~1.5x observed) so AQE's
stage-materializing sub-jobs and minor plan changes don't flake them;
they exist to catch order-of-magnitude job-count creep, not exact
counts.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from deduplicator_spark.functions.fingerprints import make_fingerprint_udf
from deduplicator_spark.operators.components import clusters_from_pairs
from deduplicator_spark.operators.lsh import (
    band_explode,
    candidate_pairs,
    verify_pairs_two_stage,
)
from deduplicator_spark.plans.chain import decode_clusters, encode_fp, encode_ids


def _job_count(spark, fn) -> int:
    """Count jobs launched by ``fn`` inside a UNIQUE job group.

    The old before/after diff of ``getJobIdsForGroup(None)`` only saw
    default-group jobs and was capped by ``spark.ui.retainedJobs`` —
    in a long test session eviction shrinks before/after unevenly and
    the ceiling silently stops catching regressions (ADVICE r3).  A
    fresh group gives an absolute count: the measured call launches
    far fewer jobs than the retention cap (default 1000), and they
    are the newest jobs so none are evicted before we read."""
    sc = spark.sparkContext
    group = f"jobcount-{uuid.uuid4().hex}"
    sc.setJobGroup(group, "job-count measurement")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def _chain(spark, cfg, pages):
    fp_udf = make_fingerprint_udf(cfg)
    fp = (
        pages.select("url", fp_udf(F.col("text")).alias("f"))
        .select("url", "f.*")
        .localCheckpoint()
    )
    dict_ids, hash_ok = encode_ids(fp)
    fp_n = encode_fp(fp, dict_ids, hash_ok)
    banded = band_explode(fp_n, cfg)
    pairs, _ = candidate_pairs(banded, cfg)
    verified = verify_pairs_two_stage(pairs, fp_n, cfg)
    return decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids).count()


def test_chain_job_count_bounded(spark, cfg, small_pages):
    # warm-up run (AQE/codegen warm, and the job mix stabilizes)
    _chain(spark, cfg, small_pages)
    n_jobs = _job_count(spark, lambda: _chain(spark, cfg, small_pages))
    # observed ~12-20 jobs with AQE sub-jobs at 300 docs (fp checkpoint,
    # id-dict materialize + collision check, CC rounds, final count);
    # pre-fix regressions pushed this past 30.  The broadcast-shaped
    # verify (lsh.py verify_pairs_two_stage) deliberately adds ~7 more:
    # one pair-count job (which picks the join strategy from a MEASURED
    # size) plus broadcast-build jobs for the id-only pair/candidate
    # frames.  Those are tiny scheduler round-trips bought to remove
    # the corpus-wide signature/shingle array exchanges (~70% of the
    # chain's shuffle bytes at 200k docs, tools/profile_e2e.py) — and
    # every build side is bounded by cfg.broadcast_pairs_rows, so the
    # extra jobs stay O(1) as the corpus grows.  Observed 35 post-
    # change; ceiling keeps the same ~1.3x slack.
    assert n_jobs <= 45, f"flagship chain launched {n_jobs} jobs (ceiling 45)"


def test_cc_job_count_scales_with_rounds_not_edges(spark):
    # a simple pair graph: CC should converge in ONE counted round
    # (labels are seeded with the neighbor-min propagation).  The sym
    # materialize+size count — which sizes the loop's shuffle width to
    # the graph, one action that removes ~5/6 of the loop's tasks —
    # now runs WITH AQE on (so the caller's upstream verify subtree
    # gets runtime broadcast/coalesce; components.py), and AQE splits
    # its distinct() into per-shuffle-stage sub-jobs: 9 observed vs 3
    # under the old AQE-off count.  Ceiling covers one more round of
    # AQE noise; the point stays that jobs scale with CC ROUNDS, not
    # edges.
    edges = spark.createDataFrame(
        [(f"u{i:03d}", f"v{i:03d}") for i in range(50)], ["url_a", "url_b"]
    )
    clusters_from_pairs(edges, min_size=2).count()  # warm-up
    n_jobs = _job_count(
        spark, lambda: clusters_from_pairs(edges, min_size=2).count()
    )
    assert n_jobs <= 12, f"pair-graph CC launched {n_jobs} jobs (ceiling 12)"
