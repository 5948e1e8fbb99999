"""End-to-end pipeline: correctness vs truth, resume identity, metrics."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.plans.pipeline import DedupPipeline


@pytest.fixture()
def work_dir(tmp_path):
    d = str(tmp_path / "work")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df_fingerprint(df, cols):
    """Order-insensitive content digest of selected columns."""
    return (
        df.select(*cols)
        .withColumn("h", F.hash(*cols))
        .agg(F.sum("h").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )


def test_pipeline_end_to_end(spark, small_pages, cfg, work_dir):
    pipe = DedupPipeline(spark, cfg, work_dir=work_dir, run_id="t1")
    out = pipe.run(small_pages.select("url", "warc_ts", "html", "text", "lang"))

    # quarantine holds exactly the degenerate docs
    deg_urls = {r["url"] for r in small_pages.filter("dup_kind = 'degenerate'").collect()}
    q_urls = {r["url"] for r in out["quarantine"].collect()}
    assert q_urls == deg_urls

    # every planted exact cluster ends in one pipeline cluster
    joined = out["clusters"].join(
        small_pages.select("url", "truth_cluster_id", "dup_kind"), "url"
    )
    split_exact = (
        joined.filter("dup_kind = 'exact'")
        .groupBy("truth_cluster_id")
        .agg(F.count_distinct("cluster_id").alias("nc"))
        .filter("nc > 1")
        .count()
    )
    assert split_exact == 0

    # actions: exactly one keep per cluster, rest delete
    per_cluster = out["actions"].groupBy("cluster_id").agg(
        F.sum(F.when(F.col("op") == "keep", 1).otherwise(0)).alias("keeps"),
        F.count("*").alias("n"),
    )
    assert per_cluster.filter("keeps != 1").count() == 0
    assert per_cluster.filter("n < 2").count() == 0  # min_cluster_size=2

    # metrics recorded for every stage
    stages = {m.stage for m in pipe.metrics}
    assert {"fingerprints", "near_pairs", "exact_pairs", "edges", "clusters", "actions"} <= stages


def test_pipeline_resume_identical(spark, small_pages, cfg, work_dir):
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    p1 = DedupPipeline(spark, cfg, work_dir=work_dir, run_id="t2a")
    out1 = p1.run(pages)
    sig1 = _df_fingerprint(out1["clusters"], ["url", "cluster_id"])

    # simulate mid-pipeline crash: wipe everything after fingerprints
    import os

    base = os.path.join(work_dir, f"cfg={cfg.config_id}")
    for stage in ["near_pairs", "edges", "clusters", "actions"]:
        shutil.rmtree(os.path.join(base, stage), ignore_errors=True)

    p2 = DedupPipeline(spark, cfg, work_dir=work_dir, run_id="t2b")
    out2 = p2.run(pages)
    sig2 = _df_fingerprint(out2["clusters"], ["url", "cluster_id"])
    assert (sig1["s"], sig1["n"]) == (sig2["s"], sig2["n"])
    # fingerprints stage must have been resumed, not recomputed
    assert any(m.stage == "resume:fingerprints" for m in p2.metrics)


def test_pipeline_input_order_invariance(spark, small_pages, cfg):
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    out_a = DedupPipeline(spark, cfg, run_id="t3a").run(pages)
    out_b = DedupPipeline(spark, cfg, run_id="t3b").run(
        pages.orderBy(F.reverse(F.col("url")))
    )
    sig_a = _df_fingerprint(out_a["clusters"], ["url", "cluster_id"])
    sig_b = _df_fingerprint(out_b["clusters"], ["url", "cluster_id"])
    assert (sig_a["s"], sig_a["n"]) == (sig_b["s"], sig_b["n"])
