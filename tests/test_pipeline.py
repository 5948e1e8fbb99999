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
    # (checkpoints live under cfg=<id>/<input-sig>/<stage>)
    import glob
    import os

    for stage in ["near_pairs", "edges", "clusters", "actions"]:
        for p in glob.glob(os.path.join(work_dir, f"cfg={cfg.config_id}", "*", stage)):
            shutil.rmtree(p, ignore_errors=True)

    p2 = DedupPipeline(spark, cfg, work_dir=work_dir, run_id="t2b")
    out2 = p2.run(pages)
    sig2 = _df_fingerprint(out2["clusters"], ["url", "cluster_id"])
    assert (sig1["s"], sig1["n"]) == (sig2["s"], sig2["n"])
    # fingerprints stage must have been resumed, not recomputed
    assert any(m.stage == "resume:fingerprints" for m in p2.metrics)


def test_resume_keyed_by_input_identity(spark, small_pages, cfg, work_dir):
    """Re-running the same work_dir on DIFFERENT input must recompute,
    not silently reload the old corpus's checkpoints (ADVICE r1)."""
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    out1 = DedupPipeline(spark, cfg, work_dir=work_dir, run_id="i1").run(pages)
    n1 = out1["fingerprints"].count()

    smaller = pages.limit(100)
    p2 = DedupPipeline(spark, cfg, work_dir=work_dir, run_id="i2")
    out2 = p2.run(smaller)
    assert out2["fingerprints"].count() == 100 != n1
    # nothing was resumed from the other input's namespace
    assert not any(m.stage.startswith("resume:") for m in p2.metrics)


def test_recompute_verify_shape_equivalent(spark, small_pages, cfg):
    """store_shingles=False (signatures only + candidate-side shingle
    recompute) must cluster identically to the stored-shingles path,
    and its fingerprint checkpoint must carry NO shingle arrays."""
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    out_a = DedupPipeline(spark, cfg, run_id="vs1").run(pages)
    out_b = DedupPipeline(spark, cfg, run_id="vs2").run(pages, store_shingles=False)
    sig_a = _df_fingerprint(out_a["clusters"], ["url", "cluster_id"])
    sig_b = _df_fingerprint(out_b["clusters"], ["url", "cluster_id"])
    assert (sig_a["s"], sig_a["n"]) == (sig_b["s"], sig_b["n"])
    assert out_b["fingerprints"].filter(F.col("shingles").isNotNull()).count() == 0


def test_pipeline_from_raw_html(spark, small_pages, cfg):
    """S4 decode source: the pipeline ingesting ONLY raw html (text
    derived in-pipeline) produces the same clusters as trusting the
    upstream text column."""
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    out_t = DedupPipeline(spark, cfg, run_id="h1").run(pages)
    out_h = DedupPipeline(spark, cfg, run_id="h2").run(
        pages.drop("text"), extract_text_from_html=True
    )
    sig_t = _df_fingerprint(out_t["clusters"], ["url", "cluster_id"])
    sig_h = _df_fingerprint(out_h["clusters"], ["url", "cluster_id"])
    assert (sig_t["s"], sig_t["n"]) == (sig_h["s"], sig_h["n"])


def test_pipeline_with_substring_pass(spark, small_pages, cfg):
    """include_substring=True runs end-to-end on the long surrogate-id
    path (ADVICE r1 high: the fixed string VERIFY_SCHEMA crashed Arrow
    serialization on nid-keyed input) and its pairs land in the edges."""
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    out = DedupPipeline(spark, cfg, run_id="t4").run(pages, include_substring=True)
    subs = out["substring_pairs"]
    assert subs.count() > 0
    # decoded pairs carry the original url strings
    row = subs.first()
    assert isinstance(row["url_a"], str) and row["url_a"].startswith("https://")
    # planted substring-kind docs must co-cluster with their container
    joined = out["clusters"].join(
        small_pages.select("url", "truth_cluster_id", "dup_kind"), "url"
    )
    split_sub = (
        joined.filter("dup_kind = 'substring'")
        .groupBy("truth_cluster_id")
        .agg(F.count_distinct("cluster_id").alias("nc"))
        .filter("nc > 1")
        .count()
    )
    assert split_sub == 0


def test_pipeline_input_order_invariance(spark, small_pages, cfg):
    pages = small_pages.select("url", "warc_ts", "html", "text", "lang")
    out_a = DedupPipeline(spark, cfg, run_id="t3a").run(pages)
    out_b = DedupPipeline(spark, cfg, run_id="t3b").run(
        pages.orderBy(F.reverse(F.col("url")))
    )
    sig_a = _df_fingerprint(out_a["clusters"], ["url", "cluster_id"])
    sig_b = _df_fingerprint(out_b["clusters"], ["url", "cluster_id"])
    assert (sig_a["s"], sig_a["n"]) == (sig_b["s"], sig_b["n"])


def test_pair_metrics_degenerate_zero_pairs_defined(spark):
    """0 predicted / 0 truth pairs must yield 0.0 ratios, not NULL
    (ADVICE r2 #5)."""
    from deduplicator_spark.operators.evaluate import pair_metrics

    # all-singleton prediction AND truth: every denominator is 0
    pred = spark.createDataFrame([("a", "c1"), ("b", "c2")], "url string, cluster_id string")
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t2")], "url string, truth_cluster_id string"
    )
    row = pair_metrics(pred, truth).collect()[0]
    assert (row["precision"], row["recall"], row["f1"]) == (0.0, 0.0, 0.0)
