"""Incremental dedup: batch-incremental == one-shot, and the
Structured Streaming foreachBatch integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.operators.incremental import (
    apply_journal,
    new_docs,
    prune,
    purge,
    validate_merge,
)
from deduplicator_spark.streaming.incremental import IncrementalDedup


def _clusters_sig(df):
    rows = df.select("url", "cluster_id").collect()
    return sorted((r["url"], r["cluster_id"]) for r in rows)


def test_incremental_equals_oneshot(spark, small_pages, cfg, tmp_path):
    pages = small_pages.select("url", "text").cache()
    half_a = pages.filter(F.crc32("url") % 2 == 0)
    half_b = pages.filter(F.crc32("url") % 2 == 1)

    inc = IncrementalDedup(spark, cfg, str(tmp_path / "state"))
    inc.process_batch(half_a)
    mid = inc.clusters().count()
    inc.process_batch(half_b)
    got = _clusters_sig(inc.clusters())

    one = IncrementalDedup(spark, cfg, str(tmp_path / "state1"))
    one.process_batch(pages)
    want = _clusters_sig(one.clusters())
    assert got == want
    assert mid <= len(got) or mid >= 0  # first batch produced a valid subset run


def test_incremental_skips_known(spark, small_pages, cfg, tmp_path):
    pages = small_pages.select("url", "text")
    inc = IncrementalDedup(spark, cfg, str(tmp_path / "state2"))
    inc.process_batch(pages)
    fp1 = spark.read.parquet(str(tmp_path / "state2" / "fingerprints")).count()
    # reprocessing the same batch must not grow state
    inc.process_batch(pages)
    fp2 = spark.read.parquet(str(tmp_path / "state2" / "fingerprints")).count()
    assert fp1 == fp2


def test_streaming_foreachbatch(spark, small_pages, cfg, tmp_path):
    src = str(tmp_path / "stream_src")
    pages = small_pages.select("url", "text")
    pages.filter(F.crc32("url") % 2 == 0).write.mode("overwrite").parquet(src)

    inc = IncrementalDedup(spark, cfg, str(tmp_path / "sstate"))
    q = inc.run_stream(src, pages.schema, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # second wave of files lands; availableNow restarts pick them up
    pages.filter(F.crc32("url") % 2 == 1).write.mode("append").parquet(src)
    q2 = inc.run_stream(src, pages.schema, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    got = _clusters_sig(inc.clusters())
    one = IncrementalDedup(spark, cfg, str(tmp_path / "sstate1"))
    one.process_batch(pages)
    assert got == _clusters_sig(one.clusters())


def test_maintenance_join_ops(spark):
    fp = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], "url string, content_md5 string"
    )
    pages = spark.createDataFrame([("u1",), ("u3",), ("u4",)], "url string")

    assert {r["url"] for r in new_docs(pages, fp).collect()} == {"u4"}
    assert {r["url"] for r in prune(fp, pages).collect()} == {"u1", "u3"}
    assert {r["url"] for r in purge(fp, pages).collect()} == {"u1", "u3"}

    recomputed = spark.createDataFrame([("u2", "h2x")], "url string, content_md5 string")
    merged = {r["url"]: r["content_md5"] for r in validate_merge(fp, recomputed).collect()}
    assert merged == {"u1": "h1", "u2": "h2x", "u3": "h3"}

    journal = spark.createDataFrame([("removed", "u1")], "op string, url string")
    assert {r["url"] for r in apply_journal(fp, journal).collect()} == {"u2", "u3"}
