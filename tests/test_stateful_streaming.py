"""applyInPandasWithState streaming dedup: batch parity, cross-batch
state persistence through the checkpointed state store, and the
keyed-state sharding invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.streaming.stateful import stateful_exact_dedup

SCHEMA = "url string, content_md5 string"


def _run_once(spark, src_dir: str, ckpt_dir: str, out_dir: str):
    """One availableNow pass; verdicts land in ``out_dir`` via a
    foreachBatch parquet-append sink (the memory sink cannot recover
    from a checkpoint, which the restart test needs)."""
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    verdicts = stateful_exact_dedup(stream)

    def sink(batch, _epoch):
        batch.write.mode("append").parquet(out_dir)

    q = (
        verdicts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_stateful_dedup_matches_batch_first_seen(spark, tmp_path):
    """Single micro-batch: verdicts equal the batch min-url-per-key
    rule, independent of row order/partitioning."""
    rows = [
        ("u3", "h1"), ("u1", "h1"), ("u2", "h1"),
        ("u9", "h2"),
        ("u5", "h3"), ("u4", "h3"),
    ]
    src = str(tmp_path / "src")
    _mk_batch(spark, rows).repartition(3).write.parquet(src)
    out = _run_once(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    got = {r["url"]: (r["is_duplicate"], r["canonical_url"]) for r in out.collect()}
    assert got == {
        "u1": (False, "u1"), "u2": (True, "u1"), "u3": (True, "u1"),
        "u9": (False, "u9"),
        "u4": (False, "u4"), "u5": (True, "u4"),
    }
    # exactly one non-duplicate per key — the batch-mode invariant
    per_key = out.groupBy("key").agg(
        F.sum(F.when(~F.col("is_duplicate"), 1).otherwise(0)).alias("n_keep")
    )
    assert all(r["n_keep"] == 1 for r in per_key.collect())


def test_stateful_dedup_state_survives_restart(spark, tmp_path):
    """Batch 2 re-sends h1 under a NEW smaller url after a query
    restart: the state store must remember batch 1's canonical and mark
    the newcomer duplicate (first-seen-wins across batches, not
    min-url-across-time)."""
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    _mk_batch(spark, [("u5", "h1"), ("u7", "h2")]).write.mode("append").parquet(src)
    out1 = _run_once(spark, src, ckpt, str(tmp_path / "out_b1"))
    assert {r["url"]: r["is_duplicate"] for r in out1.collect()} == {
        "u5": False, "u7": False,
    }

    # second batch: u1 < u5 but h1 was already claimed by u5
    _mk_batch(spark, [("u1", "h1"), ("u8", "h3")]).write.mode("append").parquet(src)
    out2 = _run_once(spark, src, ckpt, str(tmp_path / "out_b2"))
    got = {r["url"]: (r["is_duplicate"], r["canonical_url"], r["dup_rank"]) for r in out2.collect()}
    assert got == {"u1": (True, "u5", 1), "u8": (False, "u8", 0)}


def test_stateful_dedup_on_fingerprinted_pages(spark, small_pages, tmp_path):
    """End-to-end on the synthetic fixture: md5-keyed verdict stream
    equals the batch exact-dup rule (one keep per content hash, keeps
    == distinct hashes)."""
    pages = small_pages.select("url", F.md5("text").alias("content_md5"))
    src = str(tmp_path / "src3")
    pages.write.parquet(src)
    out = _run_once(spark, src, str(tmp_path / "ckpt3"), str(tmp_path / "out3"))
    n_rows = out.count()
    n_keeps = out.filter(~F.col("is_duplicate")).count()
    assert n_rows == pages.count()
    assert n_keeps == pages.select("content_md5").distinct().count()
    # canonical is the min url of each hash group (deterministic)
    want = {
        r["content_md5"]: r["m"]
        for r in pages.groupBy("content_md5").agg(F.min("url").alias("m")).collect()
    }
    got = {r["key"]: r["canonical_url"] for r in out.filter(~F.col("is_duplicate")).collect()}
    assert got == want


def test_stateful_dedup_requires_streaming_frame(spark):
    """Batch frames are rejected by Spark itself — pin the error so a
    refactor can't silently turn this into a batch op."""
    df = spark.createDataFrame([("u1", "h1")], SCHEMA)
    with pytest.raises(Exception):
        stateful_exact_dedup(df).collect()


# ---------------------------------------------------------------- near-dup

BAND_SCHEMA = "url string, band_idx int, band_hash int"


def _run_pairs(spark, src_dir: str, ckpt_dir: str, out_dir: str, cap: int = 400):
    from deduplicator_spark.streaming.stateful import stateful_near_dup_candidates

    stream = spark.readStream.schema(BAND_SCHEMA).parquet(src_dir)
    pairs = stateful_near_dup_candidates(stream, max_bucket=cap)

    def sink(batch, _epoch):
        batch.write.mode("append").parquet(out_dir)

    q = (
        pairs.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def test_streaming_candidates_match_batch_lsh(spark, small_pages, cfg, tmp_path):
    """One micro-batch of the banded 300-page fixture: the distinct
    streaming pair set equals the batch chain's verified-pair INPUT set
    (same buckets, cap unbinding) — i.e. every batch candidate pair is
    found by the stateful path and nothing else."""
    from deduplicator_spark.functions.fingerprints import make_fingerprint_udf
    from deduplicator_spark.operators.lsh import band_explode, candidate_pairs

    fp_udf = make_fingerprint_udf(cfg)
    fp = (
        small_pages.select("url", fp_udf("text").alias("f"))
        .select("url", "f.*")
        .localCheckpoint()
    )
    banded = band_explode(fp, cfg).localCheckpoint()

    src = str(tmp_path / "src")
    banded.write.parquet(src)
    out = _run_pairs(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"), cap=10_000)
    got = {
        (r["url_a"], r["url_b"])
        for r in out.select("url_a", "url_b").distinct().collect()
    }
    want_df, _ = candidate_pairs(banded, cfg)
    want = {(r["url_a"], r["url_b"]) for r in want_df.collect()}
    assert got == want


def test_streaming_candidates_pair_across_batches_once(spark, tmp_path):
    """Docs sharing a bucket across two micro-batches pair exactly once
    (state remembers batch 1's members; no recompute over history)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1 = [("a", 0, 7), ("b", 0, 7)]
    b2 = [("c", 0, 7), ("d", 1, 9)]
    spark.createDataFrame(b1, BAND_SCHEMA).write.mode("append").parquet(src)
    _run_pairs(spark, src, ckpt, out)
    spark.createDataFrame(b2, BAND_SCHEMA).write.mode("append").parquet(src)
    got = _run_pairs(spark, src, ckpt, out)
    pairs = sorted((r["url_a"], r["url_b"]) for r in got.collect())
    assert pairs == [("a", "b"), ("a", "c"), ("b", "c")]  # d is alone in its bucket


def test_streaming_candidates_cap_bounds_state(spark, tmp_path):
    """A hot bucket stops absorbing members at the cap: members beyond
    it still pair against the capped set but are not remembered."""
    src = str(tmp_path / "src")
    rows = [(f"u{i:02d}", 0, 5) for i in range(10)]
    spark.createDataFrame(rows, BAND_SCHEMA).write.parquet(src)
    got = _run_pairs(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"), cap=3
    )
    n = got.count()
    # first 3 form C(3,2)=3 pairs; each of the 7 overflow docs pairs
    # against the 3 remembered members only
    assert n == 3 + 7 * 3


def test_stateful_dedup_repeated_url_single_keep(spark, tmp_path):
    """A url repeated WITHIN the key's first batch is a duplicate of
    itself: exactly one keep, deterministic ranks over sorted urls
    (ADVICE r2 #2 — both copies used to be marked keep)."""
    rows = [("u1", "h1"), ("u1", "h1"), ("u2", "h1")]
    src = str(tmp_path / "src_rep")
    _mk_batch(spark, rows).repartition(2).write.parquet(src)
    out = _run_once(spark, src, str(tmp_path / "ckpt_rep"), str(tmp_path / "out_rep"))
    rs = sorted(
        ((r["url"], r["is_duplicate"], r["dup_rank"]) for r in out.collect()),
        key=lambda t: t[2],
    )
    assert rs == [("u1", False, 0), ("u1", True, 1), ("u2", True, 2)]
