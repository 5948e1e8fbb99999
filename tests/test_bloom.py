"""Relational Bloom filter (functions/bloom.py): membership contract,
bounded bitmap, and partition-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.functions.bloom import bloom_build, bloom_probe

M, K = 1 << 14, 5


def test_no_false_negatives_and_bounded_bitmap(spark):
    seen = spark.range(500).select(F.concat(F.lit("k"), "id").alias("key"))
    bloom = bloom_build(seen, "key", M, K)
    assert bloom.count() <= (M + 59) // 60
    out = bloom_probe(seen, bloom, "key", M, K)
    assert out.filter(~F.col("maybe_member")).count() == 0  # NEVER a false negative


def test_unseen_keys_mostly_miss(spark):
    seen = spark.range(500).select(F.concat(F.lit("k"), "id").alias("key"))
    bloom = bloom_build(seen, "key", M, K)
    novel = spark.range(500).select(F.concat(F.lit("unseen-"), "id").alias("key"))
    fp = bloom_probe(novel, bloom, "key", M, K).filter("maybe_member").count()
    # 500 keys * 5 bits in 2^14 bits -> expected FP rate ~ (0.14)^5 ~ 6e-5
    assert fp <= 2


def test_probe_is_partition_invariant_and_dedupes(spark):
    seen = spark.range(100).select(F.concat(F.lit("k"), "id").alias("key"))
    bloom = bloom_build(seen, "key", M, K)
    # duplicate probe rows must not break the all-k-bits check
    probes = seen.unionByName(seen).repartition(7)
    out = bloom_probe(probes, bloom, "key", M, K)
    assert out.count() == 100
    assert out.filter(~F.col("maybe_member")).count() == 0
