"""Surrogate-id encoding: projection fast path + dense fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.plans.chain import decode_pairs, encode_fp, encode_ids


def test_hash_path_is_projection(spark):
    docs = spark.createDataFrame([(f"u{i}",) for i in range(50)], "url string")
    ids, hash_ok = encode_ids(docs)
    assert hash_ok
    got = {r["url"]: r["nid"] for r in ids.collect()}
    want = {r["url"]: r["h"] for r in docs.select("url", F.xxhash64("url").alias("h")).collect()}
    assert got == want


def test_dense_fallback_ids_unique_and_joinable(spark, monkeypatch):
    """Force the collision branch: dense ids must be unique and the
    dictionary join must round-trip pairs back to urls."""
    import deduplicator_spark.plans.chain as chain

    docs = spark.createDataFrame([(f"u{i}",) for i in range(40)], "url string")

    real_xxhash64 = F.xxhash64
    monkeypatch.setattr(
        chain.F, "xxhash64", lambda c: (real_xxhash64(c) % F.lit(4)).cast("long")
    )
    try:
        ids, hash_ok = encode_ids(docs)
    finally:
        monkeypatch.undo()
    assert not hash_ok
    rows = ids.collect()
    nids = [r["nid"] for r in rows]
    assert len(set(nids)) == 40
    fp = encode_fp(docs.withColumn("x", F.lit(1)), ids, hash_ok=False)
    assert fp.count() == 40
    pairs = spark.createDataFrame(
        [(nids[0], nids[1])], "url_a long, url_b long"
    )
    back = decode_pairs(pairs, ids).collect()[0]
    assert {back["url_a"], back["url_b"]} == {rows[0]["url"], rows[1]["url"]}
