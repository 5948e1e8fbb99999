"""bucket_pairs: full expansion under cap, sampled ring over cap."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from deduplicator_spark.operators.buckets import bucket_pairs


def _keyed(spark, buckets):
    rows = [(k, u) for k, urls in buckets.items() for u in urls]
    return spark.createDataFrame(rows, "band string, url string")


def test_small_buckets_full_pairs(spark):
    keyed = _keyed(spark, {"b1": ["a", "b", "c"], "b2": ["x", "y"], "b3": ["solo"]})
    pairs, overflow = bucket_pairs(keyed, ["band"], cap=10)
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")}
    assert overflow.count() == 0


def test_identical_buckets_collapse(spark):
    keyed = _keyed(spark, {"b1": ["a", "b", "c"], "b2": ["a", "b", "c"]})
    pairs, _ = bucket_pairs(keyed, ["band"], cap=10)
    assert pairs.count() == 3


def test_over_cap_ring_sampling(spark):
    members = [f"u{i:03d}" for i in range(40)]
    keyed = _keyed(spark, {"hot": members, "cold": ["p", "q"]})
    pairs, overflow = bucket_pairs(keyed, ["band"], cap=10, ring_k=3)
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    # cold bucket unaffected
    assert ("p", "q") in got
    # hot bucket: each member pairs with next <=3 successors, never full clique
    hot_pairs = {p for p in got if p[0].startswith("u")}
    expected = {
        (members[i], members[j])
        for i in range(40)
        for j in range(i + 1, min(i + 4, 40))
    }
    assert hot_pairs == expected
    assert len(hot_pairs) < len(list(combinations(members, 2)))
    # audited, not silent
    ov = overflow.collect()
    assert len(ov) == 1 and ov[0]["bucket_size"] == 40


def test_simhash_mega_cluster_is_capped(spark, cfg):
    """A 5k-member identical-simhash cluster must produce a bounded
    pair count plus an overflow audit, not a 12.5M-pair clique
    (VERDICT r1 'What's wrong' #4)."""
    from deduplicator_spark.operators.lsh import simhash_pairs

    n = 5000
    fp = spark.range(n).select(
        F.format_string("u%05d", F.col("id")).alias("url"),
        F.lit(0x1234_5678_9ABC_DEF0).alias("simhash"),
    )
    pairs, overflow = simhash_pairs(fp, cfg, max_bucket=500)
    n_pairs = pairs.count()
    # sampled ring: <= ring_k * n edges, far below the 12.5M clique
    assert 0 < n_pairs <= 8 * n
    ov = overflow.collect()
    assert len(ov) >= 1 and all(o["bucket_size"] == n for o in ov)
    # all surviving pairs are true (hamming 0)
    assert pairs.filter(F.col("hamming") != 0).count() == 0


def test_ring_keeps_bucket_connected(spark):
    """Union-find over the ring edges spans the whole bucket."""
    members = [f"m{i:02d}" for i in range(25)]
    keyed = _keyed(spark, {"hot": members})
    pairs, _ = bucket_pairs(keyed, ["band"], cap=5, ring_k=2)
    parent = {m: m for m in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        parent[find(r["url_a"])] = find(r["url_b"])
    assert len({find(m) for m in members}) == 1


def test_overcap_star_covers_every_member(spark):
    """overcap='star' (coverage consumers: span/substring rewrite) —
    every member of an over-cap bucket pairs with the sorted min-url
    prefix, so no doc silently misses a partner (ADVICE r2 #1)."""
    members = [f"u{i:03d}" for i in range(40)]
    keyed = _keyed(spark, {"hot": members, "cold": ["p", "q"]})
    pairs, overflow = bucket_pairs(keyed, ["band"], cap=10, ring_k=3, overcap="star")
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert ("p", "q") in got
    hot = {p for p in got if p[0].startswith("u")}
    prefix = set(members[:3])
    # every member appears in at least one hot pair
    covered = {u for p in hot for u in p}
    assert covered == set(members)
    # and every hot pair touches the prefix
    assert all(a in prefix or b in prefix for a, b in hot)
    assert overflow.count() == 1


def test_mega_bucket_never_builds_member_array(spark):
    """A 200k-member bucket (far over cap) completes with bounded pair
    count — the over-cap path works from row_number positions, never a
    collected member array (VERDICT r2 'What's wrong' #2)."""
    n = 200_000
    keyed = spark.range(n).select(
        F.lit("hot").alias("band"), F.format_string("u%06d", F.col("id")).alias("url")
    )
    pairs, overflow = bucket_pairs(keyed, ["band"], cap=100, ring_k=2)
    n_pairs = pairs.count()
    assert 0 < n_pairs <= 2 * n
    ov = overflow.collect()
    assert len(ov) == 1 and ov[0]["bucket_size"] == n
