"""End-to-end near-dup chain: LSH recall vs brute force, components, exact."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.functions.fingerprints import make_fingerprint_udf, shingle_set_py
from deduplicator_spark.operators.components import clusters_from_pairs, connected_components
from deduplicator_spark.operators.exact import exact_clusters, exact_dup_pairs
from deduplicator_spark.operators.lsh import (
    band_explode,
    candidate_pairs,
    estimate_jaccard,
    simhash_pairs,
    verify_pairs,
)


@pytest.fixture(scope="module")
def fp_df(spark, small_pages, cfg):
    fp = make_fingerprint_udf(cfg)
    df = small_pages.select("url", "text", fp(F.col("text")).alias("f")).select(
        "url", "text", "f.*"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def brute_force_pairs(small_pages, cfg):
    """Oracle: exact shingle Jaccard >= threshold over all O(n^2) pairs."""
    rows = small_pages.select("url", "text").collect()
    sets = {r["url"]: shingle_set_py(r["text"], cfg.shingle_k) for r in rows}
    truth = set()
    for (ua, sa), (ub, sb) in combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= cfg.verify_jaccard:
            truth.add((min(ua, ub), max(ua, ub)))
    return truth


def test_exact_dedup_matches_truth(small_pages):
    clusters = exact_clusters(small_pages)
    got = {
        (r["content_md5"], r["cluster_size"])
        for r in clusters.select("content_md5", "cluster_size").distinct().collect()
    }
    # every exact-kind truth cluster must be one md5 bucket of its size
    exact_truth = (
        small_pages.filter(F.col("dup_kind") == "exact")
        .groupBy("truth_cluster_id")
        .agg(F.first("text").alias("text"), F.count("*").alias("n"))
        .collect()
    )
    import hashlib

    for r in exact_truth:
        md5 = hashlib.md5(r["text"].encode()).hexdigest()
        assert any(m == md5 and s >= r["n"] for m, s in got)


def test_exact_pairs_symmetric_form(small_pages):
    pairs = exact_dup_pairs(small_pages)
    bad = pairs.filter(F.col("url_a") >= F.col("url_b")).count()
    assert bad == 0
    assert pairs.count() > 0


def test_lsh_recall_vs_brute_force(fp_df, brute_force_pairs, cfg):
    """The north-rule acceptance bar: dup-pair recall >= 0.99."""
    banded = band_explode(fp_df, cfg)
    pairs, overflow = candidate_pairs(banded, cfg)
    verified = verify_pairs(pairs, fp_df, cfg)
    got = {(r["url_a"], r["url_b"]) for r in verified.collect()}

    assert len(brute_force_pairs) > 50, "fixture must plant enough true pairs"
    missed = brute_force_pairs - got
    recall = 1 - len(missed) / len(brute_force_pairs)
    assert recall >= 0.99, f"recall {recall}: missed {list(missed)[:5]}"
    # precision: every verified pair must be a true pair (exact verify => 1.0)
    false_pos = got - brute_force_pairs
    assert not false_pos, f"false positives: {list(false_pos)[:5]}"
    assert overflow.count() == 0  # 300-doc fixture has no bucket > cap


def test_est_jaccard_close_to_exact(fp_df, cfg):
    banded = band_explode(fp_df, cfg)
    pairs, _ = candidate_pairs(banded, cfg)
    est = estimate_jaccard(pairs, fp_df, cfg)
    ver = verify_pairs(pairs, fp_df, cfg).withColumnRenamed("jaccard", "exact_j")
    joined = est.join(ver, ["url_a", "url_b"]).collect()
    assert joined
    for r in joined:
        assert abs(r["est_jaccard"] - r["exact_j"]) < 0.15


def test_simhash_block_join_mechanism(spark, cfg):
    """Pigeonhole block join finds exactly the pairs within hamming<=d.

    (Physics note: on short docs SimHash is noisy — 60-token docs at
    Jaccard 0.8 measure hamming 7-19 — so the d=3 Manku-style stage
    targets near-identical docs; MinHash-LSH is the similarity engine.)
    """
    base = 0x0123456789ABCDEF
    rows = [
        ("u0", base),
        ("u1", base ^ 0b1),                      # hamming 1 -> pair
        ("u2", base ^ 0b111),                    # hamming 3 -> pair
        ("u3", base ^ 0xF000000000000001),       # hamming 5 -> no pair
        ("u4", 0x7EDCBA9876543210),              # far -> no pair
    ]
    signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v
    fp = spark.createDataFrame(
        [(u, None, signed(s)) for u, s in rows],
        "url string, minhash array<bigint>, simhash bigint",
    )
    got = {(r["url_a"], r["url_b"]): r["hamming"] for r in simhash_pairs(fp, cfg)[0].collect()}
    assert set(got) == {("u0", "u1"), ("u0", "u2"), ("u1", "u2")}
    assert got[("u0", "u1")] == 1 and got[("u0", "u2")] == 3


def test_connected_components_simple(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g"), ("g", "h"), ("h", "f")],
        ["url_a", "url_b"],
    )
    labels = {r["url"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert labels == {
        "a": "a", "b": "a", "c": "a",
        "d": "d", "e": "d",
        "f": "f", "g": "f", "h": "f",
    }


def test_components_long_chain(spark):
    """Chain a0-a1-...-a12: stresses iteration count, not just cliques."""
    edges = spark.createDataFrame(
        [(f"a{i:02d}", f"a{i+1:02d}") for i in range(12)], ["url_a", "url_b"]
    )
    labels = connected_components(edges)
    assert labels.select("cluster_id").distinct().count() == 1
    assert labels.count() == 13


def test_clusters_match_truth_membership(fp_df, small_pages, cfg):
    """Cluster membership vs planted truth for exact+near kinds."""
    banded = band_explode(fp_df, cfg)
    pairs, _ = candidate_pairs(banded, cfg)
    verified = verify_pairs(pairs, fp_df, cfg)
    all_pairs = verified.select("url_a", "url_b").unionByName(
        exact_dup_pairs(small_pages)
    ).dropDuplicates()
    clusters = clusters_from_pairs(all_pairs, all_docs=small_pages, min_size=1)

    joined = clusters.join(small_pages.select("url", "truth_cluster_id", "dup_kind"), "url")
    # within each planted exact cluster, all members share one cluster_id
    bad = (
        joined.filter(F.col("dup_kind").isin("exact"))
        .groupBy("truth_cluster_id")
        .agg(F.count_distinct("cluster_id").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    assert bad == 0


def test_verify_recompute_equals_stored(fp_df, small_pages, cfg):
    """The lean path (no stored shingles + recompute on candidates)
    must produce exactly the stored-shingles verify result."""
    from deduplicator_spark.operators.lsh import verify_pairs_recompute

    banded = band_explode(fp_df, cfg)
    pairs, _ = candidate_pairs(banded, cfg)
    stored = {
        (r["url_a"], r["url_b"], round(r["jaccard"], 9))
        for r in verify_pairs(pairs, fp_df, cfg).collect()
    }
    recomputed = {
        (r["url_a"], r["url_b"], round(r["jaccard"], 9))
        for r in verify_pairs_recompute(
            pairs, small_pages.select("url", "text"), cfg
        ).collect()
    }
    assert stored == recomputed and stored
