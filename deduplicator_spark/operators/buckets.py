"""Shared skew-shaped bucket-to-pairs expansion.

Turns (bucket_key..., url) rows into candidate (url_a, url_b) pairs,
built for Zipf-hot buckets (boilerplate templates put the same hot
cluster into many buckets):

  1. light counts pass — singleton buckets (the vast majority) never
     shuffle their payload; buckets above ``cap`` go to the overflow
     audit (logged, never silently dropped),
  2. broadcast semi-join keeps only rows of eligible buckets,
  3. one groupBy collects sorted member arrays; identical member sets
     across buckets collapse via dropDuplicates — a hot cluster
     sitting in 32 band buckets expands its pairs once, not 32x,
  4. pair expansion is a bucket-keyed self-join over the re-exploded
     members (streams and parallelizes; building the C(m,2) array as
     one row value would be a single-task GC storm),
  5. final dropDuplicates on the pair key.

Used by the MinHash-LSH band join (operators/lsh.py) and the winnowing
anchor join (operators/substring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_pairs(
    keyed: DataFrame,
    key_cols: list[str],
    cap: int,
    url_col: str = "url",
    ring_k: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """(pairs(url_a, url_b), overflow(key_cols..., bucket_size)).

    Buckets within ``cap`` expand to all pairs.  Buckets OVER ``cap``
    (mega-clusters: a 10^5-member boilerplate bucket would emit 5e9
    clique pairs) fall back to a **sampled ring**: each member pairs
    with its next ``ring_k`` successors in sorted order — O(k*m)
    candidates that keep the bucket connected through the verifier
    (a circulant graph stays connected w.h.p. even when half its
    edges fail verification), at the documented cost of pair-level
    completeness INSIDE capped buckets.  Every capped bucket is
    recorded in the overflow audit — the cap is never silent.
    """
    counts = keyed.groupBy(*key_cols).agg(F.count("*").alias("bucket_size"))
    overflow = counts.filter(F.col("bucket_size") > cap)
    eligible = counts.filter(F.col("bucket_size") >= 2).select(*key_cols)

    # no explicit broadcast hint: the eligible-bucket set is unbounded
    # at corpus scale (an explicit hint would bypass
    # autoBroadcastJoinThreshold and OOM the driver on web corpora);
    # AQE picks broadcast when the counts side is actually small
    ok = keyed.join(eligible, key_cols, "left_semi")
    buckets = ok.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(url_col)).alias("members")
    )
    distinct_buckets = buckets.select("members").dropDuplicates()

    small = distinct_buckets.filter(F.size("members") <= cap)
    big = distinct_buckets.filter(F.size("members") > cap)

    # full expansion for small buckets: bucket-keyed self-join (streams)
    exploded = small.select(
        F.xxhash64("members").alias("bucket_key"), F.explode("members").alias("url")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    full_pairs = (
        a.join(
            b,
            (F.col("a.bucket_key") == F.col("b.bucket_key"))
            & (F.col("a.url") < F.col("b.url")),
        )
        .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
    )

    # sampled ring for mega-buckets: member[i] x member[i+j], j=1..k
    big_pos = big.select(
        F.xxhash64("members").alias("bucket_key"),
        F.size("members").alias("m"),
        F.posexplode("members").alias("pos", "url"),
    )
    targets = big_pos.filter(F.col("pos") < F.col("m") - 1).select(
        "bucket_key",
        "url",
        F.explode(
            F.sequence(F.col("pos") + 1, F.least(F.col("pos") + ring_k, F.col("m") - 1))
        ).alias("tpos"),
    )
    ring_pairs = (
        targets.join(
            big_pos.select("bucket_key", F.col("pos").alias("tpos"), F.col("url").alias("url_b")),
            ["bucket_key", "tpos"],
        )
        .select(F.col("url").alias("url_a"), "url_b")
        .filter(F.col("url_a") < F.col("url_b"))  # sorted members => always true; guard anyway
    )

    pairs = full_pairs.unionByName(ring_pairs).dropDuplicates(["url_a", "url_b"])
    return pairs, overflow
