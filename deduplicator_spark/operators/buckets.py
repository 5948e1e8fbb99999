"""Shared skew-shaped bucket-to-pairs expansion.

Turns (bucket_key..., url) rows into candidate (url_a, url_b) pairs,
built for Zipf-hot buckets (boilerplate templates put the same hot
cluster into many buckets):

  1. light counts pass — singleton buckets (the vast majority) never
     shuffle their payload; buckets above ``cap`` go to the overflow
     audit (logged, never silently dropped),
  2. buckets are split by size BEFORE anything heavy happens: only
     within-cap buckets ever materialize a member array (bounded at
     ``cap`` elements); over-cap buckets are expanded row-wise from
     ``row_number`` positions so no multi-MB aggregation row exists
     anywhere in the plan (VERDICT r2 "What's wrong" #2),
  3. for within-cap buckets one groupBy collects sorted member arrays;
     identical member sets across buckets collapse via dropDuplicates
     — a hot cluster sitting in 32 band buckets expands its pairs
     once, not 32x,
  4. pair expansion is a bucket-keyed self-join over the re-exploded
     members (streams and parallelizes; building the C(m,2) array as
     one row value would be a single-task GC storm),
  5. final dropDuplicates on the pair key.

Used by the MinHash-LSH band join (operators/lsh.py), the winnowing
anchor join (operators/substring.py), span dedup (operators/spans.py)
and the ANN band/cell joins (operators/ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_pairs(
    keyed: DataFrame,
    key_cols: list[str],
    cap: int,
    url_col: str = "url",
    ring_k: int = 8,
    overcap: str = "ring",
    pin_keyed: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(pairs(url_a, url_b), overflow(key_cols..., bucket_size)).

    ``pin_keyed`` materializes ``keyed`` once before the three passes
    below reference it (counts, within-cap route, over-cap route):
    Catalyst shares no common subtrees, so a lazy ``keyed`` — typically
    an explode + hash over the fingerprint frame — is re-executed per
    reference.  The pin was introduced on an 8-core/200k measurement
    (halved the candidate stage then), but after the CC shuffle-width
    fix two interleaved A/Bs (BENCH/Q1_AB.json: r4 nopin 26.6 vs head
    29.0; r5 post-fix 18.31 vs 18.76, 5 runs/arm) show recomputing the
    explode from the columnar fingerprint checkpoint is no slower —
    and at 10^12-doc banding (~600 TB keyed frame) storing it is not
    an option — so the default is now False.  Pass True only when the
    upstream of ``keyed`` is genuinely expensive to recompute and
    small enough to store.

    Buckets within ``cap`` expand to all pairs.  Buckets OVER ``cap``
    (mega-clusters: a 10^5-member boilerplate bucket would emit 5e9
    clique pairs) fall back to one of two O(k*m) shapes selected by
    ``overcap`` — both computed from row_number positions, never from
    a collected member array:

    - ``"ring"`` (default): each member pairs with its next ``ring_k``
      successors in sorted order.  A circulant graph stays connected
      w.h.p. even when half its edges fail verification — right for
      CLUSTERING consumers (LSH, SimHash, ANN), at the documented cost
      of pair-level completeness inside capped buckets.
    - ``"star"``: each member pairs with the bucket's first ``ring_k``
      members (the sorted min-url prefix).  Every member is guaranteed
      a partner from a fixed canonical set — right for COVERAGE
      consumers (span/substring rewrite, where a doc in a hot anchor
      bucket must still find some partner sharing the anchor; ADVICE
      r2 #1).

    Every capped bucket is recorded in the overflow audit — the cap is
    never silent.
    """
    if overcap not in ("ring", "star"):
        raise ValueError(f"overcap must be 'ring' or 'star', got {overcap!r}")
    if pin_keyed:
        keyed = keyed.localCheckpoint()
    counts = keyed.groupBy(*key_cols).agg(F.count("*").alias("bucket_size"))
    overflow = counts.filter(F.col("bucket_size") > cap)
    small_keys = counts.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= cap)
    ).select(*key_cols)
    big_keys = overflow.select(*key_cols)

    # no explicit broadcast hint: the eligible-bucket set is unbounded
    # at corpus scale (an explicit hint would bypass
    # autoBroadcastJoinThreshold and OOM the driver on web corpora);
    # AQE picks broadcast when the counts side is actually small
    ok = keyed.join(small_keys, key_cols, "left_semi")
    buckets = ok.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(url_col)).alias("members")
    )
    distinct_buckets = buckets.select("members").dropDuplicates()

    # full expansion for small buckets: bucket-keyed self-join (streams)
    exploded = distinct_buckets.select(
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

    # over-cap buckets: row-wise expansion from sorted positions — one
    # Window sort per mega-bucket of SMALL (key, url, pos) rows, then a
    # positional equi-join; the member array is never built.  Identical
    # mega-buckets across bands re-expand (no member-set collapse
    # here), which is fine: over-cap buckets are rare and audited, the
    # duplicate pairs are ids only, and the final dropDuplicates
    # collapses them.
    bk = keyed.join(big_keys, key_cols, "left_semi")
    w = Window.partitionBy(*key_cols).orderBy(url_col)
    pos = bk.select(
        *key_cols, F.col(url_col).alias("url"), F.row_number().over(w).alias("pos")
    )
    if overcap == "ring":
        targets = pos.select(
            *key_cols,
            "url",
            F.explode(
                F.sequence(F.col("pos") + 1, F.col("pos") + ring_k)
            ).alias("tpos"),
        )
        right = pos.select(
            *key_cols, F.col("pos").alias("tpos"), F.col("url").alias("url_b")
        )
        # inner join drops tpos beyond the bucket size — no size column needed
        big_pairs = (
            targets.join(right, [*key_cols, "tpos"])
            .select(F.col("url").alias("url_a"), "url_b")
            .filter(F.col("url_a") < F.col("url_b"))
        )
    else:  # star: everyone pairs with the sorted min-url prefix
        prefix = pos.filter(F.col("pos") <= ring_k).select(
            *key_cols, F.col("url").alias("purl")
        )
        big_pairs = (
            pos.join(prefix, key_cols)
            .filter(F.col("url") != F.col("purl"))
            .select(
                F.least("url", "purl").alias("url_a"),
                F.greatest("url", "purl").alias("url_b"),
            )
        )

    pairs = full_pairs.unionByName(big_pairs).dropDuplicates(["url_a", "url_b"])
    return pairs, overflow
