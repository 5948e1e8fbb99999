"""Tiered dedup rollup — one verdict per document across the whole
dedup ladder.

Production web-corpus dedup runs as tiers of increasing cost, each
tier only paying for what the cheaper one missed:

    1. ``exact``       byte-identity md5 (operators/exact.py)
    2. ``normalized``  CCNet-style folded md5 (case/digits/punct/space)
    3. ``near_dup``    MinHash -> LSH -> verify -> connected components
    4. ``unique``      everything else

``dedup_tiers`` composes the already-tested stages into the per-doc
rollup a retention policy consumes: every doc gets its highest
(cheapest) matching tier, a group id within that tier, the group's
deterministic canonical member (min url), and the group size.

Reference analog: the reference's single md5-bucket verdict
(dupedb.py:255-257) is tier 1; tiers 2-3 are the text-scale ladder the
survey adds on top.

Scale notes (100 TB): the two md5 tiers are map-side-combined aggs on
32-byte keys; the tier/canonical assembly is three left hash
equi-joins on the doc key plus one combinable groupBy — after the
first shuffle on ``url`` the joins reuse the same partitioning, and
no stage ever carries text or shingles (only keys and digests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exact import exact_clusters, normalized_exact_clusters


def dedup_tiers(
    pages: DataFrame,
    near_clusters: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc tier verdict.

    ``pages``: (url, text).  ``near_clusters``: (url, cluster_id) from
    ``clusters_from_pairs`` over the verified near-dup pair set (passed
    in, not recomputed — the caller already has it checkpointed in any
    real pipeline).

    Returns (url, tier, group_id, canonical_url, group_size) with tier
    precedence exact > normalized > near_dup > unique.  ``group_id`` is
    engine-neutral: the md5 digest for the hash tiers, the cluster-min
    url for near-dups, the url itself for uniques.
    """
    e = exact_clusters(pages, text_col).select("url", "content_md5")
    n = normalized_exact_clusters(pages, text_col).select("url", "norm_md5")
    c = near_clusters.select("url", F.col("cluster_id").alias("near_id"))

    tagged = (
        pages.select("url")
        .join(e, "url", "left")
        .join(n, "url", "left")
        .join(c, "url", "left")
        .select(
            "url",
            F.when(F.col("content_md5").isNotNull(), F.lit("exact"))
            .when(F.col("norm_md5").isNotNull(), F.lit("normalized"))
            .when(F.col("near_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("unique"))
            .alias("tier"),
            F.coalesce("content_md5", "norm_md5", "near_id", "url").alias("group_id"),
        )
    )
    groups = tagged.groupBy("tier", "group_id").agg(
        F.min("url").alias("canonical_url"),
        F.count("*").alias("group_size"),
    )
    return tagged.join(groups, ["tier", "group_id"]).select(
        "url", "tier", "group_id", "canonical_url", "group_size"
    )


def tier_summary(tiers: DataFrame, char_counts: DataFrame | None = None) -> DataFrame:
    """(tier, n_docs, n_groups, n_redundant) — the headline savings
    table: ``n_redundant`` is what a keep-canonical policy deletes.
    One map-side-combined agg.

    ``char_counts`` (url, n_chars), when given, adds a
    ``redundant_chars`` column: the char-weighted savings of the
    keep-canonical policy per tier (what actually matters for storage
    and token budgets — doc COUNTS hide that near-dups skew long).
    """
    out = tiers.groupBy("tier").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("group_id").alias("n_groups"),
        F.sum((F.col("url") != F.col("canonical_url")).cast("long")).alias(
            "n_redundant"
        ),
    )
    if char_counts is not None:
        red = (
            tiers.filter(F.col("url") != F.col("canonical_url"))
            .join(char_counts.select("url", "n_chars"), "url")
            .groupBy("tier")
            .agg(F.sum("n_chars").cast("long").alias("redundant_chars"))
        )
        out = out.join(red, "tier", "left").withColumn(
            "redundant_chars", F.coalesce("redundant_chars", F.lit(0))
        )
    return out
