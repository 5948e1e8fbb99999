"""Exact (byte-identity) deduplication — the md5 stage.

Reference analog: identical fingerprints land in the same shelve
bucket (``db[hash] = [...paths]``, dupedb.py:255-257) and the
``samefile`` pairwise identity dedupe (dupedb.py:338-341).  Here the
fingerprint is ``F.md5(text)`` (JVM built-in, no UDF) and a bucket is
a groupBy key; never a collected list.

At 100 TB this is one map-side-combined hash aggregation on a 32-byte
key — the cheapest possible full-dedup pass, and it runs *before* any
near-dup machinery so identical boilerplate never reaches LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_clusters(pages: DataFrame, text_col: str = "text", min_size: int = 2) -> DataFrame:
    """Clusters of byte-identical texts.

    Returns (content_md5, cluster_size, urls-sorted-count semantics kept
    relational: one row per url) — i.e. (url, content_md5, cluster_size),
    filtered to clusters of at least ``min_size`` members (the
    reference's threshold predicate, dupedb.py:331-332).
    """
    md5 = pages.select("url", F.md5(F.col(text_col)).alias("content_md5"))
    sizes = md5.groupBy("content_md5").agg(F.count("*").alias("cluster_size"))
    return (
        md5.join(sizes, "content_md5")
        .filter(F.col("cluster_size") >= min_size)
        .select("url", "content_md5", "cluster_size")
    )


def normalized_exact_clusters(
    pages: DataFrame, text_col: str = "text", min_size: int = 2
) -> DataFrame:
    """Clusters of docs identical after CCNet-style normalization
    (case/digits/punctuation/whitespace folded — see
    functions.text.ccnet_normalize).

    The "fuzzy-exact" tier between byte md5 and MinHash: it catches
    reformatted mirrors and counter/timestamp-only variants at the cost
    of one md5 over the normalized text.  Same 100 TB shape as
    ``exact_clusters`` — a map-side-combined agg on a 32-byte key; the
    normalization itself is whole-stage-codegen JVM regex, no UDF.
    """
    from ..functions.text import ccnet_normalize

    md5 = pages.select("url", F.md5(ccnet_normalize(text_col)).alias("norm_md5"))
    sizes = md5.groupBy("norm_md5").agg(F.count("*").alias("cluster_size"))
    return (
        md5.join(sizes, "norm_md5")
        .filter(F.col("cluster_size") >= min_size)
        .select("url", "norm_md5", "cluster_size")
    )


def exact_dup_pairs(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(url_a, url_b) pairs of byte-identical docs, url_a < url_b.

    Expressed as an equi-self-join on the md5 key — Catalyst turns the
    per-key pair generation into a shuffle on the 32-byte digest only.
    """
    md5 = pages.select("url", F.md5(F.col(text_col)).alias("content_md5"))
    a, b = md5.alias("a"), md5.alias("b")
    return (
        a.join(b, (F.col("a.content_md5") == F.col("b.content_md5")) & (F.col("a.url") < F.col("b.url")))
        .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
    )
