"""Sketch-based distinct counting: KMV (k-minimum-values) and HLL.

At 10^12 documents an exact ``COUNT(DISTINCT text)`` per group shuffles
every distinct value; sketches replace that with bounded, mergeable
state.  Two tiers:

- ``kmv_distinct`` — the KMV / bottom-k estimator (Bar-Yossef et al.
  2002): hash every value uniformly into [0, 2^60), keep the k smallest
  distinct hashes per group, estimate ``(k-1) * 2^60 / kth_min``.  The
  hash is deliberately **engine-independent** (first 15 hex digits of
  md5 — Spark ``conv(.., 16, 10)``, DuckDB ``('0x' || ..)::BIGINT``) so
  the driver oracle replays the whole estimate bit-for-bit in SQL.
- ``hll_distinct`` — Spark's built-in HyperLogLog++
  (``approx_count_distinct``): the true at-scale shape (fixed ~KB
  sketch per group, map-side partial merge, no per-value shuffle).  Its
  sketch is engine-specific, so it is pytest-verified against exact
  counts rather than oracle-replayed.

Scale notes: the KMV pipeline first reduces to DISTINCT (group, hash)
pairs — a map-side-combined aggregation on an 8-byte key — then ranks
hashes per group with a window.  The per-group sort touches only the
group's distinct hashes; for production group-bys with heavy hitters
prefer ``hll_distinct`` (bounded state end-to-end).  Reference analog:
the dedup database's per-config key census (dupedb.py:255-257 counts
distinct fingerprints by iterating the shelve); here the census is a
sketch so it survives 10^6x the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 15 hex digits = 60 bits; hashes are uniform in [0, 2^60).
HASH_SPACE = float(1 << 60)


def kmv_hash(col: F.Column) -> F.Column:
    """Engine-independent 60-bit uniform hash of a string column.

    ``conv`` parses the first 15 lowercase-hex md5 digits in base 16 —
    the DuckDB oracle computes the identical value via
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Output: (``group_col``, true_distinct, kmv_estimate) — one row per
    group.  ``true_distinct`` (the exact distinct-hash count) is kept
    for accuracy reporting at test scale; at corpus scale drop it and
    the plan reduces to the bounded bottom-k per group.  When a group
    has fewer than ``k`` distinct values the estimate IS the exact
    count (the sketch is lossless below its capacity).
    """
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by the kth minimum)")
    hashed = (
        df.select(F.col(group_col).alias("grp"), kmv_hash(F.col(value_col)).alias("h"))
        .distinct()  # map-side-combined: (grp, 8-byte hash) pairs only
    )
    ranked = hashed.withColumn(
        "rn", F.row_number().over(Window.partitionBy("grp").orderBy("h"))
    )
    agg = ranked.groupBy("grp").agg(
        F.count("*").alias("true_distinct"),
        F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("kth_min"),
    )
    estimate = F.when(
        F.col("true_distinct") < k, F.col("true_distinct").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_min").cast("double")
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "true_distinct",
        F.round(estimate).cast("bigint").alias("kmv_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group HyperLogLog++ distinct estimate (bounded-state, the
    shape to run at 10^12 rows).  Output: (group_col, hll_estimate)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd).alias("hll_estimate")
    )
