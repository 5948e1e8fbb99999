"""KMV / HLL distinct-count sketches (functions/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.functions.sketches import hll_distinct, kmv_distinct


@pytest.fixture(scope="module")
def grouped(spark):
    """Three groups with known distinct counts: 200, 40 and 5 distinct
    values (each value duplicated 3x — distinct counting must ignore
    multiplicity)."""
    rows = []
    for g, n in (("big", 200), ("mid", 40), ("small", 5)):
        for i in range(n):
            rows += [(g, f"{g}-value-{i}")] * 3
    return spark.createDataFrame(rows, "grp string, v string").repartition(8)


def test_kmv_exact_below_capacity(spark, grouped):
    out = {
        r["grp"]: r
        for r in kmv_distinct(grouped, "grp", "v", k=16).collect()
    }
    # below-capacity groups are exact
    assert out["small"]["kmv_estimate"] == out["small"]["true_distinct"] == 5
    assert out["mid"]["true_distinct"] == 40
    assert out["big"]["true_distinct"] == 200


def test_kmv_estimate_accuracy(spark, grouped):
    """Above capacity the estimate is within the usual KMV error band
    (~1/sqrt(k-2) relative) for this fixed seed-free hash."""
    out = {r["grp"]: r for r in kmv_distinct(grouped, "grp", "v", k=32).collect()}
    for g in ("big", "mid"):
        true, est = out[g]["true_distinct"], out[g]["kmv_estimate"]
        assert abs(est - true) / true < 0.5, (g, true, est)


def test_kmv_ignores_multiplicity(spark, grouped):
    """Tripling every row again must not change any estimate."""
    doubled = grouped.unionAll(grouped)
    a = sorted(kmv_distinct(grouped, "grp", "v", k=16).collect())
    b = sorted(kmv_distinct(doubled, "grp", "v", k=16).collect())
    assert a == b


def test_kmv_k_validation(grouped):
    with pytest.raises(ValueError):
        kmv_distinct(grouped, "grp", "v", k=1)


def test_hll_sanity(spark, grouped):
    out = {r["grp"]: r["hll_estimate"] for r in hll_distinct(grouped, "grp", "v").collect()}
    assert out["small"] == 5
    assert abs(out["big"] - 200) / 200 < 0.15
    assert abs(out["mid"] - 40) / 40 < 0.15


def test_kmv_hash_range(spark, grouped):
    """The md5-derived hash must stay in [0, 2^60) — the estimator's
    uniformity assumption (and the BIGINT cast in the oracle)."""
    from deduplicator_spark.functions.sketches import kmv_hash

    stats = grouped.select(kmv_hash(F.col("v")).alias("h")).agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).first()
    assert stats["lo"] >= 0
    assert stats["hi"] < (1 << 60)
