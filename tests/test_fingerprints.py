"""Fingerprint UDF: determinism, degenerate guard, MinHash accuracy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deduplicator_spark.config import DedupConfig
from deduplicator_spark.functions.fingerprints import (
    make_fingerprint_udf,
    minhash_py,
    shingle_set_py,
)


@pytest.fixture(scope="module")
def fp_df(spark, small_pages, cfg):
    fp = make_fingerprint_udf(cfg)
    df = (
        small_pages.select("url", "text", "dup_kind", fp(F.col("text")).alias("fp"))
        .select("url", "text", "dup_kind", "fp.*")
        .cache()
    )
    df.count()
    return df


def test_degenerate_docs_get_null_fingerprints(fp_df, cfg):
    deg = fp_df.filter(F.col("dup_kind") == "degenerate")
    assert deg.count() > 0
    assert deg.filter(F.col("minhash").isNotNull()).count() == 0
    assert deg.filter(F.col("n_shingles") > 0).count() == 0


def test_exact_dups_have_identical_fingerprints(fp_df):
    bad = (
        fp_df.filter(F.col("dup_kind") == "exact")
        .groupBy("truth_cluster_id" if "truth_cluster_id" in fp_df.columns else F.md5("text"))
        .agg(F.count_distinct(F.hash("minhash")).alias("nm"), F.count_distinct("simhash").alias("ns"))
        .filter((F.col("nm") > 1) | (F.col("ns") > 1))
        .count()
    )
    assert bad == 0


def test_spark_udf_matches_python_reference(fp_df, cfg):
    rows = fp_df.filter(F.col("minhash").isNotNull()).limit(20).collect()
    for r in rows:
        expected = minhash_py(r["text"], cfg)
        assert expected is not None
        assert list(expected) == list(r["minhash"]), r["url"]
        assert len(shingle_set_py(r["text"], cfg.shingle_k)) == r["n_shingles"]


def test_minhash_estimates_jaccard(cfg):
    """Signature agreement ≈ exact Jaccard within sampling error."""
    base = " ".join(f"w{i:04d}" for i in range(200))
    toks = base.split()
    edited = list(toks)
    for i in range(0, 200, 25):  # 8/200 = 4% substitution
        edited[i] = "zzz" + str(i)
    other = " ".join(edited)

    sa, sb = shingle_set_py(base, cfg.shingle_k), shingle_set_py(other, cfg.shingle_k)
    exact_j = len(sa & sb) / len(sa | sb)
    ma, mb = minhash_py(base, cfg), minhash_py(other, cfg)
    est_j = float(np.mean(ma == mb))
    assert abs(est_j - exact_j) < 0.12  # ~3 sigma at 128 perms


def test_simhash_no_overflow_on_huge_docs():
    """Docs with >= 2^15 shingles take the int32 accumulator path and
    must agree with a naive per-bit majority (ADVICE r1: int16
    silently overflowed)."""
    from deduplicator_spark.functions.fingerprints import _segment_simhash

    rng = np.random.Generator(np.random.PCG64(7))

    def naive(vals):
        n, out = len(vals), np.uint64(0)
        for i in range(64):
            cnt = int(((vals >> np.uint64(i)) & np.uint64(1)).sum())
            if 2 * cnt > n:
                out |= np.uint64(1) << np.uint64(i)
        return out

    small = rng.integers(0, 2**63, 500, dtype=np.uint64)
    huge = rng.integers(0, 2**63, 40_000, dtype=np.uint64)  # > 2^15
    vals = np.concatenate([small, huge])
    segs = np.concatenate([np.zeros(500, np.int64), np.ones(40_000, np.int64)])
    got = _segment_simhash(vals, segs, 2)
    assert got[0] == naive(small) and got[1] == naive(huge)
    # exact dtype boundary (VERDICT r2 next-round #9): 2^15 - 1 shingles
    # is the largest int16-path segment, 2^15 the smallest int32-path —
    # both must agree with the naive majority
    for n in ((1 << 15) - 1, 1 << 15):
        v = rng.integers(0, 2**63, n, dtype=np.uint64)
        assert _segment_simhash(v, np.zeros(n, np.int64), 1)[0] == naive(v)


def test_fingerprint_batch_boundary_independence(spark, cfg):
    """Same text must hash identically regardless of batch packing."""
    fp = make_fingerprint_udf(cfg)
    texts = [" ".join(f"w{(i * 7 + j) % 100:04d}" for j in range(30)) for i in range(50)]
    pdf = pd.DataFrame({"id": range(50), "text": texts})
    df1 = spark.createDataFrame(pdf).repartition(1)
    df8 = spark.createDataFrame(pdf).repartition(8)
    r1 = {r["id"]: (list(r["s"]["minhash"]), r["s"]["simhash"]) for r in df1.select("id", fp("text").alias("s")).collect()}
    r8 = {r["id"]: (list(r["s"]["minhash"]), r["s"]["simhash"]) for r in df8.select("id", fp("text").alias("s")).collect()}
    assert r1 == r8
