"""SemDeDup-style semantic pruning (operators/semdedup.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deduplicator_spark.operators.semdedup import semantic_prune, semantic_prune_summary

DIM = 16


@pytest.fixture(scope="module")
def vecs():
    """Two planted near-duplicate groups at ids 0-2 and 3-4 (BELOW all
    random ids, so the min-id representative election inside their sign
    buckets always picks a group member), plus 60 random unit vectors
    at ids 100+."""
    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    for base_id, n in ((0, 3), (3, 2)):
        d = rng.standard_normal(DIM)
        d /= np.linalg.norm(d)
        for j in range(n):
            v = d + 0.001 * rng.standard_normal(DIM)
            rows.append((base_id + j, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    for i in range(60):
        v = rng.standard_normal(DIM)
        rows.append((100 + i, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    return rows


@pytest.fixture(scope="module")
def emb(spark, vecs):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(vecs, schema).repartition(4).cache()
    df.count()
    return df


def test_planted_near_dups_pruned(spark, emb):
    out = semantic_prune(emb, dim=DIM, min_cosine=0.9).cache()
    rows = {r["vec_id"]: r for r in out.collect()}
    # each planted group shares a sign bucket (identical directions,
    # 0.001 noise) and its min id wins the election; followers pruned
    for vid in (1, 2):
        assert rows[vid]["rep_id"] == 0
        assert rows[vid]["action"] == "prune"
        assert rows[vid]["cosine"] > 0.99
    assert rows[4]["rep_id"] == 3
    assert rows[4]["action"] == "prune"
    # representatives never appear as decision rows
    assert 0 not in rows and 3 not in rows


def test_decisions_match_independent_recompute(spark, emb, vecs):
    """Every output row's cosine and action re-derived with plain
    numpy from the input vectors (engine-independent check)."""
    by_id = {vid: np.asarray(v, dtype=np.float64) for vid, v in vecs}
    for r in semantic_prune(emb, dim=DIM, min_cosine=0.9).collect():
        a, b = by_id[r["vec_id"]], by_id[r["rep_id"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cosine"]) < 1e-4
        assert r["action"] == ("prune" if r["cosine"] >= 0.9 else "keep")


def test_row_count_is_members_minus_buckets(spark, emb):
    """Each non-empty bucket elects exactly one rep; everyone else
    gets exactly one decision row."""
    out = semantic_prune(emb, dim=DIM, min_cosine=0.9)
    from deduplicator_spark.operators.ann import make_hyperplane_udf

    sig_udf = make_hyperplane_udf(DIM, 16, 42)
    n_buckets = (
        emb.select(sig_udf("embedding").bitwiseAND(F.lit(63)).alias("b"))
        .distinct()
        .count()
    )
    assert out.count() == emb.count() - n_buckets


def test_deterministic(spark, emb):
    a = sorted(map(tuple, semantic_prune(emb, dim=DIM, min_cosine=0.9).collect()))
    b = sorted(map(tuple, semantic_prune(emb, dim=DIM, min_cosine=0.9).collect()))
    assert a == b


def test_threshold_splits_actions(spark, emb):
    """min_cosine=-1 prunes everything; min_cosine=2 keeps everything."""
    prune_all = semantic_prune(emb, dim=DIM, min_cosine=-1.0)
    assert prune_all.filter(F.col("action") == "keep").count() == 0
    keep_all = semantic_prune(emb, dim=DIM, min_cosine=2.0)
    assert keep_all.filter(F.col("action") == "prune").count() == 0


def test_summary(spark, emb):
    out = semantic_prune(emb, dim=DIM, min_cosine=0.9)
    summ = {r["action"]: r["n_docs"] for r in semantic_prune_summary(out).collect()}
    assert sum(summ.values()) == out.count()
    assert summ.get("prune", 0) >= 3  # ids 1, 2 and 4 — the planted followers


def test_bucket_bits_validation(emb):
    with pytest.raises(ValueError):
        semantic_prune(emb, dim=DIM, bucket_bits=0)
