"""ANN operators: multi-probe IVF — boundary recall vs single-probe.

(Signature/cell math is pinned by tests/test_goldens.py; plan shapes
by tests/test_plans.py; exact values by the driver oracles.)
"""

from __future__ import annotations

import numpy as np

from deduplicator_spark.operators.ann import ivf_pairs

SF001 = "/root/testdata/sf0.01"


def _brute_truth(spark, min_cosine: float) -> set[tuple[int, int]]:
    rows = spark.read.parquet(f"{SF001}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    S = M @ M.T
    ia, ib = np.where(np.triu(S >= min_cosine, k=1))
    return {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(ia, ib)
    }


def test_ivf_multiprobe_superset_and_recall(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    kw = dict(dim=64, n_cells=16, min_cosine=0.3)
    s1 = {(r["id_a"], r["id_b"]) for r in ivf_pairs(emb, **kw, n_probe=1).collect()}
    s2 = {(r["id_a"], r["id_b"]) for r in ivf_pairs(emb, **kw, n_probe=2).collect()}
    # the top-1 cell is always probed, so probe-2 candidates (and the
    # verified pairs) must be a superset of single-probe's
    assert s1 <= s2
    truth = _brute_truth(spark, 0.3)
    assert s1 <= truth and s2 <= truth  # exact verify => no false positives
    r1 = len(s1 & truth) / len(truth)
    r2 = len(s2 & truth) / len(truth)
    assert r2 >= r1
    # at this fixture's geometry probing one extra cell must recover at
    # least one boundary-split pair (guards the explode path actually
    # probing more than one cell)
    assert len(s2) > len(s1)


def test_train_ivf_centroids_improves_objective(spark):
    """Lloyd rounds must not hurt the spherical k-means objective, and
    on this fixture a trained quantizer strictly beats the random one
    (that is WHY one trains it)."""
    from deduplicator_spark.operators.ann import (
        _ivf_centroids,
        quantization_objective,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    seeded = _ivf_centroids(64, 16, 42)
    trained = train_ivf_centroids(emb, dim=64, n_cells=16, n_iter=4)
    assert trained.shape == (16, 64)
    # unit rows: every centroid stays on the sphere
    assert np.allclose(np.linalg.norm(trained, axis=1), 1.0)
    o0 = quantization_objective(emb, seeded)
    o1 = quantization_objective(emb, trained)
    assert o1 > o0 + 1e-3


def test_ivf_pairs_with_trained_centroids(spark):
    """Trained quantizer drops into ivf_pairs: output stays exact-
    cosine-verified (no false positives vs brute force) and recall does
    not regress vs the seeded quantizer on this fixture."""
    from deduplicator_spark.operators.ann import train_ivf_centroids

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    kw = dict(dim=64, n_cells=16, min_cosine=0.3)
    trained = train_ivf_centroids(emb, dim=64, n_cells=16, n_iter=4)
    seeded_pairs = {(r["id_a"], r["id_b"]) for r in ivf_pairs(emb, **kw).collect()}
    trained_pairs = {
        (r["id_a"], r["id_b"])
        for r in ivf_pairs(emb, **kw, centroids=trained).collect()
    }
    truth = _brute_truth(spark, 0.3)
    assert trained_pairs <= truth
    assert len(trained_pairs & truth) >= len(seeded_pairs & truth)


def test_train_ivf_keeps_empty_cells(spark):
    """A quantizer trained with more cells than natural clusters must
    still return n_cells unit centroids (empty cells keep their seed
    centroid instead of collapsing to NaN)."""
    from deduplicator_spark.operators.ann import train_ivf_centroids

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").limit(20)
    c = train_ivf_centroids(emb, dim=64, n_cells=64, n_iter=2)
    assert c.shape == (64, 64)
    assert np.all(np.isfinite(c))
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0)
