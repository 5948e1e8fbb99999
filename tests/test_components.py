"""Connected-components convergence behavior (VERDICT/ADVICE r1):
pointer doubling gives O(log diameter) rounds, and non-convergence
raises instead of returning silently-wrong labels."""

from __future__ import annotations

import pytest

from deduplicator_spark.operators.components import connected_components


def _path_edges(spark, n: int):
    """Path graph 0-1-2-...-(n-1) with zero-padded string nodes."""
    rows = [(f"{i:05d}", f"{i + 1:05d}") for i in range(n - 1)]
    return spark.createDataFrame(rows, "url_a string, url_b string")


def test_path_graph_converges_in_log_rounds(spark):
    n = 100
    labels = connected_components(_path_edges(spark, n), max_iter=12)
    got = {r["url"]: r["cluster_id"] for r in labels.collect()}
    assert len(got) == n
    assert set(got.values()) == {"00000"}  # one component, min-url label


def test_ring_kN_diameter_converges(spark):
    """The sampled-ring fallback shape: node i connected to i+1..i+4 —
    diameter ~ n/4; old one-hop propagation needed ~n/8 rounds."""
    n, k = 120, 4
    rows = [
        (f"{i:05d}", f"{j:05d}")
        for i in range(n)
        for j in range(i + 1, min(i + k + 1, n))
    ]
    edges = spark.createDataFrame(rows, "url_a string, url_b string")
    labels = connected_components(edges, max_iter=10)
    assert {r["cluster_id"] for r in labels.collect()} == {"00000"}


def test_nonconvergence_raises_loudly(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_path_edges(spark, 300), max_iter=2)


def test_update_clusters_equals_full_recompute_fuzz(spark):
    """Incremental CC (old labels folded as star edges + only the new
    crawl's edges) must equal a from-scratch CC over ALL edges, for
    random graphs and random old/new doc splits — including merges of
    several old clusters through one new doc."""
    import random

    from deduplicator_spark.operators.components import (
        clusters_from_pairs,
        update_clusters,
    )

    rng = random.Random(5)
    for trial in range(3):
        n = 80
        edges = {
            tuple(sorted((f"{rng.randrange(n):05d}", f"{rng.randrange(n):05d}")))
            for _ in range(60)
        }
        edges = [(a, b) for a, b in edges if a != b]
        new_docs = {f"{i:05d}" for i in range(n) if rng.random() < 0.3}
        old_edges = [(a, b) for a, b in edges if a not in new_docs and b not in new_docs]
        new_edges = [(a, b) for a, b in edges if a in new_docs or b in new_docs]

        def df(rows):
            return spark.createDataFrame(
                rows or [("x", "x")], "url_a string, url_b string"
            ).limit(len(rows))

        old_labels = clusters_from_pairs(df(old_edges), min_size=2).select(
            "url", "cluster_id"
        )
        got = {
            (r["url"], r["cluster_id"], r["cluster_size"])
            for r in update_clusters(old_labels, df(new_edges), min_size=2).collect()
        }
        want = {
            (r["url"], r["cluster_id"], r["cluster_size"])
            for r in clusters_from_pairs(df(edges), min_size=2).collect()
        }
        assert got == want, f"trial {trial}"


def test_update_clusters_merges_two_old_clusters(spark):
    from deduplicator_spark.operators.components import update_clusters

    old = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1")],
        "url string, cluster_id string",
    )
    # a new doc bridges the two old clusters
    new = spark.createDataFrame(
        [("a2", "n1"), ("b1", "n1")], "url_a string, url_b string"
    )
    out = {r["url"]: r for r in update_clusters(old, new).collect()}
    assert {r["cluster_id"] for r in out.values()} == {"a1"}
    assert out["b2"]["cluster_size"] == 5
