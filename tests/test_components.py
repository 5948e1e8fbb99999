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
