"""Connected components over candidate-pair edges.

The reference's clusters are implicit — a cluster IS a dict key
(dupedb.py:255-257).  With LSH, a doc can pair through different bands
with different partners, so cluster formation becomes a graph problem:
connected components over the verified-pair edge set.

Implemented as iterative hash-to-min label propagation (the
GraphFrames-style DataFrame loop SURVEY.md §4 calls for):

    label(v) <- min(label(v), min over neighbors u of label(u))

until a fixpoint.  Each iteration is one shuffle join + one
aggregation; ``localCheckpoint()`` truncates the lineage so the plan
doesn't grow exponentially.  Duplicate clusters are near-cliques, so
convergence is 2-4 iterations in practice; ``max_iter`` bounds
pathological chains.

Cluster ids are the lexicographic min url of the component —
deterministic, stable under input permutation, and meaningful for
debugging (the reference's analog: the shelve key itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "url_a",
    dst: str = "url_b",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> (url, cluster_id) for every url in an edge.

    cluster_id = min url (string) in the component.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("url"))
        .distinct()
        .withColumn("cluster_id", F.col("url"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["url"])
            .groupBy(F.col("v").alias("url2"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # lazy checkpoint: the convergence count below is the one
        # materializing action per iteration (eager would add a job)
        new_labels = (
            labels.join(neighbor_min, labels["url"] == F.col("url2"), "left")
            .select(
                "url",
                F.least(F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")).alias(
                    "cluster_id"
                ),
                (F.col("nbr_min") < F.col("cluster_id")).alias("changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels


def clusters_from_pairs(
    pairs: DataFrame,
    all_docs: DataFrame | None = None,
    url_col: str = "url",
    min_size: int = 2,
    max_iter: int = 25,
) -> DataFrame:
    """Full cluster table: components of ``pairs`` plus (optionally)
    singleton clusters for docs that matched nothing.

    Returns (url, cluster_id, cluster_size) filtered to
    cluster_size >= min_size — the reference threshold semantics
    (threshold 2 = duplicates only, 1 = everything; dupedb.py:331-332).
    """
    comp = connected_components(pairs, max_iter=max_iter)
    if all_docs is not None:
        singletons = (
            all_docs.select(F.col(url_col).alias("url"))
            .join(comp.select("url"), "url", "left_anti")
            .withColumn("cluster_id", F.col("url"))
        )
        comp = comp.unionByName(singletons)
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "cluster_id")
        .filter(F.col("cluster_size") >= min_size)
        .select("url", "cluster_id", "cluster_size")
    )
