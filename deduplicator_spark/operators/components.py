"""Connected components over candidate-pair edges.

The reference's clusters are implicit — a cluster IS a dict key
(dupedb.py:255-257).  With LSH, a doc can pair through different bands
with different partners, so cluster formation becomes a graph problem:
connected components over the verified-pair edge set.

Implemented as iterative hash-to-min label propagation WITH pointer
doubling (the GraphFrames-style DataFrame loop SURVEY.md §4 calls for,
upgraded per VERDICT/ADVICE r1 to the O(log n)-round family of
Kiveris et al.'s large-star/small-star):

    propagate:  label(v) <- min(label(v), min over neighbors u of label(u))
    shortcut:   label(v) <- label(label(v))

until a fixpoint.  Plain one-hop propagation needs O(diameter) rounds
— the sampled-ring fallback for over-cap LSH buckets
(operators/buckets.py, ring_k=8) produces components with diameter in
the hundreds, which silently truncated at the old max_iter=25.  The
shortcut step halves the label-forest depth every round, so rounds are
O(log diameter): a 2000-member ring converges in <= 8 rounds.

Non-convergence is LOUD: if ``max_iter`` is exhausted with labels
still moving, a RuntimeError is raised — wrong silent cluster ids were
VERDICT r1 "What's wrong" #3.

Cluster ids are the lexicographic min url of the component —
deterministic, stable under input permutation, and meaningful for
debugging (the reference's analog: the shelve key itself).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Serializes the AQE toggle in connected_components: Spark has no
# per-query conf, so the toggle is session-global, and two overlapping
# CC calls on one session could otherwise race the restore (second
# call saves "false" as its before-value and AQE stays off forever).
_AQE_TOGGLE_LOCK = threading.Lock()


def connected_components(
    edges: DataFrame,
    src: str = "url_a",
    dst: str = "url_b",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> (url, cluster_id) for every url in an edge.

    cluster_id = min url (string) in the component.  Raises
    RuntimeError if ``max_iter`` rounds do not reach the fixpoint
    (never returns silently-wrong labels).

    AQE is disabled for the duration of the loop (restored after):
    adaptive execution materializes EVERY exchange as its own Spark
    job, which turned each iteration's convergence count into 5-7
    scheduler round-trips (measured 37 jobs for a 4-round CC at 300
    docs — the dominant core-insensitive floor of the whole chain).
    Inside the loop AQE has nothing to add: join keys are uniform
    8-byte surrogate ids, skew was handled at candidate generation,
    and the label/edge frames shrink monotonically.

    ``spark.sql.shuffle.partitions`` is ALSO scoped down for the loop
    (restored with AQE): the post-verify edge graph is orders of
    magnitude smaller than the corpus, and corpus-width shuffles made
    each iteration a task-scheduling floor (measured 3.5s/iteration at
    128 partitions / 32 cores for a 232k-row graph; ~1s after).

    BLAST RADIUS (session-global, documented per VERDICT/ADVICE r3):
    Spark exposes no per-query conf, so both toggles mutate the SHARED
    session conf — any query running concurrently on the same
    SparkSession during the loop silently loses AQE (including the
    skew-join handling ``build_session`` turns on) and runs at the
    narrowed shuffle width until the restore.
    A module lock serializes overlapping ``connected_components``
    calls so the restore itself can't race, but it cannot shield
    unrelated concurrent queries.  The driver contract here is
    single-threaded per session; if you share a session across
    threads, run CC on its own session.  See PLANS.md §4c.
    """
    spark = edges.sparkSession
    # Materialize the symmetric edge set BEFORE AQE is toggled off.
    # This count executes the caller's entire lazy upstream — for the
    # flagship chain that is the estimate/verify joins, the heaviest
    # exchanges of the whole plan — and those must run WITH adaptive
    # execution (runtime broadcast conversion, partition coalescing,
    # skew splitting).  Round-4 code built sym inside the AQE-off
    # scope, so the verify subtree silently ran as static sort-merge
    # joins shuffling full-corpus signature/shingle arrays (profiled:
    # ~70% of the job's shuffle bytes at 200k docs, tools/
    # profile_e2e.py).  Only the label-propagation loop itself —
    # uniform 8-byte keys, monotonically shrinking frames — benefits
    # from AQE being off (see docstring above).
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_sym = sym.count()
    with _AQE_TOGGLE_LOCK:
        aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
        parts_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return _cc_loop(sym, n_sym, max_iter)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
            spark.conf.set("spark.sql.shuffle.partitions", parts_before)


def _cc_loop(
    sym: DataFrame,
    n_sym: int,
    max_iter: int,
) -> DataFrame:
    spark = sym.sparkSession
    # The eager count in connected_components (run with AQE still on)
    # already materialized sym and told us the graph size, so the
    # loop's shuffle width can match the LABEL FRAME, not the corpus:
    # the edge set after verification is orders of magnitude smaller
    # than the input (50k web docs -> 232k sym rows), and with AQE off
    # every iteration otherwise runs join+agg+join at the session's
    # corpus-sized spark.sql.shuffle.partitions — measured
    # 3.5s/iteration of pure task-scheduling floor at 128 partitions /
    # 32 cores for microseconds of real per-task work.  ~200k rows per
    # partition, never fewer than 8, never more than the session
    # setting (a 10^11-edge graph keeps the configured width).
    # Restored by connected_components' finally, same blast-radius
    # contract as the AQE toggle.
    parts_before = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_parts = max(8, min(parts_before, n_sym // 200_000 + 8))
    spark.conf.set("spark.sql.shuffle.partitions", n_parts)
    # seed labels with round 1's propagation for free: label0(v) =
    # min(v, min neighbor) is exactly one hash-to-min round over
    # identity labels, computed in the same aggregation that would
    # otherwise just collect the vertex set — saves one full
    # join+groupBy+count iteration on every graph
    labels = (
        sym.groupBy(F.col("v").alias("url"))
        .agg(F.min("u").alias("nbr_min"))
        .select("url", F.least("url", "nbr_min").alias("cluster_id"))
        .localCheckpoint(eager=False)
    )

    n_changed = 0
    for _ in range(max_iter):
        # 1) one-hop neighbor-min propagation
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["url"])
            .groupBy(F.col("v").alias("url2"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        propagated = (
            labels.join(neighbor_min, labels["url"] == F.col("url2"), "left")
            .select(
                "url",
                F.least(F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")).alias(
                    "cluster_id"
                ),
                (F.col("nbr_min") < F.col("cluster_id")).alias("changed"),
            )
        ).localCheckpoint(eager=False)  # referenced twice below; compute once
        # 2) pointer doubling: follow the label one step
        #    (label(x) <= x invariantly, so the join only improves labels)
        parents = propagated.select(
            F.col("url").alias("p_url"), F.col("cluster_id").alias("p_label")
        )
        # lazy checkpoint: the convergence count below is the one
        # materializing action per iteration (eager would add a job)
        new_labels = (
            propagated.join(parents, propagated["cluster_id"] == parents["p_url"], "left")
            .select(
                "url",
                F.coalesce("p_label", "cluster_id").alias("cluster_id"),
                (
                    F.col("changed") | (F.col("p_label") < F.col("cluster_id"))
                ).alias("changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still moving) — raise max_iter; results "
            "would be silently wrong cluster assignments"
        )
    return labels


def update_clusters(
    old_labels: DataFrame,
    new_edges: DataFrame,
    min_size: int = 2,
    max_iter: int = 25,
) -> DataFrame:
    """Incremental connected components: fold a new crawl's edges into
    an existing cluster assignment WITHOUT re-running CC over the old
    pair set.

    ``old_labels``: (url, cluster_id) from the previous run.
    ``new_edges``: (url_a, url_b) pairs touching at least one new doc
    (new-new from banding the snapshot, new-old from
    ``cross_snapshot_pairs``).

    Each old cluster is re-encoded as a STAR (member -> its label), so
    connectivity is preserved with |cluster|-1 edges instead of the
    original pair set, and label propagation re-converges in
    O(log diameter-of-NEW-merges) rounds — old components are already
    depth-1.  The result is provably identical to a from-scratch CC
    over (old pairs ∪ new edges), which is exactly what the oracle
    checks (``incremental_cc`` replays the full recompute in SQL).

    At 100 TB this is the difference between touching the 10^12-doc
    pair history every crawl and touching O(|old labels| + |new
    edges|) — and old_labels is already the compact per-doc table a
    real deployment checkpoints.
    """
    star = old_labels.filter(F.col("url") != F.col("cluster_id")).select(
        F.col("url").alias("url_a"), F.col("cluster_id").alias("url_b")
    )
    edges = star.unionByName(new_edges.select("url_a", "url_b"))
    return clusters_from_pairs(edges, min_size=min_size, max_iter=max_iter)


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
