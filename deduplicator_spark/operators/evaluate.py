"""Pair-counting clustering evaluation — the north-rule metric
(dup-pair recall >= 0.99 vs reference cluster assignments) as a
first-class distributed operator.

Pair precision/recall/F1 are computed by combinatorics over group
sizes, NEVER by materializing pairs: a 10^6-member cluster contributes
C(n,2) ~ 5*10^11 pairs as one arithmetic expression on one aggregated
row.  Three map-side-combined aggregations total:

    TP    = Σ over (pred_cluster × truth_cluster) cells of C(n_cell, 2)
    PRED  = Σ over pred clusters of C(n, 2)
    TRUTH = Σ over truth clusters of C(n, 2)

precision = TP/PRED, recall = TP/TRUTH, F1 the harmonic mean.  Docs
the engine left unclustered are implicit singletons (contribute no
predicted pairs, still count in TRUTH — exactly the recall semantics
the north rule wants).

All pair counts are exact BIGINT (n*(n-1) DIV 2), so the ratios are
deterministic doubles any engine reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_sum(df: DataFrame, group_col: str, out: str) -> DataFrame:
    """Single-row frame: Σ_groups C(group_size, 2) as BIGINT."""
    return (
        df.groupBy(group_col)
        .agg(F.count("*").alias("n"))
        .select(F.expr("n * (n - 1) DIV 2").alias("c2"))
        .agg(F.sum("c2").cast("long").alias(out))
    )


def pair_metrics(
    pred: DataFrame,
    truth: DataFrame,
    key: str = "url",
    pred_col: str = "cluster_id",
    truth_col: str = "truth_cluster_id",
) -> DataFrame:
    """One-row DataFrame: (n_docs, tp_pairs, pred_pairs, truth_pairs,
    precision, recall, f1).

    ``pred``: (key, pred_col) — clustered docs only (unclustered docs
    are implicit singletons).  ``truth``: (key, truth_col) over the
    full universe.
    """
    cells = (
        pred.join(truth, key)
        .groupBy(pred_col, truth_col)
        .agg(F.count("*").alias("n"))
        .select(F.expr("n * (n - 1) DIV 2").alias("c2"))
        .agg(F.sum("c2").cast("long").alias("tp_pairs"))
    )
    pred_pairs = _pair_sum(pred, pred_col, "pred_pairs")
    truth_pairs = _pair_sum(truth, truth_col, "truth_pairs")
    n_docs = truth.agg(F.count("*").alias("n_docs"))

    row = n_docs.crossJoin(cells).crossJoin(pred_pairs).crossJoin(truth_pairs)
    # degenerate denominators are DEFINED as 0.0, not NULL (ADVICE r2
    # #5): zero predicted pairs = zero precision, zero truth pairs =
    # zero recall, and f1 follows
    p = F.when(
        F.col("pred_pairs") > 0, F.col("tp_pairs") / F.col("pred_pairs").cast("double")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("truth_pairs") > 0, F.col("tp_pairs") / F.col("truth_pairs").cast("double")
    ).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, F.lit(2.0) * p * r / (p + r)).otherwise(F.lit(0.0))
    return row.select(
        "n_docs",
        F.coalesce("tp_pairs", F.lit(0)).alias("tp_pairs"),
        F.coalesce("pred_pairs", F.lit(0)).alias("pred_pairs"),
        F.coalesce("truth_pairs", F.lit(0)).alias("truth_pairs"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
