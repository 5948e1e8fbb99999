"""Exact grouped quantiles via distinct-value compression.

Choosing length/score thresholds (e.g. "drop docs under the p01 token
count, cap at p99") needs quantiles per group.  `approx_percentile`
is sketch-based and engine-specific — useless against an exact oracle
and subtly non-reproducible across runs.  This computes EXACT
quantiles scalably for bounded-cardinality values (token counts,
char lengths, integer scores — the training-pipeline cases):

    1. aggregate to (group, value, n) — map-side combined, so the
       shuffle carries one row per DISTINCT value per group, not one
       per doc (a 10^12-row corpus has ~10^5 distinct token counts);
    2. one window cumulative sum over the compressed rows;
    3. the q-quantile is the smallest value whose cumulative count
       reaches ceil(q * N)  (1-based "lower" interpolation — the
       element at sorted position ceil(q*N)).

Step 2's window partitions by group and sorts ~distinct-values rows —
thousands per group, never corpus-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(group, q, value) — exact q-quantiles of ``value_col`` per group."""
    counts = df.groupBy(group_col, value_col).agg(F.count("*").alias("n"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(group_col)
    cum = counts.select(
        group_col,
        value_col,
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    q_lit = F.array(*[F.lit(float(q)) for q in qs])
    return (
        cum.select(group_col, value_col, "cum", "total", F.explode(q_lit).alias("q"))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy(group_col, "q")
        .agg(F.min(value_col).alias("value"))
    )
