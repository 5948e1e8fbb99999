"""Domain mixing-weight allocation (the data-mixing step after dedup).

A training-data pipeline that has deduplicated 100 TB still has to
decide HOW MUCH of each domain/source to train on.  The standard
recipe (Pile/Gopher/LLaMA-style) is temperature-scaled sampling:
raise each source's raw token count to ``alpha`` (< 1 upweights the
tail, 1.0 reproduces natural proportions), normalize into mixing
weights, and allocate a global token budget proportionally.  The
``epochs`` column (allocated / raw tokens) says how many passes over
a source the allocation implies — > 1 means repetition.

Reference analog: the reference ranks WITHIN clusters but has no
corpus-level composition step (its corpus fits a disk); this operator
is the corpus-composition analog of its keep/delete budgeting
(dedupc.py:175-233 decides per-cluster what survives; this decides
per-source how much survives).

Scale shape: one map-side-combinable groupBy on the source key
(cardinality = number of domains, tiny), then a broadcast of the
one-row total — no second full shuffle of data rows.  Everything is
JVM column algebra (whole-stage codegen), SQL-mirrorable exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicator_spark.functions.quality import n_tokens


def domain_mix(
    docs: DataFrame,
    key: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
    budget_tokens: int = 1_000_000,
) -> DataFrame:
    """Per-source mixing weights and token allocations.

    Returns ``(source, n_docs, raw_tokens, mix_weight, alloc_tokens,
    epochs)`` where ``mix_weight = raw_tokens^alpha / sum(raw_tokens^
    alpha)`` (rounded to 6 dp), ``alloc_tokens = round(mix_weight *
    budget_tokens)`` and ``epochs = round(alloc_tokens / raw_tokens,
    4)``.

    ``alloc_tokens`` derives from the ROUNDED weight so the value is a
    pure function of the printed weight — an oracle recomputing from
    the same rounded weight gets the identical integer.
    """
    per = (
        docs.groupBy(F.col(key).alias("source"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens(text_col)).alias("raw_tokens"),
        )
        .withColumn("scaled", F.pow(F.col("raw_tokens").cast("double"), F.lit(float(alpha))))
    )
    total = per.agg(F.sum("scaled").alias("z"))
    out = per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "raw_tokens",
        F.round(F.col("scaled") / F.col("z"), 6).alias("mix_weight"),
    )
    return out.select(
        "source",
        "n_docs",
        "raw_tokens",
        "mix_weight",
        F.round(F.col("mix_weight") * F.lit(int(budget_tokens)), 0)
        .cast("long")
        .alias("alloc_tokens"),
    ).withColumn(
        "epochs",
        F.round(F.col("alloc_tokens") / F.col("raw_tokens"), 4),
    )
