"""Soft deduplication — down-weighting duplicates instead of deleting.

Hard dedup (the reference's keep-first policy: one keeper per cluster,
the rest deleted — dedupc.py:331-341) removes all-but-one copy of each
duplicated content.  Soft dedup keeps every row but assigns a sampling
weight ``1/multiplicity`` so each unique CONTENT contributes ~one
expected copy to the training stream — the down-weighting view of
dedup that data-curation pipelines use when provenance diversity
matters more than byte savings (a page mirrored on 40 hosts should
still be able to appear from any of them, just not 40 times).

The operator also materializes a deterministic realization of that
weight: ``kept = sample_bucket(key) * multiplicity < granularity``,
i.e. each row is kept with probability ~1/multiplicity as a pure
integer function of (key, multiplicity).  No RNG anywhere — the
selection is stable across re-runs, partitionings and engines (DuckDB
reproduces the md5-derived bucket bit-for-bit), which is what makes
the result oracle-checkable and a resume-safe pipeline stage.

Scale shape (100 TB posture): one map-side-combined count on the
32-byte md5 digest + an equi-join back on that digest; the keep
decision is a per-row JVM expression (no UDF, no extra shuffle).
Multiplicity skew is bounded by construction — the join key IS the
content hash, and a 10^6-copy boilerplate page is one count row
joined back to its members, never a collected array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.shards import sample_bucket


def soft_dedup_weights(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    granularity: int = 10_000,
) -> DataFrame:
    """Per-doc duplicate multiplicity, sampling weight and a
    deterministic keep decision.

    Returns ``(key, multiplicity, sample_weight, kept)`` where

    - ``multiplicity``  = number of byte-identical copies of this text,
    - ``sample_weight`` = round(1/multiplicity, 6) — the weight a
      trainer-side sampler applies so expected copies per content = 1,
    - ``kept``          = 1 iff ``sample_bucket(key) * multiplicity <
      granularity`` — a concrete down-sampled corpus realizing the
      weight (each content keeps ~1 expected member, chosen by the
      key's md5 bucket, so the choice is uniform over members and
      independent across contents).

    Exactness: within one content-cluster the buckets of distinct keys
    are iid-uniform over [0, granularity), so E[kept members] =
    multiplicity * floor-ish(granularity/multiplicity)/granularity ~ 1
    (bias < multiplicity/granularity; at the default granularity the
    realized rate is within 1e-4 of 1/multiplicity).
    """
    hashed = docs.select(F.col(key), F.md5(F.col(text_col)).alias("content_md5"))
    sizes = hashed.groupBy("content_md5").agg(F.count("*").alias("multiplicity"))
    return hashed.join(sizes, "content_md5").select(
        F.col(key),
        "multiplicity",
        F.round(F.lit(1.0) / F.col("multiplicity"), 6).alias("sample_weight"),
        (
            (sample_bucket(key, granularity) * F.col("multiplicity"))
            < F.lit(granularity)
        )
        .cast("int")
        .alias("kept"),
    )


def soft_dedup_summary(weights: DataFrame) -> DataFrame:
    """Accounting roll-up of a :func:`soft_dedup_weights` result:
    one row per multiplicity with ``(multiplicity, n_docs,
    expected_kept, actual_kept)`` — the audit that the deterministic
    realization tracks the weights (expected_kept = sum of
    sample_weight; divergence beyond granularity error means the key
    column is not unique).  Map-side-combinable single agg.
    """
    return (
        weights.groupBy("multiplicity")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("sample_weight"), 3).alias("expected_kept"),
            F.sum("kept").alias("actual_kept"),
        )
        .orderBy("multiplicity")
    )
