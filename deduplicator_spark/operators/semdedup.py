"""SemDeDup-style semantic pruning over an embedding column.

Lexical dedup (MinHash/SimHash/substring) cannot see paraphrases;
SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates by clustering embeddings, electing one representative per
cluster, and pruning members whose cosine to the representative
exceeds a threshold.

Spark-first shape, two deliberate deviations from the paper for
reproducibility at scale:

- **cells = seeded sign-LSH buckets**, not k-means: the paper's
  k-means step is iterative and seed-path-dependent across cluster
  sizes; a hyperplane signature is a single Arrow-batched matmul per
  partition, embarrassingly parallel, and byte-for-byte deterministic
  — which is what lets the driver oracle replay the whole operator in
  SQL against the golden signature table.  (The reference's analog of
  a perceptual cell is the image-hash key itself, dedupc.py:586.)
- **representative = min id**, not max-centroid-cosine: deterministic
  under input permutation and computable with one map-side-combined
  ``min`` — no second pass over vectors.

Scale notes: only (id, bucket) pairs cross the election shuffle;
vectors are attached per side AFTER the member→representative edges
exist, so each vector ships at most twice (the VERDICT-r1 ANN fix,
applied from the start).  The representative table is one row per
non-empty bucket (<= 2^bucket_bits) — broadcastable by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicator_spark.operators.ann import _cosine, make_hyperplane_udf


def semantic_prune(
    emb: DataFrame,
    dim: int,
    bits: int = 16,
    bucket_bits: int = 6,
    min_cosine: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Per-document semantic-prune decision table.

    Buckets = low ``bucket_bits`` of the ``bits``-bit hyperplane
    signature (low bits first => coarser bucketing reuses the same
    planes as the full ANN signature, so one UDF pass serves both and
    the golden signature table oracles both).  Output, one row per
    NON-representative document:

        (vec_id, bucket, rep_id, cosine, action)

    action = 'prune' when cosine(v, v_rep) >= min_cosine else 'keep'.
    Representatives never appear as rows — they are always kept.
    """
    if not 1 <= bucket_bits <= bits:
        raise ValueError("bucket_bits must be in [1, bits]")
    sig_udf = make_hyperplane_udf(dim, bits, seed)
    s = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            sig_udf(F.col(vec_col)).alias("sig"),
        )
        .withColumn("bucket", F.col("sig").bitwiseAND(F.lit((1 << bucket_bits) - 1)))
        .localCheckpoint()  # one UDF pass feeds election, edges and vectors
    )
    reps = s.groupBy("bucket").agg(F.min("id").alias("rep_id"))
    members = (
        s.select("bucket", "id")
        .join(reps, "bucket")
        .filter(F.col("id") != F.col("rep_id"))
    )
    vec = s.select("id", "v")
    edges = members.join(
        vec.withColumnsRenamed({"v": "v_m"}), "id"
    ).join(
        vec.withColumnsRenamed({"id": "rep_id", "v": "v_r"}), "rep_id"
    )
    cosine = F.round(_cosine(F.col("v_m"), F.col("v_r")), 5)
    return edges.select(
        F.col("id").alias(id_col),
        "bucket",
        "rep_id",
        cosine.alias("cosine"),
        F.when(cosine >= F.lit(min_cosine), F.lit("prune"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


def semantic_prune_summary(decisions: DataFrame) -> DataFrame:
    """Roll the decision table up to (action, n_docs, mean_cosine)."""
    return decisions.groupBy("action").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("cosine"), 5).alias("mean_cosine"),
    )
