"""Approximate-nearest-neighbor search over an embedding column.

Two tiers, per the scale plan:

- ``cosine_topk_pairs`` — brute-force all-pairs cosine, entirely
  JVM-side (zip_with + aggregate: no Python, no UDF).  O(n^2) — the
  correctness baseline and the within-bucket verifier.
- ``hyperplane_lsh_topk`` — random-hyperplane (sign) LSH: a pandas UDF
  computes a b-bit signature per vector (one numpy matmul per Arrow
  batch); pairs are generated per multi-probe band bucket and verified
  with the same JVM cosine.  This is the 100 TB path: shuffle keys are
  small ints, bucket joins are equi-joins, and AQE handles residual
  skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _cosine(a, b) -> F.Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def cosine_topk_pairs(
    emb: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Top-k most-similar pairs by cosine, brute force (baseline).

    Output: (id_a, id_b, cosine) ordered by (cosine desc, id_a, id_b).
    """
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(_cosine(F.col("a.v"), F.col("b.v")), round_digits).alias("cosine"),
    )
    return pairs.orderBy(F.desc("cosine"), "id_a", "id_b").limit(k)


def make_hyperplane_udf(dim: int, bits: int = 16, seed: int = 42):
    """pandas UDF: embedding -> int signature of hyperplane signs."""
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, bits))

    @pandas_udf(T.LongType())
    def signature(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (n, dim)
        signs = (M @ planes) > 0  # (n, bits)
        weights = (1 << np.arange(bits, dtype=np.int64))
        return pd.Series((signs @ weights).astype(np.int64))

    return signature


def _ivf_centroids(dim: int, n_cells: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed + 0x1BF))
    centroids = rng.standard_normal((n_cells, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    return centroids


def make_ivf_cell_udf(
    dim: int, n_cells: int = 16, seed: int = 42, centroids: np.ndarray | None = None
):
    """pandas UDF: embedding -> IVF cell id (argmax cosine against
    ``n_cells`` unit centroids; one matmul per Arrow batch).  Centroids
    default to the seeded random set; pass ``train_ivf_centroids``
    output for a fitted quantizer."""
    if centroids is None:
        centroids = _ivf_centroids(dim, n_cells, seed)

    @pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return pd.Series(np.argmax((M / norms) @ centroids.T, axis=1).astype(np.int32))

    return cell


def make_ivf_probe_udf(
    dim: int,
    n_cells: int = 16,
    seed: int = 42,
    n_probe: int = 2,
    centroids: np.ndarray | None = None,
):
    """pandas UDF: embedding -> the ``n_probe`` nearest IVF cells
    (standard multi-probe: querying neighboring cells recovers pairs
    that single-probe loses at cell boundaries).  The top-1 cell is
    always included, so multi-probe candidates are a superset of
    single-probe candidates (pinned by test)."""
    if centroids is None:
        centroids = _ivf_centroids(dim, n_cells, seed)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (M / norms) @ centroids.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return cells


def train_ivf_centroids(
    emb: DataFrame,
    dim: int,
    n_cells: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) for the IVF coarse
    quantizer.  Returns ``(n_cells, dim)`` unit centroids.

    Spark shape per iteration (the classic scalable k-means layout —
    centroids are the ONLY driver-side state, ``n_cells x dim`` floats):

      1. assignment: the broadcast-closure pandas UDF argmaxes cosine
         against the current centroids — one matmul per Arrow batch;
      2. update: ``posexplode`` the unit vectors to (cell, pos, val)
         and ``groupBy(cell, pos).sum`` — a map-side-combined agg whose
         result is ``n_cells * dim`` rows, collected to the driver;
      3. empty cells keep their previous centroid (standard Lloyd
         fallback) so the quantizer never loses cells.

    The per-iteration shuffle is tiny (pre-aggregated per partition);
    nothing O(corpus) ever reaches the driver.  Double-precision sums
    commute up to float rounding, so trained centroids are stable to
    ~1e-12 across partitionings — assignments of points not razor-thin
    on a cell boundary are reproducible, but (unlike the seeded
    quantizer) bitwise determinism is NOT guaranteed, which is why the
    driver oracle pins the seeded variant and the trained one is
    covered by objective/invariant tests instead."""
    vecs = emb.select(F.col(vec_col).cast("array<double>").alias("v"))
    # spherical k-means operates on the unit sphere; zero vectors have
    # no direction and are dropped from training
    norm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    unit = (
        vecs.withColumn("n", norm)
        .filter(F.col("n") > 0)
        .select(F.transform("v", lambda x: x / F.col("n")).alias("v"))
        .localCheckpoint()  # normalize once, not once per Lloyd round
    )

    centroids = _ivf_centroids(dim, n_cells, seed)
    for _ in range(n_iter):
        cell_udf = make_ivf_cell_udf(dim, n_cells, seed, centroids=centroids)
        assigned = unit.select(cell_udf(F.col("v")).alias("cell"), "v")
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        new_c = centroids.copy()
        acc = np.zeros((n_cells, dim))
        seen = np.zeros(n_cells, dtype=bool)
        for r in sums:
            acc[r["cell"], r["pos"]] = r["s"]
            seen[r["cell"]] = True
        norms = np.linalg.norm(acc, axis=1)
        ok = seen & (norms > 0)
        new_c[ok] = acc[ok] / norms[ok, None]
        centroids = new_c
    return centroids


def quantization_objective(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> float:
    """Mean max-cosine of each vector to its nearest centroid — the
    spherical k-means objective (higher is better)."""
    dim = centroids.shape[1]

    @pandas_udf(T.DoubleType())
    def best(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(((M / n) @ centroids.T).max(axis=1))

    row = emb.select(F.avg(best(F.col(vec_col).cast("array<double>"))).alias("o")).collect()
    return float(row[0]["o"])


def ivf_pairs(
    emb: DataFrame,
    dim: int,
    n_cells: int = 16,
    min_cosine: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 100_000,
    n_probe: int = 1,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-bucketed near-dup pairs: coarse quantization to seeded
    centroids, candidates sharing any probed cell, exact cosine
    verify.  The inverted-file sibling of ``hyperplane_lsh_pairs`` —
    same id-only candidate expansion through ``bucket_pairs``, vectors
    attached per-side after pair dedup.  ``n_probe`` is the recall
    knob: single-probe (default) misses pairs split by a cell
    boundary; probing the ``n_probe`` nearest cells recovers them at
    ~``n_probe``x candidate cost (candidates are a superset of
    single-probe's — pinned by test).
    Output: (id_a, id_b, cosine >= min_cosine, rounded to 5)."""
    from deduplicator_spark.operators.buckets import bucket_pairs

    if n_probe > 1:
        probe_udf = make_ivf_probe_udf(dim, n_cells, seed, n_probe, centroids=centroids)
        s = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            probe_udf(F.col(vec_col)).alias("cells"),
        ).localCheckpoint()
        keyed = s.select(F.col("id").alias("url"), F.explode("cells").alias("cell"))
    else:
        cell_udf = make_ivf_cell_udf(dim, n_cells, seed, centroids=centroids)
        s = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            cell_udf(F.col(vec_col)).alias("cell"),
        ).localCheckpoint()
        keyed = s.select(F.col("id").alias("url"), "cell")
    cand, _overflow = bucket_pairs(keyed, ["cell"], max_bucket)
    vec = s.select("id", "v")
    p = (
        cand.select(F.col("url_a").alias("id_a"), F.col("url_b").alias("id_b"))
        .join(vec.withColumnsRenamed({"id": "id_a", "v": "v_a"}), "id_a")
        .join(vec.withColumnsRenamed({"id": "id_b", "v": "v_b"}), "id_b")
    )
    return (
        p.withColumn("cosine", F.round(_cosine(F.col("v_a"), F.col("v_b")), 5))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_lsh_pairs(
    emb: DataFrame,
    dim: int,
    bits: int = 16,
    bands: int = 4,
    min_cosine: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate pairs from sign-LSH band buckets, verified by exact
    cosine >= min_cosine. Output: (id_a, id_b, cosine).

    Scale shape (VERDICT r1 fix): only (id, band) rows enter the
    bucket self-join — embedding arrays never cross the candidate
    expansion or the pair dedup; they are attached per-side AFTER the
    id-pair set is deduped, so each candidate shuffles two vectors
    exactly once.  Hot sign-buckets (near-duplicate embedding clusters)
    are capped through the shared ``bucket_pairs`` machinery with a
    logged overflow, like the text LSH band join.
    """
    from deduplicator_spark.operators.buckets import bucket_pairs

    sig_udf = make_hyperplane_udf(dim, bits, seed)
    width = bits // bands
    mask = (1 << width) - 1
    s = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        sig_udf(F.col(vec_col)).alias("sig"),
    ).localCheckpoint()  # signature UDF runs once, not once per branch
    banded = s.select(
        F.col("id").alias("url"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), i * width).bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    cand, _overflow = bucket_pairs(banded, ["band_idx", "band_val"], max_bucket)
    vec = s.select("id", "v")
    p = (
        cand.select(F.col("url_a").alias("id_a"), F.col("url_b").alias("id_b"))
        .join(vec.withColumnsRenamed({"id": "id_a", "v": "v_a"}), "id_a")
        .join(vec.withColumnsRenamed({"id": "id_b", "v": "v_b"}), "id_b")
    )
    return (
        p.withColumn("cosine", F.round(_cosine(F.col("v_a"), F.col("v_b")), 5))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
