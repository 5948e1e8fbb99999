"""LSH parameter planning: the band/row collision S-curve.

For MinHash-LSH with ``b`` bands of ``r`` rows, two documents with
shingle-Jaccard ``s`` collide in at least one band with probability

    p(s) = 1 - (1 - s^r)^b

Choosing (b, r) IS the engine's precision/recall dial (the analog of
the reference's single ``hashsize`` fuzziness knob, dedupc.py:586) —
this module makes the dial inspectable and plannable:

- ``collision_curve`` — the p(s) table for a config as a DataFrame,
  computed with **multiplication-only square-and-multiply chains**
  (no ``pow``): ``pow`` is not guaranteed correctly rounded and can
  differ between the JVM and other libm builds, while IEEE-754
  multiplication is exact-rounded everywhere — so the Spark plan and
  the DuckDB oracle produce bit-identical doubles.
- ``collision_probability`` — the same chain in pure Python (shares
  the arithmetic shape, used by tests and the planner).
- ``optimal_band_rows`` — pick (b, r) for a target Jaccard threshold
  by minimizing the weighted false-positive/false-negative area under
  the S-curve (the standard planning integral, as popularized by the
  public datasketch library's ``_optimal_param``; implemented from the
  math, not the code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _pow_int_col(col: F.Column, n: int) -> F.Column:
    """col ** n by square-and-multiply (multiplications only)."""
    if n < 1:
        raise ValueError("exponent must be >= 1")
    if n == 1:
        return col
    half = _pow_int_col(col, n // 2)
    sq = half * half
    return sq * col if n % 2 else sq


def pow_int_sql(expr: str, n: int) -> str:
    """The same square-and-multiply chain as a SQL expression string —
    structurally identical association order, so a conforming SQL
    engine reproduces ``_pow_int_col`` bit-for-bit."""
    if n < 1:
        raise ValueError("exponent must be >= 1")
    if n == 1:
        return expr
    half = pow_int_sql(expr, n // 2)
    sq = f"({half} * {half})"
    return f"({sq} * {expr})" if n % 2 else sq


def _pow_int_float(x: float, n: int) -> float:
    if n == 1:
        return x
    half = _pow_int_float(x, n // 2)
    sq = half * half
    return sq * x if n % 2 else sq


def collision_probability(s: float, b: int, r: int) -> float:
    """p(s) = 1 - (1 - s^r)^b, multiplication-chain arithmetic."""
    return 1.0 - _pow_int_float(1.0 - _pow_int_float(s, r), b)


def collision_curve(
    spark: SparkSession, b: int, r: int, step_centi: int = 1
) -> DataFrame:
    """The S-curve sampled at s = 0.01..0.99.

    Output: (s_centi int, s double, p_collision double, above_half
    boolean) — ``above_half`` brackets the config's effective
    threshold (p crosses 0.5 near ``(1/b)^(1/r)``).
    """
    s = F.col("s_centi").cast("double") / F.lit(100.0)
    p = F.lit(1.0) - _pow_int_col(F.lit(1.0) - _pow_int_col(s, r), b)
    return (
        spark.range(1, 100, step_centi)
        .select(F.col("id").cast("int").alias("s_centi"))
        .withColumn("s", s)
        .withColumn("p_collision", p)
        .withColumn("above_half", F.col("p_collision") >= F.lit(0.5))
    )


def collision_curve_sql(b: int, r: int, step_centi: int = 1) -> str:
    """ANSI-SQL oracle for ``collision_curve`` (same chains)."""
    s = "(CAST(s_centi AS DOUBLE) / 100.0)"
    p = f"(1.0 - {pow_int_sql(f'(1.0 - {pow_int_sql(s, r)})', b)})"
    return f"""
        SELECT CAST(s_centi AS INT) AS s_centi,
               {s} AS s,
               {p} AS p_collision,
               {p} >= 0.5 AS above_half
        FROM (SELECT unnest(generate_series(1, 99, {step_centi})) AS s_centi)
    """


def optimal_band_rows(
    num_perm: int,
    threshold: float,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
    grid: int = 200,
) -> tuple[int, int]:
    """(bands, rows_per_band) minimizing weighted FP+FN S-curve area.

    false_positive_area = integral_0^t p(s) ds (collisions below the
    threshold), false_negative_area = integral_t^1 (1 - p(s)) ds
    (misses above it); Riemann sums on ``grid`` points.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best, best_err = (1, num_perm), float("inf")
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        fp = fn = 0.0
        n_lo = max(1, int(grid * threshold))
        for i in range(n_lo):
            s = threshold * (i + 0.5) / n_lo
            fp += collision_probability(s, b, r) * threshold / n_lo
        n_hi = max(1, grid - n_lo)
        for i in range(n_hi):
            s = threshold + (1.0 - threshold) * (i + 0.5) / n_hi
            fn += (1.0 - collision_probability(s, b, r)) * (1.0 - threshold) / n_hi
        err = fp_weight * fp + fn_weight * fn
        if err < best_err:
            best, best_err = (b, r), err
    return best
