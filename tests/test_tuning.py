"""LSH parameter planning (functions/tuning.py)."""

from __future__ import annotations

import math

import pytest

from deduplicator_spark.functions.tuning import (
    collision_curve,
    collision_probability,
    optimal_band_rows,
    pow_int_sql,
)


def test_collision_probability_matches_closed_form():
    for s in (0.1, 0.5, 0.8, 0.95):
        for b, r in ((32, 4), (16, 8), (8, 16), (1, 1)):
            expected = 1.0 - (1.0 - s**r) ** b
            assert collision_probability(s, b, r) == pytest.approx(expected, abs=1e-12)


def test_curve_monotonic_and_bounded(spark):
    rows = collision_curve(spark, 32, 4).orderBy("s_centi").collect()
    assert len(rows) == 99
    ps = [r["p_collision"] for r in rows]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert ps == sorted(ps)  # S-curve is monotone increasing
    # the half-crossing sits at s_half = (1 - 0.5^(1/b))^(1/r), within
    # one grid step
    s_half = (1.0 - 0.5 ** (1.0 / 32.0)) ** 0.25
    first_above = next(r["s"] for r in rows if r["above_half"])
    assert abs(first_above - s_half) <= 0.0101


def test_curve_matches_python_reference(spark):
    """Spark chain arithmetic == pure-python chain arithmetic, bitwise."""
    rows = collision_curve(spark, 32, 4).collect()
    for r in rows:
        assert r["p_collision"] == collision_probability(r["s"], 32, 4)


def test_pow_int_sql_chain():
    import duckdb

    con = duckdb.connect()
    for n in (1, 2, 3, 4, 7, 32):
        # bare 0.9 is DECIMAL in DuckDB — the oracle always works on a
        # DOUBLE-typed operand, so cast here too
        got = con.sql(f"SELECT {pow_int_sql('CAST(0.9 AS DOUBLE)', n)}").fetchone()[0]
        # DuckDB chain == python chain, bitwise
        from deduplicator_spark.functions.tuning import _pow_int_float

        assert got == _pow_int_float(0.9, n)


def test_optimal_band_rows():
    b_lo, r_lo = optimal_band_rows(128, 0.3)
    b_hi, r_hi = optimal_band_rows(128, 0.9)
    assert b_lo * r_lo == 128 and b_hi * r_hi == 128
    # higher thresholds demand longer rows (steeper curve further right)
    assert r_hi > r_lo
    # at the default verify threshold the planner wants rows at least
    # as long as the frozen config's (recall-biased configs use fewer)
    b_def, r_def = optimal_band_rows(128, 0.8)
    assert r_def >= 4 and b_def * r_def == 128
    # recall-weighted planning pushes toward more bands / shorter rows
    b_rec, r_rec = optimal_band_rows(128, 0.8, fp_weight=0.1, fn_weight=0.9)
    assert r_rec <= r_def
    with pytest.raises(ValueError):
        optimal_band_rows(128, 1.5)


def test_s_curve_interpretation():
    """At the configured verify threshold the default config is
    high-recall: p(collide) at j=0.8 must exceed 0.999 (the basis of
    the recall >= 0.99 north-rule claim)."""
    assert collision_probability(0.8, 32, 4) > 0.999
    # and boilerplate-level similarity (0.3) rarely collides
    assert collision_probability(0.3, 32, 4) < 0.25
    assert math.isclose(collision_probability(1.0, 32, 4), 1.0)
