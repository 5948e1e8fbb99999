"""Exact grouped quantiles (functions/quantiles.py) vs a sorted-list
reference."""

from __future__ import annotations

import math
import random

from deduplicator_spark.functions.quantiles import grouped_quantiles


def _ref_quantile(values: list[int], q: float) -> int:
    """Element at 1-based sorted position ceil(q*N) — the definition
    the operator implements."""
    s = sorted(values)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def test_grouped_quantiles_hand_case(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [("b", 7)],
        ["g", "value"],
    )
    out = {
        (r["g"], r["q"]): r["value"]
        for r in grouped_quantiles(df, "g", "value", qs=(0.5, 0.9)).collect()
    }
    assert out[("a", 0.5)] == 5  # ceil(0.5*10) = 5th element
    assert out[("a", 0.9)] == 9
    assert out[("b", 0.5)] == 7  # single-element group


def test_grouped_quantiles_matches_reference_fuzz(spark):
    rng = random.Random(11)
    rows = []
    data: dict[str, list[int]] = {"x": [], "y": [], "z": []}
    for _ in range(3000):
        g = rng.choice("xyz")
        v = rng.randint(0, 50)  # heavy ties — exercises the compression
        rows.append((g, v))
        data[g].append(v)
    df = spark.createDataFrame(rows, ["g", "value"]).repartition(13)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    out = {
        (r["g"], r["q"]): r["value"]
        for r in grouped_quantiles(df, "g", "value", qs=qs).collect()
    }
    for g, vals in data.items():
        for q in qs:
            assert out[(g, q)] == _ref_quantile(vals, q), (g, q)


def test_grouped_quantiles_shuffles_compressed_rows(spark):
    """The plan must aggregate (group, value) BEFORE any window sort —
    i.e. a partial HashAggregate precedes the first exchange, so the
    shuffle carries distinct values, not raw rows."""
    df = spark.range(100000).selectExpr("'g' AS g", "CAST(id % 7 AS LONG) AS value")
    plan = grouped_quantiles(df, "g", "value")._sc._jvm.PythonSQLUtils.explainString(
        grouped_quantiles(df, "g", "value")._jdf.queryExecution(), "formatted"
    )
    first_exchange = plan.index("Exchange")
    first_agg = plan.index("HashAggregate")
    assert first_agg < first_exchange or "partial_count" in plan[:first_exchange]
