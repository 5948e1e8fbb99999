"""Domain mixing-weight allocation (operators/mixing.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from deduplicator_spark.operators.mixing import domain_mix


def _fixture(spark):
    rows = []
    # three sources with very different volumes: 60 / 30 / 3 docs
    for i in range(60):
        rows.append((f"big{i}", "web", "alpha beta gamma delta " * 10))
    for i in range(30):
        rows.append((f"mid{i}", "books", "lorem ipsum dolor sit " * 10))
    for i in range(3):
        rows.append((f"tiny{i}", "wiki", "small tail source text " * 10))
    return spark.createDataFrame(rows, "doc_id string, source string, text string")


def test_domain_mix_invariants(spark):
    docs = _fixture(spark)
    out = domain_mix(docs, alpha=0.5, budget_tokens=1_000_000).collect()
    by = {r["source"]: r.asDict() for r in out}
    assert set(by) == {"web", "books", "wiki"}
    assert by["web"]["n_docs"] == 60 and by["wiki"]["n_docs"] == 3
    # weights sum to ~1, allocations to ~budget (rounding slack)
    assert abs(sum(r["mix_weight"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["alloc_tokens"] for r in out) - 1_000_000) < 10
    # alloc is a pure function of the printed weight
    for r in out:
        assert r["alloc_tokens"] == round(r["mix_weight"] * 1_000_000)
        assert r["epochs"] == round(r["alloc_tokens"] / r["raw_tokens"], 4)


def test_domain_mix_alpha_semantics(spark):
    docs = _fixture(spark)
    nat = {r["source"]: r for r in domain_mix(docs, alpha=1.0).collect()}
    cool = {r["source"]: r for r in domain_mix(docs, alpha=0.5).collect()}
    total = sum(r["raw_tokens"] for r in nat.values())
    # alpha=1 reproduces natural token proportions
    for s, r in nat.items():
        assert math.isclose(r["mix_weight"], r["raw_tokens"] / total, abs_tol=2e-6)
    # alpha<1 upweights the tail source and downweights the head
    assert cool["wiki"]["mix_weight"] > nat["wiki"]["mix_weight"]
    assert cool["web"]["mix_weight"] < nat["web"]["mix_weight"]
    # tail repetition shows up as epochs > head epochs
    assert cool["wiki"]["epochs"] > cool["web"]["epochs"]


def test_domain_mix_single_data_shuffle(spark):
    """One hash-partitioned agg over data rows; the global total joins
    back via broadcast — no second full shuffle of data rows."""
    plan = domain_mix(_fixture(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # per-source agg (+AQE reuse)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_count" in plan or "partial" in plan.lower()
