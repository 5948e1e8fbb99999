"""Soft dedup: weights sum to 1 per content, deterministic keeps."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.operators.softdedup import (
    soft_dedup_summary,
    soft_dedup_weights,
)


def _docs(spark, n=400):
    # content c{id % 100}: ids 0..99 appear 4x each -> multiplicity 4
    # for every row; add 100 unique tails -> multiplicity 1
    base = spark.range(n).selectExpr(
        "id AS doc_id", "concat('c', CAST(id % 100 AS STRING)) AS text"
    )
    uniq = spark.range(100).selectExpr(
        "id + 1000 AS doc_id", "concat('u', CAST(id AS STRING)) AS text"
    )
    return base.unionByName(uniq)


def test_multiplicity_and_weights(spark):
    w = soft_dedup_weights(_docs(spark)).collect()
    by_id = {r.doc_id: r for r in w}
    assert len(by_id) == 500
    for i in range(400):
        assert by_id[i].multiplicity == 4
        assert abs(by_id[i].sample_weight - 0.25) < 1e-9
    for i in range(1000, 1100):
        assert by_id[i].multiplicity == 1
        assert by_id[i].sample_weight == 1.0
        assert by_id[i].kept == 1  # multiplicity-1 docs are always kept


def test_keep_is_deterministic_and_tracks_weight(spark):
    docs = _docs(spark, 4000)  # 100 contents x 40 copies + 100 uniques
    a = soft_dedup_weights(docs).collect()
    b = soft_dedup_weights(docs.repartition(13)).collect()
    assert sorted((r.doc_id, r.kept) for r in a) == sorted(
        (r.doc_id, r.kept) for r in b
    )
    # realized keep count per 40-copy content ~ 1 expected; over 100
    # contents the total concentrates: E=100, sd~10
    kept_dup = sum(r.kept for r in a if r.multiplicity == 40)
    assert 60 <= kept_dup <= 140, kept_dup


def test_summary_accounting(spark):
    w = soft_dedup_weights(_docs(spark))
    s = {r.multiplicity: r for r in soft_dedup_summary(w).collect()}
    assert set(s) == {1, 4}
    assert s[1].n_docs == 100 and s[1].expected_kept == 100.0
    assert s[4].n_docs == 400 and abs(s[4].expected_kept - 100.0) < 1e-6
    assert s[1].actual_kept == 100
    # plan shape: no UDF anywhere in the weights computation
    assert "BatchEvalPython" not in w._jdf.queryExecution().executedPlan().toString()
