"""Segment dedup + intra-doc repetition operators (hand-computed fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.operators.segments import (
    duplicate_segment_stats,
    intra_doc_repetition,
    segment_hashes,
)

SHARED = "one two three four five six seven eight nine ten"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # A and B share the first 10-word window; their second windows differ
        (1, SHARED + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, SHARED + " lambda mu nu xi omicron pi rho sigma tau upsilon"),
        # C: unique 10-word window
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        # D: too short for any segment
        (4, "just a few words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_hashes_counts(docs):
    out = docs.select("doc_id", F.size(segment_hashes("text", 10)).alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    assert got == {1: 2, 2: 2, 3: 1, 4: 0}


def test_duplicate_segment_stats(docs):
    out = {
        r.doc_id: r
        for r in duplicate_segment_stats(docs, key="doc_id", w=10, min_docs=2).collect()
    }
    # only A and B have a shared segment; exactly 1 of their 2 windows
    assert set(out) == {1, 2}
    for doc_id in (1, 2):
        r = out[doc_id]
        assert (r.n_segments, r.n_dup_segments) == (2, 1)
        assert r.dup_segment_ratio == pytest.approx(0.5)


def test_duplicate_segment_stats_case_and_ws_normalized(spark):
    rows = [(1, SHARED), (2, "  " + SHARED.upper().replace(" ", "   ") + " ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_segment_stats(df, key="doc_id", w=10).collect()
    assert {r.doc_id for r in out} == {1, 2}


def test_intra_doc_repetition(spark):
    rows = [
        (1, "a b c a b c a b c"),  # 7 trigrams, 3 distinct -> 1 - 3/7
        (2, "u1 u2 u3 u4 u5"),  # all distinct -> 0.0
        (3, "x y"),  # too short -> 0 ngrams, frac 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in intra_doc_repetition(df, key="doc_id", n=3).collect()}
    assert (out[1].n_ngrams, out[1].n_distinct_ngrams) == (7, 3)
    assert out[1].dup_ngram_frac == pytest.approx(round(1 - 3 / 7, 4))
    assert out[2].dup_ngram_frac == 0.0
    assert (out[3].n_ngrams, out[3].dup_ngram_frac) == (0, 0.0)
