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


def test_contamination_check(spark):
    from deduplicator_spark.operators.segments import contamination_check, word_ngram_hashes
    from pyspark.sql import functions as F2

    bench = "q1 q2 q3 q4 q5 q6 q7 q8"  # the "benchmark" text: one 8-gram
    rows = [
        (1, bench + " extra trailing words here"),  # contains the probe
        (2, "clean doc with none of the probe grams inside it"),
        (3, bench),  # exactly the probe
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    probes = spark.createDataFrame([(bench,)], "text string").select(
        F2.explode(word_ngram_hashes("text", 8)).alias("gram_md5")
    )
    out = {r.doc_id: r for r in contamination_check(docs, probes, key="doc_id", n=8).collect()}
    assert set(out) == {1, 3}
    assert (out[3].n_matched_ngrams, out[3].n_distinct_probes) == (1, 1)
    assert out[1].n_distinct_probes == 1


def test_gopher_quality_filter(spark):
    from deduplicator_spark.operators.segments import gopher_quality_filter

    rows = [
        (1, " ".join(f"word{i}" for i in range(60))),  # clean -> keep
        (2, "short doc only"),  # too_short
        (3, " ".join("ab cd".split() * 40)),  # short words + repetition
        (4, " ".join(["pneumonoultramicroscopic"] * 60)),  # long words + repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_filter(df, key="doc_id").collect()}
    assert out[1].keep and out[1].reasons == ""
    assert not out[2].keep and out[2].reasons == "too_short"
    assert out[3].reasons == "word_length,repetition"
    assert out[4].reasons == "word_length,repetition"
    assert out[4].mean_word_len == pytest.approx(24.0)


def test_boilerplate_segments(spark):
    from deduplicator_spark.operators.segments import boilerplate_segments

    rows = [(i, SHARED + f" unique{i} " + " ".join(f"w{i}_{j}" for j in range(9)))
            for i in range(5)]
    # a second segment shared by only 2 docs — below min_docs=3
    rows += [(10, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),
             (11, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_segments(df, key="doc_id", w=10, min_docs=3, k=20).collect()
    assert len(out) == 1
    assert (out[0].n_docs, out[0].n_occurrences) == (5, 5)


def test_windowed_dedup(spark):
    from datetime import datetime

    from deduplicator_spark.operators.windows import windowed_dedup

    h = lambda hh, mm: datetime(2024, 1, 1, hh, mm)  # noqa: E731
    rows = [
        # two (u1, click) events in hour 0 -> dup group, canonical id 1
        (1, h(0, 5), 1, "click"),
        (2, h(0, 50), 1, "click"),
        # same key in hour 1 -> separate window, singleton (dropped)
        (3, h(1, 5), 1, "click"),
        # different key in hour 0 -> singleton (dropped)
        (4, h(0, 10), 2, "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = windowed_dedup(df, time_col="ts", keys=("user_id", "event_type"), window="1 hour").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.event_type, r.canonical_event_id, r.n_events) == (1, "click", 1, 2)
    assert r.window_start == h(0, 0)


def test_windowed_dedup_on_stream(spark, tmp_path):
    """The same windowed_dedup body must run unchanged on a readStream
    frame and agree with the batch result."""
    from datetime import datetime

    from deduplicator_spark.operators.windows import windowed_dedup

    h = lambda hh, mm: datetime(2024, 1, 1, hh, mm)  # noqa: E731
    rows = [
        (1, h(0, 5), 1, "click"),
        (2, h(0, 50), 1, "click"),
        (3, h(1, 5), 1, "click"),
        (4, h(1, 40), 1, "click"),
        (5, h(0, 10), 2, "view"),
        (6, h(0, 20), 2, "view"),
        (7, h(0, 30), 2, "view"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    batch_df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "events_src")
    batch_df.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
    )
    q = (
        windowed_dedup(stream, time_col="ts", keys=("user_id", "event_type"), window="1 hour")
        .writeStream.format("memory")
        .queryName("wdedup_stream_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.table("wdedup_stream_test").collect())
    finally:
        q.stop()
    want = sorted(
        tuple(r)
        for r in windowed_dedup(
            batch_df, time_col="ts", keys=("user_id", "event_type"), window="1 hour"
        ).collect()
    )
    assert got == want
    assert len(got) == 3  # (u1 h0), (u1 h1), (u2 h0)


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
