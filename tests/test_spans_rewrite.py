"""Corpus-rewrite operators: duplicate-span removal (operators/spans.py)
and segment-level removal (segments.remove_duplicate_segments)."""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import functions as F

from deduplicator_spark.operators.spans import _covered_intervals, span_dedup
from deduplicator_spark.operators.segments import remove_duplicate_segments

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


# --------------------------------------------------------------------------
# span coverage unit semantics (pure numpy helper)
# --------------------------------------------------------------------------

def test_covered_intervals_basic():
    base = "x" * 10 + "the quick brown fox jumps over the lazy dog again and again" + "y" * 10
    span = "the quick brown fox jumps over the lazy dog again and again"
    # doc b embeds the 60-char span at byte 5
    nb = "a" * 5 + span + "b" * 20
    iv = _covered_intervals(nb, [base], L=50)
    assert iv == [(5, 5 + len(span))]


def test_covered_intervals_merges_overlaps():
    s1 = "alpha " * 20  # 120 chars of repeated token
    nb = s1.strip()
    # partner shares the whole thing -> one merged interval, full cover
    iv = _covered_intervals(nb, [nb], L=50)
    assert iv == [(0, len(nb.encode()))]


def test_covered_intervals_short_doc_untouched():
    assert _covered_intervals("short text", ["short text"], L=50) == []


# --------------------------------------------------------------------------
# span_dedup end-to-end vs the independent golden
# --------------------------------------------------------------------------

def test_span_dedup_matches_golden(spark, cfg):
    pages = spark.read.parquet(os.path.join(GOLDEN, "pages_n500_s42.parquet")).select(
        "url", "text"
    )
    report, overflow = span_dedup(pages, cfg)
    got = report.toPandas().sort_values("url").reset_index(drop=True)
    want = (
        pd.read_parquet(os.path.join(GOLDEN, "span_dedup_n500.parquet"))
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert overflow.count() == 0
    for c in ["orig_len", "covered_chars", "n_spans", "clean_len"]:
        got[c] = got[c].astype("int64")
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got[list(want.columns)], want)
    # the rewrite must actually fire on the fixture
    assert (want["covered_chars"] > 0).sum() >= 50


def test_span_dedup_keep_first_and_chain(spark, cfg):
    """b loses its span to a; c loses to both a and b; a keeps all."""
    span1 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    span2 = "apples bananas cherries dates elderberries figs grapes honeydew kiwis lemons"
    assert len(span1) >= 50 and len(span2) >= 50
    rows = [
        ("a", f"unique-head-a {span1} unique-tail-a"),
        ("b", f"B-prefix-text {span1} B-suffix {span2} B-end"),
        ("c", f"C-start {span2} C-finish totally distinct words here"),
        ("d", "no shared content in this one at all just filler words"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    report, _ = span_dedup(df, cfg)
    out = {r["url"]: r.asDict() for r in report.collect()}
    assert out["a"]["covered_chars"] == 0  # keep-first: min url keeps
    assert out["b"]["covered_chars"] >= len(span1)  # loses span1 to a
    assert out["b"]["covered_chars"] < out["b"]["orig_len"]
    assert out["c"]["covered_chars"] >= len(span2)  # loses span2 to b
    assert out["d"]["covered_chars"] == 0 and out["d"]["n_spans"] == 0
    for u in out:
        o = out[u]
        assert o["clean_len"] == o["orig_len"] - o["covered_chars"]


# --------------------------------------------------------------------------
# segment-level removal
# --------------------------------------------------------------------------

def _w10(words: list[str]) -> str:
    return " ".join(words)


def test_remove_duplicate_segments_keep_first(spark):
    seg = [f"w{i}" for i in range(10)]  # one shared 10-word window
    rows = [
        (1, _w10(seg + ["tail1", "tail2"])),          # first: keeps
        (2, _w10(seg + ["other", "words", "here"])),  # loses the window
        (3, _w10(["solo"] * 10)),                      # unshared window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in remove_duplicate_segments(df).collect()}
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_md5"] == hashlib.md5(_w10(seg + ["tail1", "tail2"]).encode()).hexdigest()
    assert out[2]["n_removed"] == 1
    # doc 2 keeps only its tail after the shared window is cut
    assert out[2]["clean_md5"] == hashlib.md5(b"other words here").hexdigest()
    assert out[3]["n_removed"] == 0


def test_remove_duplicate_segments_full_removal_yields_empty(spark):
    seg = [f"z{i}" for i in range(10)]
    rows = [(1, _w10(seg)), (2, _w10(seg))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in remove_duplicate_segments(df).collect()}
    assert out[2]["n_removed"] == 1 and out[2]["clean_len"] == 0
    assert out[2]["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert out[1]["n_removed"] == 0 and out[1]["clean_len"] > 0


def test_remove_duplicate_segments_short_doc_passthrough(spark):
    df = spark.createDataFrame([(7, "only four words here")], "doc_id long, text string")
    row = remove_duplicate_segments(df).collect()[0]
    assert row["n_segments"] == 0 and row["n_removed"] == 0
    assert row["clean_md5"] == hashlib.md5(b"only four words here").hexdigest()


# --------------------------------------------------------------------------
# stratified sampling
# --------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_rate(spark):
    from deduplicator_spark.sources.shards import sample_bucket, stratified_sample

    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_sample(
        docs, key="doc_id", strata_col="lang", rates={"en": 0.25}, default_rate=0.75
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 1000 - 0.25) < 0.08
    assert abs(counts["de"] / 3000 - 0.75) < 0.08
    # determinism: identical membership across repartitionings
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(
        docs.repartition(17), key="doc_id", strata_col="lang",
        rates={"en": 0.25}, default_rate=0.75).collect())
    assert a == b
    # bucket is md5-derived, engine-independent
    import hashlib as hl

    row = docs.select("doc_id", sample_bucket("doc_id").alias("b")).first()
    h = int(hl.md5(str(row["doc_id"]).encode()).hexdigest()[:15], 16)
    assert row["b"] == h % 10_000


def test_span_dedup_multibyte_utf8(spark, cfg):
    """Span coverage is defined over UTF-8 BYTES (gram positions are
    byte offsets); docs with multibyte characters must agree with an
    independent byte-level computation and satisfy the length
    identity.  Mirrors the golden's true-gram definition."""
    span = "übergrößenträger façade naïve déjà-vu œuvre "  # multibyte, len>=50 bytes
    assert len((span * 2).encode()) >= 50
    rows = [
        ("a", f"kopf {span * 2} schluss"),
        ("b", f"anfang anders {span * 2} ende anders"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    report, _ = span_dedup(df, cfg)
    out = {r["url"]: r.asDict() for r in report.collect()}
    # independent byte-level expectation for doc b vs doc a
    L = cfg.substring_min_len
    na = " ".join(rows[0][1].lower().split()).encode()
    nb = " ".join(rows[1][1].lower().split()).encode()
    grams_a = {na[i : i + L] for i in range(len(na) - L + 1)}
    import numpy as np

    covered = np.zeros(len(nb), dtype=bool)
    for p in range(len(nb) - L + 1):
        if nb[p : p + L] in grams_a:
            covered[p : p + L] = True
    assert out["b"]["orig_len"] == len(nb)
    assert out["b"]["covered_chars"] == int(covered.sum())
    assert out["b"]["clean_len"] == len(nb) - int(covered.sum())
    assert out["a"]["covered_chars"] == 0


def test_pack_manifest_invariants(spark):
    from deduplicator_spark.sources.shards import pack_manifest

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), (F.col("id") % 40 + 1).cast("int"))).alias("text"),
    )
    m = pack_manifest(docs, key="doc_id", budget_tokens=64, n_shards=4).toPandas()
    assert len(m) == 300
    for _, grp in m.groupby("shard"):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        # begin_tok is the running sum of preceding docs in key order
        assert (g["begin_tok"] == g["n_tok"].cumsum() - g["n_tok"]).all()
        assert (g["seq_idx"] == g["begin_tok"] // 64).all()
    # deterministic under repartitioning
    m2 = (
        pack_manifest(docs.repartition(13), key="doc_id", budget_tokens=64, n_shards=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert m.sort_values("doc_id").reset_index(drop=True).equals(m2)
