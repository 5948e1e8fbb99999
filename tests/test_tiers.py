"""Dedup-tier operators added round 2: normalized-exact (CCNet-style
fold), latest-snapshot-per-url (as-of dedup), and the corpus-trained
bigram LM quality scorer."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from deduplicator_spark.functions.lm import lm_score, train_bigram_lm
from deduplicator_spark.functions.text import ccnet_normalize
from deduplicator_spark.operators.exact import normalized_exact_clusters
from deduplicator_spark.operators.windows import latest_snapshot


# ---------------------------------------------------------------- normalized

def test_ccnet_normalize_folds_case_digits_punct_space(spark):
    rows = spark.range(1).select(
        ccnet_normalize(F.lit("  The QUICK,   brown fox!! 123 times...  ")).alias("n")
    ).collect()
    assert rows[0]["n"] == "the quick brown fox 000 times"


def test_normalized_exact_clusters_fold_variants(spark):
    df = spark.createDataFrame(
        [
            ("a", "Hello world, 42 times!"),
            ("b", "hello   WORLD 99 times"),  # case/space/digits variant of a
            ("c", "a completely different document"),
            ("d", "another unrelated text entirely"),
        ],
        ["url", "text"],
    )
    out = normalized_exact_clusters(df).collect()
    assert sorted(r["url"] for r in out) == ["a", "b"]
    assert all(r["cluster_size"] == 2 for r in out)
    # byte-exact md5 would NOT have matched them
    assert df.select(F.md5("text")).distinct().count() == 4


# ------------------------------------------------------------- latest snapshot

def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2025, 1, day, hour, 0, 0)


def test_latest_snapshot_keeps_newest_and_counts(spark):
    df = spark.createDataFrame(
        [
            Row(url="u1", warc_ts=_ts(1), text="v1"),
            Row(url="u1", warc_ts=_ts(5), text="v2"),
            Row(url="u1", warc_ts=_ts(3), text="v3"),
            Row(url="u2", warc_ts=_ts(2), text="only"),
        ]
    )
    out = {r["url"]: r for r in latest_snapshot(df).collect()}
    assert out["u1"]["warc_ts"] == _ts(5)
    assert out["u1"]["n_snapshots"] == 3
    assert out["u2"]["n_snapshots"] == 1


def test_latest_snapshot_tie_breaks_on_digest_deterministically(spark):
    # identical ts: the lexicographically larger md5(text) wins, so the
    # result is independent of row order / partitioning
    rows = [
        Row(url="u", warc_ts=_ts(1), text="alpha"),
        Row(url="u", warc_ts=_ts(1), text="beta"),
    ]
    kept_fwd = latest_snapshot(spark.createDataFrame(rows)).collect()[0]
    kept_rev = latest_snapshot(
        spark.createDataFrame(list(reversed(rows))).repartition(5)
    ).collect()[0]
    assert kept_fwd["payload_md5"] == kept_rev["payload_md5"]
    import hashlib

    expect = max(hashlib.md5(t.encode()).hexdigest() for t in ("alpha", "beta"))
    assert kept_fwd["payload_md5"] == expect


def test_latest_snapshot_is_an_aggregate_not_a_window(spark):
    """Scale guard: the plan must be a partial-aggregable max_by
    (HashAggregate/SortAggregate pair), not a Window over a full sort
    of every snapshot."""
    df = spark.createDataFrame([Row(url="u", warc_ts=_ts(1), text="x")])
    plan = latest_snapshot(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Aggregate" in plan


def test_ccnet_normalize_matches_duckdb_oracle_fuzz(spark):
    """Cross-engine parity: the DuckDB SQL fragment used by the
    normalized_exact_dups / dedup_tiers oracles must reproduce
    ccnet_normalize byte-for-byte — fuzzed over ASCII, Latin-1,
    Greek/Cyrillic, CJK, emoji, and mixed punctuation/digit/space
    soup so Java-regex vs RE2 unicode-class drift would surface here
    instead of as a flaky oracle mismatch on new data."""
    import random

    import duckdb

    rng = random.Random(7)
    alphabets = [
        "abc XYZ 012 .,;!?",
        "héllo wörld Æøå ñ",
        "πολύ καλό Привет мир",
        "日本語のテキスト 中文文本",
        "tab\tnewline\nmix  \r spaces",
        "emoji 🙂🚀 and — dashes – plus © symbols",
        "digits 1234567890 in 2024-01-01 dates",
    ]
    texts = [
        "".join(rng.choice(rng.choice(alphabets)) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ] + alphabets + [""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got_spark = [
        r["n"] for r in df.select(ccnet_normalize("text").alias("n")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            r"""SELECT trim(regexp_replace(regexp_replace(regexp_replace(
                  lower(?), '[0-9]', '0', 'g'),
                  '[^\p{L}\p{N}\s]', ' ', 'g'),
                  '\s+', ' ', 'g'))""",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got_spark == got_duck


# ------------------------------------------------------------------ tier rollup

def test_dedup_tiers_precedence_and_groups(spark):
    from deduplicator_spark.operators.tiers import dedup_tiers, tier_summary

    pages = spark.createDataFrame(
        [
            ("a1", "some web page about cats"),
            ("a2", "some web page about cats"),  # byte-identical -> exact
            ("b1", "Weather report: 21 degrees today!"),
            ("b2", "weather REPORT   99 degrees today"),  # folds -> normalized
            ("c1", "lone unique document with its own words"),
        ],
        ["url", "text"],
    )
    # near-dup membership supplied by the caller (chain tested elsewhere):
    # say a1/a2 also near-dup each other — exact must still win by precedence
    near = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1")], ["url", "cluster_id"]
    )
    out = {r["url"]: r for r in dedup_tiers(pages, near).collect()}
    assert out["a1"]["tier"] == "exact" and out["a2"]["tier"] == "exact"
    assert out["a1"]["canonical_url"] == "a1" and out["a2"]["canonical_url"] == "a1"
    assert out["b1"]["tier"] == "normalized" and out["b2"]["tier"] == "normalized"
    assert out["b1"]["group_id"] == out["b2"]["group_id"]
    assert out["c1"]["tier"] == "unique" and out["c1"]["group_size"] == 1

    summary = {r["tier"]: r for r in tier_summary(dedup_tiers(pages, near)).collect()}
    assert summary["exact"]["n_redundant"] == 1
    assert summary["normalized"]["n_groups"] == 1
    assert summary["unique"]["n_redundant"] == 0


# ---------------------------------------------------------------- pair metrics

def test_pair_metrics_hand_computed(spark):
    """truth: {a,b,c}, {d,e}, f-singleton → 4 truth pairs.
    pred: {a,b}, {c,d} → 2 pred pairs, 1 true (a,b).
    P = 1/2, R = 1/4, F1 = 1/3.  Unclustered docs are implicit
    singletons and cost recall, not errors."""
    from deduplicator_spark.operators.evaluate import pair_metrics

    truth = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2), ("f", 3)],
        ["url", "truth_cluster_id"],
    )
    pred = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "B"), ("d", "B")], ["url", "cluster_id"]
    )
    row = pair_metrics(pred, truth).collect()[0]
    assert row["n_docs"] == 6
    assert row["tp_pairs"] == 1 and row["pred_pairs"] == 2 and row["truth_pairs"] == 4
    assert row["precision"] == 0.5 and row["recall"] == 0.25
    assert row["f1"] == round(1 / 3, 6)


def test_pair_metrics_never_materializes_pairs(spark):
    """A 10k-member cluster must evaluate via C(n,2) arithmetic — the
    plan contains aggregates and joins on group keys, never a
    self-join that would expand ~5*10^7 pairs."""
    from deduplicator_spark.operators.evaluate import pair_metrics

    n = 10_000
    pred = spark.range(n).selectExpr("CAST(id AS STRING) AS url", "'x' AS cluster_id")
    truth = spark.range(n).selectExpr(
        "CAST(id AS STRING) AS url", "CAST(id % 2 AS STRING) AS truth_cluster_id"
    )
    row = pair_metrics(pred, truth).collect()[0]
    assert row["pred_pairs"] == n * (n - 1) // 2
    k = n // 2
    assert row["truth_pairs"] == 2 * (k * (k - 1) // 2)
    assert row["tp_pairs"] == row["truth_pairs"]  # one pred cluster ⊇ both halves
    assert row["recall"] == 1.0


# ------------------------------------------------------------------- LM score

def test_lm_score_prefers_corpus_typical_docs(spark):
    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)]
        + [(100, "zq xv qqj zzk wpl unseen gibberish")],
        ["doc_id", "text"],
    )
    uni, bi = train_bigram_lm(corpus, min_count=2)
    scores = {r["doc_id"]: r["lm_score"] for r in lm_score(corpus, uni, bi).collect()}
    assert scores[0] > scores[100]  # typical doc ≫ gibberish (less negative)
    assert scores[0] == scores[19]  # identical docs identical scores


def test_lm_score_short_docs_excluded_and_counts_right(spark):
    corpus = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b c d")], ["doc_id", "text"]
    )
    uni, bi = train_bigram_lm(corpus, min_count=1)
    out = {r["doc_id"]: r for r in lm_score(corpus, uni, bi).collect()}
    assert set(out) == {3}  # <2-token docs can't be bigram-scored
    assert out[3]["n_bigrams"] == 3


def test_lm_score_sum_is_exact_integer_reduction(spark):
    """Determinism contract: per-doc sums are integer micro-nats, so
    repartitioning (different partial-agg order) changes nothing."""
    corpus = spark.createDataFrame(
        [(i, f"w{i % 7} common common w{i % 5} tail") for i in range(50)],
        ["doc_id", "text"],
    )
    uni, bi = train_bigram_lm(corpus, min_count=2)
    a = {r["doc_id"]: r["sum_logp_micro"] for r in lm_score(corpus, uni, bi).collect()}
    b = {
        r["doc_id"]: r["sum_logp_micro"]
        for r in lm_score(corpus.repartition(13), uni, bi).collect()
    }
    assert a == b
    assert all(isinstance(v, int) for v in a.values())


def test_lm_pruned_bigram_falls_back_to_unigram(spark):
    # 'rare pair' appears once -> pruned at min_count=2 -> backoff path
    corpus = spark.createDataFrame(
        [(1, "rare pair"), (2, "common duo"), (3, "common duo")],
        ["doc_id", "text"],
    )
    uni, bi = train_bigram_lm(corpus, min_count=2)
    assert bi.count() == 1  # only 'common duo' survives
    out = {r["doc_id"]: r for r in lm_score(corpus, uni, bi).collect()}
    # backoff: ln(0.4 * c('pair')/N) = ln(0.4 * 1/6)
    import math

    assert out[1]["sum_logp_micro"] == round(math.log(0.4 * 1 / 6) * 1e6)
    # kept bigram: ln(c('common duo')/c('common')) = ln(2/2) = 0
    assert out[2]["sum_logp_micro"] == 0


def test_tier_summary_char_weighted_savings(spark):
    """char_counts adds redundant_chars: the char sum of non-canonical
    docs per tier (ADVICE r2 #4 — the parameter used to be ignored)."""
    from deduplicator_spark.operators.tiers import tier_summary

    tiers = spark.createDataFrame(
        [
            ("exact", 1, "a", "a"),
            ("exact", 1, "b", "a"),   # redundant, 100 chars
            ("exact", 1, "c", "a"),   # redundant, 7 chars
            ("near", 2, "a", "a"),
        ],
        "tier string, group_id long, url string, canonical_url string",
    )
    chars = spark.createDataFrame(
        [("a", 50), ("b", 100), ("c", 7)], "url string, n_chars long"
    )
    got = {r["tier"]: r for r in tier_summary(tiers, chars).collect()}
    assert got["exact"]["redundant_chars"] == 107
    assert got["near"]["redundant_chars"] == 0  # no redundant docs -> 0, not NULL
    # without char_counts the column is absent (schema unchanged)
    assert "redundant_chars" not in tier_summary(tiers).columns
