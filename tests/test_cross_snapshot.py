"""cross_snapshot_pairs: new-crawl-vs-frozen-corpus dedup (lsh.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.functions.fingerprints import make_fingerprint_udf
from deduplicator_spark.operators.lsh import cross_snapshot_pairs


def _fp(spark, cfg, rows):
    udf = make_fingerprint_udf(cfg)
    df = spark.createDataFrame(rows, "url string, text string")
    return df.select("url", udf(F.col("text")).alias("f")).select("url", "f.*")


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from a mossy log near the river bend "
    "under a pale october sky full of migrating geese heading south "
    "past the old stone bridge where children throw breadcrumbs to "
    "ducks every saturday morning before the market opens its gates "
    "and vendors arrange crates of apples pears plums and quinces "
    "along the cobbled lane that winds up toward the clock tower"
)


def test_cross_pairs_only_and_oriented(spark, cfg):
    old = _fp(spark, cfg, [
        ("old1", BASE),
        ("old2", BASE.replace("quick", "rapid")),      # near-dup of old1
        ("old3", "completely different content " * 12),
    ])
    new = _fp(spark, cfg, [
        ("new1", BASE.replace("october", "november")),  # near-dup of old1/old2
        ("new2", "fresh unrelated snapshot text " * 12),
    ])
    pairs, overflow = cross_snapshot_pairs(new, old, cfg)
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    # every pair is (new, old) — old-old near-dups (old1, old2) never appear
    assert all(a.startswith("new") and b.startswith("old") for a, b in got)
    assert ("new1", "old1") in got and ("new1", "old2") in got
    assert not any(a == "new2" for a, _ in got)
    assert overflow.count() == 0


def test_cross_pairs_old_side_cap_is_audited(spark, cfg):
    # 30 old copies of the same text land in one bucket per band;
    # cap at 5 -> each band bucket keeps 5, overflow rows recorded,
    # and the new doc still pairs with the capped members.
    old = _fp(spark, cfg, [(f"old{i:02d}", BASE) for i in range(30)])
    new = _fp(spark, cfg, [("new1", BASE)])
    pairs, overflow = cross_snapshot_pairs(new, old, cfg, max_bucket=5)
    got = {(r["url_a"], r["url_b"]) for r in pairs.collect()}
    assert got == {("new1", f"old{i:02d}") for i in range(5)}
    assert overflow.count() > 0
    assert overflow.agg(F.max("bucket_size")).collect()[0][0] == 30


def test_cross_pairs_untouched_old_buckets_prune(spark, cfg):
    """Old docs whose buckets no new doc touches contribute nothing —
    the semi-join prunes them before any expansion."""
    old = _fp(spark, cfg, [
        ("old1", "alpha beta gamma delta epsilon zeta eta theta " * 8),
        ("old2", "one two three four five six seven eight nine ten " * 8),
    ])
    new = _fp(spark, cfg, [("new1", "totally disjoint vocabulary here my friend " * 8)])
    pairs, overflow = cross_snapshot_pairs(new, old, cfg)
    assert pairs.count() == 0 and overflow.count() == 0


def test_cross_pairs_50k_member_old_bucket_bounded(spark, cfg):
    """A planted 50k-member old-side bucket (boilerplate in a frozen
    corpus) must cap BEFORE any member array exists — the old
    collect_list+slice shape built one multi-MB aggregation row per
    mega-bucket (VERDICT r2 'What's wrong' #1).  Fingerprints are
    synthesized directly (identical signature + shingles) so the test
    exercises shape, not the UDF."""
    n_old, cap = 50_000, 7
    sig = F.array(*[F.lit(i * 2654435761 % (1 << 31)) for i in range(cfg.num_perm)])
    sh = F.array(*[F.lit(int(1e12) + i) for i in range(20)])
    old = spark.range(n_old).select(
        F.format_string("old%06d", F.col("id")).alias("url"),
        sig.alias("minhash"),
        sh.alias("shingles"),
        F.lit(20).alias("n_shingles"),
    )
    new = spark.range(1).select(
        F.lit("new000001").alias("url"),
        sig.alias("minhash"),
        sh.alias("shingles"),
        F.lit(20).alias("n_shingles"),
    )
    pairs, overflow = cross_snapshot_pairs(new, old, cfg, max_bucket=cap)
    got = sorted(r["url_b"] for r in pairs.collect())
    # deterministic sorted prefix of the old side, jaccard 1.0
    assert got == [f"old{i:06d}" for i in range(cap)]
    assert pairs.filter(F.col("jaccard") < 1.0).count() == 0
    assert overflow.agg(F.max("bucket_size")).collect()[0][0] == n_old
