"""Generator determinism + planted-structure invariants (FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.sources.pages import synth_pages_with_truth


def test_urls_unique(small_pages):
    n = small_pages.count()
    assert small_pages.select("url").distinct().count() == n


def test_partition_count_invariance(spark):
    a = synth_pages_with_truth(spark, 120, partitions=2)
    b = synth_pages_with_truth(spark, 120, partitions=7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_planted_kinds_present(small_pages):
    kinds = {r["dup_kind"] for r in small_pages.select("dup_kind").distinct().collect()}
    assert kinds == {"boilerplate_hot", "degenerate", "exact", "near", "substring", "unique"}


def test_exact_clusters_are_byte_identical(small_pages):
    bad = (
        small_pages.filter(F.col("dup_kind") == "exact")
        .groupBy("truth_cluster_id")
        .agg(F.count_distinct("text").alias("nt"), F.count("*").alias("n"))
        .filter((F.col("nt") != 1) | (F.col("n") < 2))
        .count()
    )
    assert bad == 0


def test_html_roundtrips_text(small_pages):
    """The byte-identical extracted-text invariant (BASELINE.json input_hint)."""
    bad = small_pages.filter(
        F.decode(
            F.substring(
                F.col("html"), 13, F.length("html") - 12 - 14
            ).cast("binary"),
            "UTF-8",
        )
        != F.col("text")
    ).count()
    assert bad == 0


def test_extract_text_byte_identical_on_fixture(small_pages):
    """S4 decode source: extract_text(html) == text for every url —
    the BASELINE.json input_hint invariant, via the real extractor."""
    from deduplicator_spark.sources.extract import extract_text

    bad = small_pages.select(
        "url", "text", extract_text(F.col("html")).alias("extracted")
    ).filter(F.col("extracted") != F.col("text")).count()
    assert bad == 0


def test_extract_text_strips_markup(spark):
    """Scripts/styles/comments removed, tags stripped, entities
    unescaped last (&amp;lt; stays &lt; as text, not '<')."""
    from deduplicator_spark.sources.extract import extract_text

    cases = [
        (b"<html><head><script>var x = '<b>'</script><style>p{}</style>"
         b"</head><body>Hello <b>world</b></body></html>", "Hello world"),
        (b"<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>", "a & b <tag> \"q\" 's'"),
        (b"<p>x &amp;lt; y</p>", "x &lt; y"),
        (b"before<!-- hidden <b>bold</b> -->after", "beforeafter"),
        (b"no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame([(h, w) for h, w in cases], "html binary, want string")
    bad = df.select(extract_text(F.col("html")).alias("got"), "want").filter(
        F.col("got") != F.col("want")
    )
    assert bad.count() == 0, bad.collect()


def test_substring_pairs_contained(small_pages):
    pairs = (
        small_pages.filter(F.col("dup_kind") == "substring")
        .groupBy("truth_cluster_id")
        .agg(
            F.min_by("text", F.length("text")).alias("short"),
            F.max_by("text", F.length("text")).alias("long"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") == 2)
    )
    bad = pairs.filter(~F.col("long").contains(F.col("short"))).count()
    assert bad == 0 and pairs.count() > 0
