"""R1-R7 ranking windows and P7/P8 series filter — golden semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.operators.ranking import (
    actions_from_ranking,
    super_state,
    with_canonical,
)
from deduplicator_spark.operators.series import filter_known_alts, series_info, with_series_columns


def _cluster_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, cluster_id string, n_tokens long, n_chars long, byte_len long"
    )


def test_canonical_prefers_more_tokens(spark):
    df = _cluster_df(
        spark,
        [
            ("https://a.com/x/small.html", "c1", 10, 100, 120),
            ("https://a.com/x/big.html", "c1", 50, 400, 500),
            ("https://a.com/x/mid.html", "c1", 30, 300, 350),
        ],
    )
    ranked = with_canonical(df)
    keep = ranked.filter("is_canonical").collect()
    assert len(keep) == 1 and keep[0]["url"] == "https://a.com/x/big.html"
    acts = actions_from_ranking(ranked)
    assert acts.filter("op = 'delete'").count() == 2


def test_canonical_deterministic_tiebreak_on_url(spark):
    df = _cluster_df(
        spark,
        [
            ("https://a.com/x/bbb.html", "c1", 10, 100, 120),
            ("https://a.com/x/aaa.html", "c1", 10, 100, 120),
        ],
    )
    keep = with_canonical(df).filter("is_canonical").collect()
    assert keep[0]["url"] == "https://a.com/x/aaa.html"


def test_canonical_penalizes_hex_hash_names(spark):
    hexname = "0123456789abcdef0123456789abcdef0123.html"
    df = _cluster_df(
        spark,
        [
            (f"https://a.com/x/{hexname}", "c1", 10, 100, 120),
            ("https://a.com/x/nice-name.html", "c1", 10, 100, 120),
        ],
    )
    keep = with_canonical(df).filter("is_canonical").collect()
    assert keep[0]["url"] == "https://a.com/x/nice-name.html"


def test_super_state_three_axes(spark):
    """best content, dir and name deliberately point at different rows
    (FIXTURES.md section 4)."""
    df = _cluster_df(
        spark,
        [
            # best content (most tokens), ugly name, shallow dir
            ("https://a.com/z/xx__99.html", "c1", 90, 900, 950),
            # best name (most punctuation-detail), small content
            ("https://a.com/z/very-nice_detailed-name.html", "c1", 10, 100, 110),
            # best dir (deepest path), small content
            ("https://a.com/deep/deeper/deepest/plain.html", "c1", 10, 100, 110),
        ],
    )
    ss = super_state(df).collect()[0]
    assert ss["keep_url"] == "https://a.com/z/xx__99.html"
    assert ss["dest_path"] == (
        "https://a.com/deep/deeper/deepest/very-nice_detailed-name.html"
    )
    assert ss["needs_move"] is True
    assert ss["n_deletions"] == 2


def test_super_state_no_move_when_best_everywhere(spark):
    df = _cluster_df(
        spark,
        [
            ("https://a.com/deep/dir/the-very_best-name.html", "c1", 90, 900, 950),
            ("https://a.com/x/b.html", "c1", 10, 100, 110),
        ],
    )
    ss = super_state(df).collect()[0]
    assert ss["keep_url"] == "https://a.com/deep/dir/the-very_best-name.html"
    assert ss["needs_move"] is False


def test_super_state_collision_suffix(spark):
    """Two clusters resolving to the same dest get deterministic _N."""
    df = _cluster_df(
        spark,
        [
            ("https://a.com/d/same.html", "c1", 20, 200, 210),
            ("https://a.com/d/same (2).html", "c1", 10, 100, 110),
            ("https://a.com/d/same.html?v=2", "c2", 20, 200, 210),
            ("https://a.com/d/other.html", "c2", 1, 10, 11),
        ],
    )
    # force same dest for both clusters: c2's best name strips to same.html?v=2
    out = {r["cluster_id"]: r["dest_path"] for r in super_state(df).collect()}
    assert len(set(out.values())) == 2  # collisions resolved


SERIES_CASES = [
    ("pic_2", (2, "pic_<#>")),
    ("pic-3", (3, "pic-<#>")),
    ("pic 4", (4, "pic <#>")),
    ("pic(5)", (5, "pic(<#>)")),
    ("pic_p6", (6, "pic_p<#>")),
    ("pic_img7", (7, "pic_img<#>")),
    ("pic-img8", (8, "pic-img<#>")),
    ("pic-alt", (1, "pic-alt<#>")),
    ("pic-alt9", (9, "pic-alt<#>")),
    ("pic edit", (1, "pic edit<#>")),
    ("abc7", (7, "abc<#>")),
    ("pic_9999", None),          # > 1000 rejected, no later pattern matches...
    ("plain", None),
    ("2024", None),              # digits only, lookbehind needs a letter
]


@pytest.mark.parametrize("stem,expected", SERIES_CASES)
def test_series_info_cascade(spark, stem, expected):
    row = spark.range(1).select(series_info(F.lit(stem)).alias("s")).collect()[0]["s"]
    if expected is None:
        assert row is None, f"{stem} -> {row}"
    else:
        assert row is not None and (row["series_no"], row["series_style"]) == expected, (
            f"{stem} -> {row}"
        )


def test_series_9999_falls_through_to_single_digit(spark):
    # "_9999$" rejected (>1000) but trailing-digit-after-letter pattern
    # can still match ... it requires a letter before the digit, '9' is
    # preceded by '9', so no match at all.
    row = spark.range(1).select(series_info(F.lit("pic_9999")).alias("s")).collect()[0]["s"]
    assert row is None


def test_filter_known_alts_series(spark):
    rows = [
        ("https://a.com/d/base.html", "c1"),
        ("https://a.com/d/base_2.html", "c1"),      # quick: prefix within 12
        ("https://a.com/d/base (3).html", "c1"),    # quick
        ("https://a.com/d/unrelated-doc-with-long-name.html", "c1"),
        ("https://b.com/other.html", "c2"),
        # reference parity: quick method sees FULL-path stems, so
        # "https://b.com/other" (19 chars) is a base for
        # "https://b.com/single_2" (22 chars, stub="https://b.") -> dropped
        ("https://b.com/single_2.html", "c2"),
    ]
    df = spark.createDataFrame(rows, "url string, cluster_id string")
    kept = {r["url"] for r in filter_known_alts(df).collect()}
    assert "https://a.com/d/base.html" in kept
    assert "https://a.com/d/base_2.html" not in kept
    assert "https://a.com/d/base (3).html" not in kept
    assert "https://a.com/d/unrelated-doc-with-long-name.html" in kept
    assert "https://b.com/other.html" in kept
    assert "https://b.com/single_2.html" not in kept


def test_with_series_columns_base_stem(spark):
    df = spark.createDataFrame([("https://a.com/d/pic_3.html",)], "url string")
    r = with_series_columns(df).collect()[0]
    assert r["stem"] == "pic_3"
    assert r["series_no"] == 3
    assert r["base_stem"] == "pic"
