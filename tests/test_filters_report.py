"""S2/P2/P3 filters, S10 report, R6 overrides, rename plan (H3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.operators.filters import (
    apply_keep_overrides,
    clusters_report,
    degenerate_guard,
    exempt_filter,
    protected_rows,
    rename_plan,
)
from deduplicator_spark.operators.ranking import with_canonical


def test_exempt_and_protected(spark):
    df = spark.createDataFrame(
        [("https://a.com/keep/x.html",), ("https://a.com/tmp/y.html",), ("https://a.com/z!.html",)],
        "url string",
    )
    assert {r["url"] for r in exempt_filter(df, ["/tmp/"]).collect()} == {
        "https://a.com/keep/x.html",
        "https://a.com/z!.html",
    }
    assert {r["url"] for r in protected_rows(df).collect()} == {"https://a.com/z!.html"}


def test_degenerate_guard(spark):
    fp = spark.createDataFrame([("u1", 5), ("u2", 0)], "url string, n_shingles int")
    assert {r["url"] for r in degenerate_guard(fp).collect()} == {"u1"}


def test_clusters_report(spark):
    clusters = spark.createDataFrame(
        [("u1", "c1"), ("u2", "c1"), ("u3", "c1"), ("u4", "c2"), ("u5", "c2")],
        "url string, cluster_id string",
    )
    fp = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30), ("u4", 5), ("u5", 7)],
        "url string, n_chars long",
    )
    rep = {r["cluster_id"]: r for r in clusters_report(clusters, fp, sample_size=2).collect()}
    assert rep["c1"]["cluster_size"] == 3
    assert rep["c1"]["total_chars"] == 60
    assert rep["c1"]["sample_urls"] == ["u1", "u2"]
    assert rep["c2"]["total_chars"] == 12


def test_keep_overrides(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/x/big.html", "c1", 50, 400, 500),
            ("https://a.com/x/small.html", "c1", 10, 100, 120),
            ("https://a.com/y/one.html", "c2", 10, 100, 120),
            ("https://a.com/y/two.html", "c2", 9, 90, 100),
        ],
        "url string, cluster_id string, n_tokens long, n_chars long, byte_len long",
    )
    ranked = with_canonical(df)
    ov = spark.createDataFrame([("c1", "https://a.com/x/small.html")], "cluster_id string, keep_url string")
    out = apply_keep_overrides(ranked, ov)
    keeps = {r["cluster_id"]: r["url"] for r in out.filter("is_canonical").collect()}
    assert keeps["c1"] == "https://a.com/x/small.html"  # overridden
    assert keeps["c2"] == "https://a.com/y/one.html"     # ranked winner


def test_undo_script_reverses_deletes_and_renames(spark):
    from deduplicator_spark.operators.filters import undo_script

    actions = spark.createDataFrame(
        [("c1", "u1", "keep"), ("c1", "u2", "delete"), ("c1", "u3", "delete")],
        "cluster_id string, url string, op string",
    )
    got = {r["url"]: (r["undo_op"], r["undo_line"]) for r in undo_script(actions).collect()}
    assert got == {
        "u2": ("restore", "restore\tu2"),
        "u3": ("restore", "restore\tu3"),
    }

    renames = spark.createDataFrame(
        [("u1", "abc.html", "rename")], "url string, new_name string, op string"
    )
    r = undo_script(renames).collect()[0]
    assert (r["undo_op"], r["undo_line"]) == ("rename_back", "mv\tabc.html\tu1")


def test_rename_plan_crc_suffix(spark):
    fp = spark.createDataFrame(
        [("https://a/d1.html", "aaa"), ("https://a/d2.html", "aaa"), ("https://a/s.html", "bbb")],
        "url string, content_md5 string",
    )
    clusters = spark.createDataFrame(
        [("https://a/d1.html", "c1", 2), ("https://a/d2.html", "c1", 2), ("https://a/s.html", "c2", 1)],
        "url string, cluster_id string, cluster_size long",
    )
    plan = {r["url"]: r["new_name"] for r in rename_plan(fp, clusters).collect()}
    assert plan["https://a/s.html"] == "bbb.html"
    # multi-doc cluster gets the crc32 suffix; same md5 -> same crc but name includes it
    assert plan["https://a/d1.html"].startswith("aaa_") and plan["https://a/d1.html"].endswith(".html")
