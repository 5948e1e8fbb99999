"""URL canonicalization edge cases (hand-computed expectations)."""

from __future__ import annotations

import pytest

from deduplicator_spark.functions.urls import canonical_url, url_dup_groups

CASES = [
    # authority lowercased, default port stripped, tracking+fragment dropped
    ("https://EX.com:443/a?utm_source=x#f", "https://ex.com/a"),
    ("http://A.com:80/", "http://a.com/"),
    # non-default port kept
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # index.html folding (and .htm)
    ("https://a.com/x/index.html", "https://a.com/x/"),
    ("https://a.com/x/index.htm", "https://a.com/x/"),
    # tracking param in the middle; real params and their case kept
    ("https://a.com/p?id=3&utm_a=1&Real=2", "https://a.com/p?id=3&Real=2"),
    # only tracking params -> query gone entirely
    ("https://a.com/p?utm_a=1&gclid=z", "https://a.com/p"),
    # fragment only
    ("https://a.com/p#sec", "https://a.com/p"),
    # nothing to do
    ("https://a.com/p?q=1", "https://a.com/p?q=1"),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "url string")
    rows = df.select("url", canonical_url("url").alias("c")).collect()
    return {r.url: r.c for r in rows}


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url(canon, raw, want):
    assert canon[raw] == want


def test_canonical_url_idempotent_fuzz(spark):
    """canonical(canonical(u)) == canonical(u) over 500 seeded-random
    URLs mixing case, ports, tracking params, fragments, and junk."""
    import random

    rng = random.Random(42)
    schemes = ["http://", "https://", "HTTPS://", "HtTp://"]
    hosts = ["ex.com", "EX.com", "a.b.example.org", "X9.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["/", "/a/b.html", "/x/index.html", "/p%20q", ""]
    queries = ["", "?id=1", "?utm_source=x", "?a=1&utm_b=2&c=3", "?utm_a=1&utm_b=2", "?a=1&&b=2"]
    frags = ["", "#f", "#utm_x=1"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(500)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url("url")
    import pyspark.sql.functions as F

    bad = (
        df.select("url", once.alias("c1"))
        .select("url", "c1", canonical_url(F.col("c1")).alias("c2"))
        .filter(F.col("c1") != F.col("c2"))
        .collect()
    )
    assert not bad, bad[:5]


def test_url_dup_groups(spark):
    urls = [
        "https://a.com/p",
        "https://A.com:443/p?utm_source=x",
        "HTTPS://a.com/p#frag",
        "https://b.com/q",  # singleton, dropped
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = url_dup_groups(df, "url", min_urls=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.canonical_url, r.n_urls, r.n_distinct_raw) == ("https://a.com/p", 3, 3)
