"""URL canonicalization (JVM column expressions, whole-stage codegen).

Web-scale corpora dedup by canonical URL before any content pass (WARC
refetches, tracking-param variants, http/https and port variants of the
same page).  Reference analog: the reference keys its database by file
path (dupedb.py) — the URL is the path of the web; canonicalization is
the path-normalization it performs implicitly via the filesystem.

Every step is a regex with identical semantics in Java regex (Spark)
and RE2 (DuckDB) — no lookaround, no backreferences in patterns — so
the oracle can mirror it exactly (see ``__spark_entry__._CANON_URL``).

Canonicalization steps, in order:

1. drop the ``#fragment``
2. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``)
3. collapse delimiter runs left behind (``?&`` → ``?``, ``&&+`` → ``&``)
   and strip a trailing ``?`` / ``&``
4. strip default ports ``:80`` / ``:443``
5. lowercase the scheme+authority (path/query stay case-sensitive)
6. fold a trailing ``/index.htm(l)`` to ``/``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AUTH = r"(?i)^(https?://[^/]*)"
_TRACKING = r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"


def canonical_url(col: Column | str) -> Column:
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, _TRACKING, r"$1")
    u = F.regexp_replace(u, r"&{2,}", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"(?i)^(https?://[^/:]*):(80|443)(/|$)", r"$1$3")
    u = F.concat(
        F.lower(F.regexp_extract(u, _AUTH, 1)),
        F.regexp_replace(u, _AUTH, ""),
    )
    return F.regexp_replace(u, r"/index\.html?$", "/")


def url_dup_groups(df: DataFrame, url_col: str = "url", min_urls: int = 2) -> DataFrame:
    """Group raw URLs that canonicalize to the same page.

    Returns ``(canonical_url, n_urls, n_distinct_raw)`` for groups with
    at least ``min_urls`` rows.  One map-side-combinable groupBy on the
    canonical string — the same shuffle shape as exact dedup.
    """
    return (
        df.select(F.col(url_col).alias("raw_url"), canonical_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("raw_url").alias("n_distinct_raw"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )
