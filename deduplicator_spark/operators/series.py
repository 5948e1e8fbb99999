"""Alt-series detection and the "hide known alts" cluster filter.

Reference semantics (file:line cites into /root/reference):

- P8 getSeriesInfo (compare.py:77-105): first-match regex cascade over
  the name stem -> (series_no, style) where style has the number
  replaced by '<#>'; numbers > 1000 are rejected and the cascade
  continues.
- P7 loadDuplicates alt filter (compare.py:527-547), two methods:
    quick: member A is dropped when another member B's stem is a
      prefix-truncation of A's stem within 12 chars
      (B.stem startswith A.stem[:-12], len(A)-12 < len(B) <= len(A));
    smart: A is dropped when its series predecessor (style with no-1)
      or its pattern-stripped base exists among remaining members
      (findBaseFileForPath, compare.py:136-173 — the filesystem glob
      probe becomes an in-cluster join).

Both methods are pure DataFrame regex + self-joins on cluster_id.
Deviation from the reference, documented: the reference mutates its
candidate set while iterating (compare.py:540-541), making the result
order-dependent; this implementation is declarative (a member is
dropped if ANY base exists), i.e. order-independent and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deduplicator_spark.operators.ranking import leaf_ext, leaf_stem, url_leaf

# (pattern, extract-group?, style-template) — order matters (first match
# wins), mirrors compare.py:79-92.
SERIES_PATTERNS: list[tuple[str, bool, str]] = [
    (r"_(\d+)$", True, "_<#>"),
    (r"-(\d+)$", True, "-<#>"),
    (r" (\d+)$", True, " <#>"),
    (r"\((\d+)\)$", True, "(<#>)"),
    (r"_p(\d+)$", True, "_p<#>"),
    (r"_img(\d+)$", True, "_img<#>"),
    (r"-img(\d+)$", True, "-img<#>"),
    (r"-alt(\d*)$", True, "-alt<#>"),
    (r" edit$", False, " edit<#>"),
    (r"(?<=[a-zA-Z])(\d)$", True, "<#>"),
]


def series_info(stem: Column) -> Column:
    """struct(series_no int, series_style string) or NULL if no pattern
    matches — getSeriesInfo (compare.py:77-105) as a when-cascade."""
    result = F.lit(None).cast("struct<series_no:int,series_style:string>")
    # build cascade in reverse so the FIRST pattern has highest priority
    for pattern, has_group, templ in reversed(SERIES_PATTERNS):
        extracted = F.regexp_extract(stem, pattern, 1 if has_group else 0)
        no = (
            F.when(extracted == "", F.lit(1)).otherwise(
                F.coalesce(extracted.cast("int"), F.lit(1))
            )
            if has_group
            else F.lit(1)
        )
        matched = stem.rlike(pattern) & (no <= 1000)
        style = F.regexp_replace(stem, pattern, templ)
        result = F.when(
            matched, F.struct(no.alias("series_no"), style.alias("series_style"))
        ).otherwise(result)
    return result


# base-stripping patterns of findBaseFileForPath (compare.py:153-159);
# the glob tail becomes "stem equality after stripping".
_BASE_STRIP_PATTERNS = [r"[-_ ]\d+$", r"[-_ ]alt$", r"[-_ ]edit$", r" otm$", r" otn$"]


def with_series_columns(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds stem/ext/series_no/series_style/base_stem columns."""
    u = F.col(url_col)
    stem = leaf_stem(u)
    out = df.withColumn("stem", stem).withColumn("ext", leaf_ext(u))
    info = series_info(F.col("stem"))
    out = out.withColumn("series_no", info["series_no"]).withColumn(
        "series_style", info["series_style"]
    )
    base = F.col("stem")
    for p in _BASE_STRIP_PATTERNS:
        base = F.regexp_replace(base, p, "")
    return out.withColumn("base_stem", base)


def filter_known_alts(
    clustered: DataFrame, cluster_col: str = "cluster_id", url_col: str = "url"
) -> DataFrame:
    """Drop cluster members that are alts of another member (P7).

    Returns the input rows minus detected alts (same schema).
    """
    # The reference operates on FULL-path stems (os.path.splitext(path)[0]
    # keeps the directory, compare.py:533, 137) — so the quick prefix rule
    # and the series patterns see "https://host/dir/name", not just "name".
    u = F.col(url_col)
    fstem = F.substring(u, 1, F.length(u) - F.length(leaf_ext(u)))
    enriched = clustered.withColumn("stem", fstem)
    info = series_info(F.col("stem"))
    enriched = (
        enriched.withColumn("series_no", info["series_no"])
        .withColumn("series_style", info["series_style"])
    )
    base = F.col("stem")
    for p in _BASE_STRIP_PATTERNS:
        base = F.regexp_replace(base, p, "")
    enriched = enriched.withColumn("base_stem", base).withColumn(
        "_stub", F.substring(F.col("stem"), 1, F.greatest(F.length("stem") - 12, F.lit(0)))
    )
    a = enriched.alias("a")
    b = enriched.select(cluster_col, "stem", "series_style", "series_no", "base_stem").alias("b")
    same_cluster = F.col(f"a.{cluster_col}") == F.col(f"b.{cluster_col}")
    different = F.col("a.stem") != F.col("b.stem")

    # quick method (compare.py:532-541)
    quick = (
        F.col("b.stem").startswith(F.col("a._stub"))
        & (F.length("b.stem") <= F.length("a.stem"))
        & (F.length("b.stem") > F.length("a.stem") - 12)
    )
    # smart method (compare.py:543-547 via findBaseFileForPath):
    # predecessor in series, or pattern-stripped base equality
    predecessor = (
        F.col("a.series_style").isNotNull()
        & (F.col("b.series_style") == F.col("a.series_style"))
        & (F.col("b.series_no") == F.col("a.series_no") - 1)
    )
    stripped_base = (F.col("b.stem") == F.col("a.base_stem")) & (
        F.col("a.base_stem") != F.col("a.stem")
    )

    alts = (
        a.join(b, same_cluster & different & (quick | predecessor | stripped_base), "left_semi")
        .select(f"a.{cluster_col}", f"a.{url_col}")
        .dropDuplicates()
    )
    return clustered.join(alts, [cluster_col, url_col], "left_anti")
