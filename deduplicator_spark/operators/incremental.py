"""Incremental scan and index-maintenance operators.

The reference's dict-based maintenance patterns are joins semantically
(SURVEY.md §2.6); here they are real joins:

- S3/J1 incremental scan skip-known (dupedb.py:192-194, 271-274):
  left ANTI join of pages vs the fingerprint checkpoint; ``recheck``
  bypasses it (full re-fingerprint).
- J2 purge-vs-whitelist (dupedb.py:159-173): left SEMI join.
- J3 prune-vs-live (dupedb.py:371-411): semi join vs the current
  pages snapshot — vanished urls drop out.
- J4 validate/reassign (dupedb.py:413-438): recompute fingerprints
  for a sample/all urls; rows whose fingerprint moved are rewritten.
  Without an Iceberg MERGE in this environment, merge = anti-join the
  old rows out + union the new rows in (identical observable result,
  and exactly what MERGE INTO compiles to on a copy-on-write table).
- journal batch-apply (dupedb.py:129-143, compare.py:565): an
  append-only actions log applied in one batch — removed urls
  anti-joined out.

At cluster scale every one of these is a shuffle (or broadcast) on
``url`` only — never on document content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_docs(pages: DataFrame, fingerprints: DataFrame, recheck: bool = False) -> DataFrame:
    """Docs not yet fingerprinted (S3). ``recheck=True`` -> everything,
    mirroring the reference's --recheck flag (dupedb.py:271-274)."""
    if recheck:
        return pages
    return pages.join(fingerprints.select("url"), "url", "left_anti")


def purge(fingerprints: DataFrame, keep_urls: DataFrame) -> DataFrame:
    """Keep only fingerprints whose url is whitelisted (J2)."""
    return fingerprints.join(keep_urls.select("url"), "url", "left_semi")


def prune(fingerprints: DataFrame, live_pages: DataFrame) -> DataFrame:
    """Drop fingerprints of vanished docs (J3)."""
    return fingerprints.join(live_pages.select("url"), "url", "left_semi")


def validate_merge(fingerprints: DataFrame, recomputed: DataFrame, key: str = "url") -> DataFrame:
    """MERGE recomputed fingerprints over the stored ones (J4).

    Rows present in ``recomputed`` replace the stored row; all other
    stored rows pass through unchanged.
    """
    unchanged = fingerprints.join(recomputed.select(key), key, "left_anti")
    return unchanged.unionByName(recomputed, allowMissingColumns=False)


def changed_fingerprints(fingerprints: DataFrame, recomputed: DataFrame) -> DataFrame:
    """Audit of urls whose fingerprint moved (validateHash mismatch,
    dupedb.py:428-433): (url, old_md5, new_md5)."""
    old = fingerprints.select("url", F.col("content_md5").alias("old_md5"))
    new = recomputed.select("url", F.col("content_md5").alias("new_md5"))
    return old.join(new, "url").filter(F.col("old_md5") != F.col("new_md5"))


def apply_journal(
    fingerprints: DataFrame,
    journal: DataFrame,
    current_pages: DataFrame | None = None,
) -> DataFrame:
    """Batch-apply an actions journal (dupedb.py:129-143).

    - op='removed': the row leaves the index.  If the journal carries
      the expected hash (a ``content_md5`` column), only the row with
      that exact (url, hash) is removed — the reference removes the
      path from the given hash's entry only (dupedb.py:136-140).
    - op='validate': replay of validateHash (dupedb.py:142-143,
      413-438) against ``current_pages(url, text)``: vanished urls
      drop out of the index; urls whose recomputed hash moved are
      rewritten in place; matching rows pass through.

    ``current_pages`` is required when the journal contains validate
    entries (the reference re-reads the file; we re-read the table).
    """
    removed = journal.filter(F.col("op") == "removed")
    keys = (
        ["url", "content_md5"]
        if "content_md5" in removed.columns and "content_md5" in fingerprints.columns
        else ["url"]
    )
    out = fingerprints.join(removed.select(*keys), keys, "left_anti")

    val = journal.filter(F.col("op") == "validate").select("url").distinct()
    if current_pages is None:
        if val.limit(1).count() > 0:
            raise ValueError(
                "journal contains op='validate' entries; pass current_pages "
                "so the hashes can be recomputed (dupedb.py:423)"
            )
        return out
    # vanished urls: validate requested but the doc no longer exists
    vanished = val.join(current_pages.select("url"), "url", "left_anti")
    out = out.join(vanished, "url", "left_anti")
    # moved hashes: rewrite content_md5 in place (same-row MERGE)
    recomputed = (
        current_pages.join(val, "url", "left_semi")
        .select("url", F.md5("text").alias("_new_md5"))
    )
    return (
        out.join(recomputed, "url", "left")
        .withColumn("content_md5", F.coalesce("_new_md5", "content_md5"))
        .drop("_new_md5")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str = "url", text_col: str = "text"
) -> DataFrame:
    """Content-aware diff of two crawl snapshots: (key, status) with
    status in {added, removed, changed, unchanged}.

    The crawl-over-crawl delta report that drives incremental
    re-fingerprinting: only 'added' + 'changed' rows re-enter the
    pipeline.  One full-outer hash join on the key carrying only
    32-byte digests — content never shuffles, output is O(|old ∪ new|).
    """
    o = old.select(F.col(key), F.md5(F.col(text_col)).alias("md5_old"))
    n = new.select(F.col(key), F.md5(F.col(text_col)).alias("md5_new"))
    return o.join(n, key, "full_outer").select(
        key,
        F.when(F.col("md5_old").isNull(), F.lit("added"))
        .when(F.col("md5_new").isNull(), F.lit("removed"))
        .when(F.col("md5_old") != F.col("md5_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
