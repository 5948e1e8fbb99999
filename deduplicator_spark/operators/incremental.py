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


def apply_journal(fingerprints: DataFrame, journal: DataFrame) -> DataFrame:
    """Batch-apply an actions journal: rows with op='removed' are
    deleted from the index (dupedb.py:134-143)."""
    removed = journal.filter(F.col("op") == "removed").select("url")
    return fingerprints.join(removed, "url", "left_anti")
