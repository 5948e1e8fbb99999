"""Source-level predicates and report sinks.

Reference analogs (file:line into /root/reference):

- S2 exempt-substring filter (dedupc.py:687-691): drop urls containing
  any exempt substring — pushed into the scan as a plain predicate.
- P3 '!'-in-path exemption (dedupc.py:310-311, 372-373): protected
  rows excluded from action planning.
- P2 zero-hash guard (dedupc.py:176-178): degenerate-doc filter.
- S10 montage sink (dedupc.py:109-154): the human-review artifact
  becomes a per-cluster report table with a deterministic sample and
  the A5 size-sum metadata (dedupc.py:129-131).
- R6 interactive keep override (dedupc.py:183-210): an overrides table
  left-joined over the ranked output.
- rename plan (dedupc.py:280-341): rename-to-fingerprint with the H3
  CRC32 disambiguation suffix (dedupc.py:316-320) and undo actions
  (S9, dedupc.py:329-337).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicator_spark.operators.ranking import leaf_ext


def exempt_filter(df: DataFrame, exempt_substrings: list[str], url_col: str = "url") -> DataFrame:
    """S2: keep rows whose url contains none of the exempt substrings."""
    out = df
    for s in exempt_substrings:
        out = out.filter(~F.col(url_col).contains(s))
    return out


def protected_rows(df: DataFrame, marker: str = "!", url_col: str = "url") -> DataFrame:
    """P3: rows exempt from rename/delete planning."""
    return df.filter(F.col(url_col).contains(marker))


def degenerate_guard(fp: DataFrame) -> DataFrame:
    """P2: drop docs with empty shingle sets before near-dup stages."""
    return fp.filter(F.col("n_shingles") > 0)


def clusters_report(
    clusters: DataFrame,
    fingerprints: DataFrame,
    sample_size: int = 4,
) -> DataFrame:
    """S10: per-cluster human-review table — size, total chars (A5),
    and a deterministic url sample (sorted, first k)."""
    joined = clusters.join(fingerprints.select("url", "n_chars"), "url")
    return joined.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.sum("n_chars").alias("total_chars"),
        F.slice(F.sort_array(F.collect_list("url")), 1, sample_size).alias("sample_urls"),
    )


def apply_keep_overrides(ranked: DataFrame, overrides: DataFrame) -> DataFrame:
    """R6: overrides(cluster_id, keep_url) forces is_canonical; falls
    back to the ranked winner for clusters without an override."""
    ov = overrides.select("cluster_id", F.col("keep_url").alias("_ov_keep"))
    return (
        ranked.join(ov, "cluster_id", "left")
        .withColumn(
            "is_canonical",
            F.when(F.col("_ov_keep").isNotNull(), F.col("url") == F.col("_ov_keep"))
            .otherwise(F.col("is_canonical")),
        )
        .drop("_ov_keep")
    )


def undo_script(actions: DataFrame) -> DataFrame:
    """S9: the materialized undo artifact (reference writes an undo
    script beside its rename/delete actions, dedupc.py:329-337) as a
    distributed table — one row per REVERSIBLE action with a
    ready-to-run line.  Accepts either the pipeline's action log
    (op='delete' reverses to a restore) or a ``rename_plan`` output
    (op='rename' reverses to a move back).  Sink it with
    ``df.select("undo_line").write.text(path)`` — no driver collect.

    Output: (url, undo_op, undo_line)."""
    if "new_name" in actions.columns:
        return actions.filter(F.col("op") == "rename").select(
            "url",
            F.lit("rename_back").alias("undo_op"),
            F.concat(
                F.lit("mv\t"), F.col("new_name"), F.lit("\t"), F.col("url")
            ).alias("undo_line"),
        )
    return actions.filter(F.col("op") == "delete").select(
        "url",
        F.lit("restore").alias("undo_op"),
        F.concat(F.lit("restore\t"), F.col("url")).alias("undo_line"),
    )


def rename_plan(fingerprints: DataFrame, clusters: DataFrame) -> DataFrame:
    """Rename-to-fingerprint plan (dedupc.py:280-341): every clustered
    doc's new name is its cluster fingerprint; members of multi-doc
    clusters get the CRC32 disambiguation suffix (H3, dedupc.py:316-320).

    Output: (url, new_name, op='rename') — the actions/undo audit
    (applying it is the sink's job; reversal = swap columns, the S9
    undo-script analog)."""
    j = clusters.join(
        fingerprints.select("url", "content_md5", F.crc32(F.col("content_md5")).alias("crc")),
        "url",
    )
    ext = leaf_ext(F.col("url"))
    new_name = F.when(
        F.col("cluster_size") > 1,
        F.concat(F.col("content_md5"), F.lit("_"), F.col("crc").cast("string"), ext),
    ).otherwise(F.concat(F.col("content_md5"), ext))
    return j.select(
        "url",
        new_name.alias("new_name"),
        F.lit("rename").alias("op"),
    )
