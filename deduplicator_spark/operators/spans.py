"""Duplicate-SPAN removal — the corpus rewrite stage of exact-substring
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better": duplicated substrings are CUT from all but one occurrence,
instead of dropping whole documents).

The reference has no analog (it deletes whole files, dedupc.py:24-32);
``operators/substring.py`` *detects* long shared substrings — this
operator goes one step further and rewrites the corpus.

Coverage definition (exact, oracle-friendly): position ``p`` of doc
``b``'s normalized text is duplicated w.r.t. doc ``a`` iff ``p`` lies
inside some substring of length >= ``L`` shared by ``a`` and ``b``.
That set is EXACTLY the union of ``[p, p+L)`` over the positions ``p``
whose L-gram ``b[p:p+L]`` also occurs in ``a`` — every shared substring
of length ``m >= L`` is the union of its ``m - L + 1`` constituent
L-grams, and every shared L-gram is itself a shared substring of
length L.  So L-gram membership (one rolling-hash pass per text, no
suffix array) computes the same cover a suffix-array walk would.

Keep-first policy: doc ``b`` loses the spans it shares with any doc
``a < b`` (url order); the smallest url in a duplicate group keeps its
text intact.  Single pass over the ORIGINAL corpus (like Lee et al.):
coverage is computed against partners' original text, not their
cleaned text.

Scale shape: candidates come from the shared winnowing-anchor bucket
join (recall 1.0 for matches >= L by the winnowing guarantee, hot
anchors capped with logged overflow); partner texts cross the shuffle
once per candidate pair and the b-side text once per occupied
(url_b, salt) subgroup; interval merging across subgroups is pure JVM
window algebra (gaps-and-islands); only the final cut rewrites text in
a pandas UDF, one row per doc.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deduplicator_spark.config import DedupConfig

_U64 = np.uint64
_BASE = _U64(0x100000001B3)


def _norm(t: str | None) -> str:
    return " ".join((t or "").lower().split())


def _gram_hashes(norm: str, L: int) -> np.ndarray:
    """64-bit rolling polynomial hashes of every L-byte gram of the
    UTF-8 normalized text (same family as the winnowing UDF; position
    i = byte offset i)."""
    raw = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(_U64)
    if len(raw) < L:
        return np.empty(0, dtype=_U64)
    win = np.lib.stride_tricks.sliding_window_view(raw, L)
    weights = _BASE ** np.arange(L, dtype=_U64)
    with np.errstate(over="ignore"):
        g = (win * weights).sum(axis=1, dtype=_U64)
        return (g ^ (g >> _U64(31))) * _U64(0xBF58476D1CE4E5B9)


def _covered_intervals(nb: str, partner_norms: list[str], L: int) -> list[tuple[int, int]]:
    """Merged [start, end) byte intervals of ``nb`` covered by an
    L-gram shared with any partner text."""
    gb = _gram_hashes(nb, L)
    if not len(gb):
        return []
    blen = len(nb.encode("utf-8"))
    diff = np.zeros(blen + 1, dtype=np.int64)
    hit_any = False
    for na in partner_norms:
        ga = _gram_hashes(na, L)
        if not len(ga):
            continue
        hits = np.flatnonzero(np.isin(gb, ga))
        if len(hits):
            hit_any = True
            np.add.at(diff, hits, 1)
            np.add.at(diff, hits + L, -1)
    if not hit_any:
        return []
    covered = np.cumsum(diff[:-1]) > 0
    # runs of True -> merged intervals
    edges = np.flatnonzero(np.diff(np.concatenate(([0], covered.view(np.int8), [0]))))
    return [(int(edges[i]), int(edges[i + 1])) for i in range(0, len(edges), 2)]


def _interval_schema(url_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", url_type, False),
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
        ]
    )


def _report_schema(url_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", url_type, False),
            T.StructField("orig_len", T.IntegerType(), False),
            T.StructField("covered_chars", T.IntegerType(), False),
            T.StructField("n_spans", T.IntegerType(), False),
            T.StructField("clean_len", T.IntegerType(), False),
            T.StructField("clean_md5", T.StringType(), False),
        ]
    )


def span_dedup(
    pages: DataFrame,
    cfg: DedupConfig,
    text_col: str = "text",
    min_len: int | None = None,
    max_bucket: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Per-doc duplicate-span report over the whole corpus.

    Returns ``(report, overflow)`` where report has one row per input
    doc: (url, orig_len, covered_chars, n_spans, clean_len, clean_md5)
    — lengths in BYTES of the utf-8 normalized text, ``clean_md5`` the
    md5 of the normalized text with covered spans cut (concatenation
    of the kept pieces).  ``overflow`` is the capped-anchor audit from
    the candidate stage.
    """
    from deduplicator_spark.operators.buckets import bucket_pairs
    from deduplicator_spark.operators.substring import make_winnow_udf

    L = min_len or cfg.substring_min_len
    max_bucket = max_bucket or cfg.max_band_bucket
    url_type = pages.schema["url"].dataType

    winnow = make_winnow_udf(cfg)
    # (url, anchor) is distinct by construction — the winnow UDF
    # np.unique's anchors per doc (see substring_pairs)
    anchors = pages.select("url", text_col).select(
        "url", F.explode(winnow(F.col(text_col))).alias("anchor")
    )
    # overcap="star": span removal is a COVERAGE consumer — every doc
    # in a hot anchor bucket (exactly the boilerplate case span removal
    # targets) must still find a partner sharing the anchor, so
    # over-cap buckets pair every member against the sorted min-url
    # prefix instead of the connectivity-only ring (ADVICE r2 #1)
    cand, overflow = bucket_pairs(anchors, ["anchor"], max_bucket, overcap="star")

    # coverage groups keyed by the LOSING side (url_b): partner (a)
    # texts ship once per pair, the b text once per occupied salt
    # subgroup.  Salting is ADAPTIVE like the substring verify: only
    # url_b docs with more than ``salt_threshold`` partners split into
    # ``n_salt`` subgroups — static salting multiplied the
    # applyInPandas group count (and the per-group overhead that
    # dominates at typical degrees) ~4x for nothing.
    n_salt = 16
    salt_threshold = 64
    texts = pages.select("url", F.col(text_col).alias("t"))
    deg = cand.groupBy("url_b").agg(F.count("*").alias("deg"))
    salt = (
        F.when(
            F.col("deg") > salt_threshold, F.pmod(F.xxhash64("url_a"), F.lit(n_salt))
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("salt")
    )
    cand_deg = cand.join(deg, "url_b")
    partners = cand_deg.join(
        texts.withColumnsRenamed({"url": "url_a"}), "url_a"
    ).select("url_b", "url_a", "t", F.lit(False).alias("is_self"), salt)
    selfs = (
        cand_deg.select("url_b", salt)
        .distinct()
        .join(texts.withColumnsRenamed({"url": "url_b"}), "url_b")
        .select("url_b", F.col("url_b").alias("url_a"), "t", F.lit(True).alias("is_self"), "salt")
    )

    def cover_group(pdf: pd.DataFrame) -> pd.DataFrame:
        self_rows = pdf[pdf["is_self"]]
        part = pdf[~pdf["is_self"]]
        if not len(self_rows) or not len(part):
            return pd.DataFrame(columns=["url", "start", "end"])
        url_b = self_rows["url_b"].iloc[0]
        nb = _norm(self_rows["t"].iloc[0])
        iv = _covered_intervals(nb, [_norm(t) for t in part["t"]], L)
        return pd.DataFrame(
            [(url_b, s, e) for s, e in iv], columns=["url", "start", "end"]
        )

    intervals = (
        partners.unionByName(selfs)
        .groupBy("url_b", "salt")
        .applyInPandas(cover_group, schema=_interval_schema(url_type))
    )

    # merge intervals ACROSS salt groups — gaps-and-islands, all JVM
    w = Window.partitionBy("url").orderBy("start", "end")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    islands = (
        intervals.withColumn("prev_end", F.max("end").over(wprev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull() | (F.col("start") > F.col("prev_end")), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("url", "island")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
    )
    spans_per_doc = islands.groupBy("url").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("start"), F.col("end")))
        ).alias("spans")
    )

    # final rewrite: one pandas pass, one row per doc
    def cut_batch(it):
        for pdf in it:
            rows = []
            for url, t, spans in zip(pdf["url"], pdf["t"], pdf["spans"]):
                nb = _norm(t).encode("utf-8")
                pieces, pos = [], 0
                n_spans = 0
                covered = 0
                if spans is not None and len(spans):
                    for s in spans:
                        st, en = int(s["start"]), int(s["end"])
                        pieces.append(nb[pos:st])
                        covered += en - st
                        n_spans += 1
                        pos = en
                pieces.append(nb[pos:])
                clean = b"".join(pieces)
                rows.append(
                    (
                        url,
                        len(nb),
                        covered,
                        n_spans,
                        len(clean),
                        hashlib.md5(clean).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "orig_len", "covered_chars", "n_spans", "clean_len", "clean_md5",
                ],
            )

    report = (
        texts.join(spans_per_doc, "url", "left")
        .mapInPandas(cut_batch, schema=_report_schema(url_type))
    )
    return report, overflow
