"""Segment- and n-gram-level repetition operators (training-data hygiene).

Two staples of web-scale LLM data pipelines the document-level dedup
chain does not cover:

* **Cross-document segment dedup** (CCNet/Falcon line-dedup analog):
  split each document into non-overlapping ``w``-word windows, hash each
  window, and flag windows that occur in >= ``min_docs`` distinct
  documents.  Per-document output = how much of the doc is boilerplate
  shared with other docs.  Reference analog: the per-file content hash
  grouping of dupedb.py:255-257, pushed below document granularity.

* **Intra-document repetition** (Gopher-style duplicate n-gram
  fraction, Rae et al. 2021 §A1.1): the fraction of sliding word
  n-grams in a document that are repeats of an earlier n-gram in the
  same document.  High values mark degenerate/spammy pages.

Scale notes (100 TB): segment hashing is a per-row JVM expression
(whole-stage codegen, no Python); the cross-doc stage is one
map-side-combinable groupBy on a 32-byte hash plus one hash-join back —
the same shuffle shape as the exact-dup stage.  The intra-doc operator
is shuffle-free (pure per-row column algebra).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deduplicator_spark.functions.text import normalize_text


def _words(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(normalize_text(c), " ")


def segment_hashes(text_col: Column | str, w: int = 10) -> Column:
    """md5 of each non-overlapping ``w``-word window of the normalized
    text (array<string>; empty when the doc has fewer than ``w`` words).

    md5 over the joined words (not xxhash64) so a DuckDB oracle can
    reproduce the hashes byte-for-byte.
    """
    words = _words(text_col)
    n_seg = F.floor(F.size(words) / w).cast("int")
    return F.when(n_seg <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i * w + 1, w))),
        )
    )


def word_ngram_hashes(text_col: Column | str, n: int = 3) -> Column:
    """md5 of each sliding word ``n``-gram of the normalized text."""
    words = _words(text_col)
    k = F.size(words) - n + 1
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, n))),
        )
    )


def duplicate_segment_stats(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document cross-corpus boilerplate stats.

    Returns ``(key, n_segments, n_dup_segments, dup_segment_ratio)`` for
    every document with at least one segment that also appears in
    >= ``min_docs`` distinct documents.  ``dup_segment_ratio`` is the
    fraction of the doc's segments that are shared, rounded to 4 dp.
    """
    segs = docs.select(key, F.explode(segment_hashes(text_col, w)).alias("seg_md5"))
    shared = (
        segs.groupBy("seg_md5")
        .agg(F.countDistinct(key).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("seg_md5", F.lit(1).alias("is_dup"))
    )
    marked = segs.join(shared, "seg_md5", "left")
    return (
        marked.groupBy(key)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.coalesce("is_dup", F.lit(0))).alias("n_dup_segments"),
        )
        .filter(F.col("n_dup_segments") > 0)
        .withColumn(
            "dup_segment_ratio",
            F.round(F.col("n_dup_segments") / F.col("n_segments").cast("double"), 4),
        )
    )


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag documents containing any word
    ``n``-gram from a probe set (the eval-suite n-grams a training
    corpus must not leak).

    ``probes`` must have a ``gram_md5`` column (build it with
    ``word_ngram_hashes`` over the benchmark text).  Probe sets are
    small relative to the corpus (a full eval suite is ~10^6 n-grams),
    so the containment join broadcasts the probes — the corpus side
    never shuffles; each partition streams its grams past an in-memory
    hash set.

    Returns ``(key, n_matched_ngrams, n_distinct_probes)`` for
    documents with at least one hit.
    """
    grams = docs.select(key, F.explode(word_ngram_hashes(text_col, n)).alias("gram_md5"))
    hits = grams.join(
        F.broadcast(probes.select("gram_md5").distinct()), "gram_md5"
    )
    return hits.groupBy(key).agg(
        F.count("*").alias("n_matched_ngrams"),
        F.countDistinct("gram_md5").alias("n_distinct_probes"),
    )


def gopher_quality_filter(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_dup_ngram_frac: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1):
    token-count bounds, mean-word-length bounds, and an intra-doc
    duplicate-trigram cap, each reported by name so a dropped doc says
    why.  Shuffle-free per-row JVM column algebra.

    Returns ``(key, n_tok, mean_word_len, dup_ngram_frac, keep,
    reasons)`` — ``reasons`` is a comma-joined list of violated rules in
    fixed order; ``keep`` is true iff it's empty.  Thresholds compare
    the ROUNDED metrics so an oracle reproducing the rounding makes
    identical decisions.
    """
    c = F.col(text_col)
    norm = normalize_text(c)
    nt = F.when(F.length(norm) == 0, F.lit(0)).otherwise(F.size(F.split(norm, " "))).cast("long")
    grams = word_ngram_hashes(c, n)
    sized = docs.select(
        key,
        nt.alias("n_tok"),
        F.length(norm).alias("_n_chars"),
        F.size(grams).cast("long").alias("_n_ngrams"),
        F.size(F.array_distinct(grams)).cast("long").alias("_n_distinct"),
    )
    mean_wl = F.when(
        F.col("n_tok") > 0,
        F.round(
            (F.col("_n_chars") - (F.col("n_tok") - 1)) / F.col("n_tok").cast("double"), 4
        ),
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(F.col("_n_ngrams") <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0) - F.col("_n_distinct") / F.col("_n_ngrams").cast("double"), 4
        )
    )
    metered = sized.select(
        key,
        "n_tok",
        mean_wl.alias("mean_word_len"),
        dup_frac.alias("dup_ngram_frac"),
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_tok") < min_tokens, F.lit("too_short")),
        F.when(F.col("n_tok") > max_tokens, F.lit("too_long")),
        F.when(
            (F.col("n_tok") > 0)
            & (
                (F.col("mean_word_len") < min_word_len)
                | (F.col("mean_word_len") > max_word_len)
            ),
            F.lit("word_length"),
        ),
        F.when(F.col("dup_ngram_frac") > max_dup_ngram_frac, F.lit("repetition")),
    )
    return metered.withColumn("reasons", reasons).withColumn(
        "keep", F.col("reasons") == ""
    )


def boilerplate_segments(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    min_docs: int = 3,
    k: int = 20,
) -> DataFrame:
    """Corpus-level boilerplate mining: the top-``k`` ``w``-word segments
    ranked by how many distinct documents contain them (nav bars,
    cookie banners, repeated disclaimers at web scale).

    Returns ``(seg_md5, n_docs, n_occurrences)`` ordered by
    ``(n_docs DESC, seg_md5)`` — a deterministic order so the top-k cut
    is reproducible.  One map-side-combinable groupBy; the final top-k
    is a TakeOrderedAndProject (per-partition heap + driver merge of k
    rows), not a global sort.
    """
    segs = docs.select(key, F.explode(segment_hashes(text_col, w)).alias("seg_md5"))
    return (
        segs.groupBy("seg_md5")
        .agg(
            F.countDistinct(key).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.asc("seg_md5"))
        .limit(k)
    )


def remove_duplicate_segments(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Segment-level corpus REWRITE (CCNet/Falcon line-dedup analog,
    the segment sibling of operators/spans.py): every non-overlapping
    ``w``-word window that occurs in >= ``min_docs`` distinct documents
    is cut from every document EXCEPT the one with the smallest key
    (keep-first — the first occurrence survives, all its own repeats
    included).  The document is rebuilt from its kept windows plus the
    sub-window tail, space-joined.

    Returns one row per document:
    ``(key, n_segments, n_removed, clean_len, clean_md5)`` where
    ``clean_md5``/``clean_len`` describe the rewritten normalized text.

    Scale shape: one map-side-combinable groupBy on the 32-byte segment
    hash (min(key) + distinct count), one hash-join back on the hash,
    one groupBy(key) collecting removed window indices (ints), and a
    final JVM-only reconstruction — no Python in any path.
    """
    words = _words(text_col)
    n_seg = F.floor(F.size(words) / w).cast("int")

    segs = docs.select(
        key, F.posexplode(segment_hashes(text_col, w)).alias("idx", "seg_md5")
    )
    shared = (
        segs.groupBy("seg_md5")
        .agg(F.countDistinct(key).alias("n_docs"), F.min(key).alias("first_key"))
        .filter(F.col("n_docs") >= min_docs)
    )
    removed = (
        segs.join(shared, "seg_md5")
        .filter(F.col(key) != F.col("first_key"))
        .groupBy(key)
        .agg(
            F.sort_array(F.collect_list("idx")).alias("removed_idx"),
            F.count("*").alias("n_removed"),
        )
    )

    base = docs.select(key, words.alias("_w"), n_seg.alias("_n_seg"))
    joined = base.join(removed, key, "left").select(
        key,
        "_w",
        "_n_seg",
        F.coalesce("removed_idx", F.array().cast("array<int>")).alias("_rm"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
    )
    kept_windows = F.flatten(
        F.transform(
            F.filter(
                F.sequence(F.lit(0), F.col("_n_seg") - 1),
                lambda i: ~F.array_contains(F.col("_rm"), i),
            ),
            lambda i: F.slice(F.col("_w"), i * w + 1, w),
        )
    )
    tail = F.when(
        F.size("_w") > F.col("_n_seg") * w,
        F.slice(
            F.col("_w"), F.col("_n_seg") * w + 1, F.size("_w") - F.col("_n_seg") * w
        ),
    ).otherwise(F.array().cast("array<string>"))
    clean = F.array_join(
        F.concat(
            F.when(F.col("_n_seg") > 0, kept_windows).otherwise(
                F.array().cast("array<string>")
            ),
            tail,
        ),
        " ",
    )
    return joined.select(
        key,
        F.col("_n_seg").cast("long").alias("n_segments"),
        "n_removed",
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


def intra_doc_repetition(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document duplicate word-n-gram fraction (Gopher repetition
    signal).  Shuffle-free: every column is a JVM expression over the
    row's own text.

    Returns ``(key, n_ngrams, n_distinct_ngrams, dup_ngram_frac)`` for
    every document; ``dup_ngram_frac`` = 1 - distinct/total (0.0 when
    the doc is shorter than ``n`` words).
    """
    grams = word_ngram_hashes(text_col, n)
    sized = docs.select(
        key,
        F.size(grams).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct_ngrams"),
    )
    return sized.withColumn(
        "dup_ngram_frac",
        F.when(F.col("n_ngrams") <= 0, F.lit(0.0)).otherwise(
            F.round(
                F.lit(1.0) - F.col("n_distinct_ngrams") / F.col("n_ngrams").cast("double"),
                4,
            )
        ),
    )
