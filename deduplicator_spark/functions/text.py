"""JVM-side text column expressions (whole-stage-codegen friendly).

These mirror the normalization used inside the fingerprint UDF
(lowercase + whitespace collapse) so SQL oracles and Spark agree, and
provide the text-analysis surface a training-data pipeline needs
(token counting, quality scoring, language heuristics) without any
Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """lowercase + collapse runs of whitespace + trim — identical to the
    fingerprint UDF's tokenizer pre-pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def ccnet_normalize(col: Column | str) -> Column:
    """Aggressive near-exact normalization (CCNet-style): lowercase,
    fold every digit to '0', strip everything that is not a
    letter/number/whitespace, collapse whitespace runs, trim.

    Docs that differ only in case, punctuation, numbers, or spacing
    hash identically afterwards — the cheap "fuzzy-exact" dedup tier
    between byte-identity md5 and MinHash.  Pure JVM regex, and every
    pattern is RE2-compatible so a DuckDB oracle can mirror it
    step-for-step.
    """
    c = F.col(col) if isinstance(col, str) else col
    folded = F.regexp_replace(F.lower(c), r"[0-9]", "0")
    kept = F.regexp_replace(folded, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(kept, r"\s+", " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count of the normalized text; 0 for empty."""
    n = normalize_text(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


def char_ngrams_hashed(col: Column | str, n: int) -> Column:
    """Array of xxhash64 values of character n-grams (JVM-side).

    Used for n-gram Jaccard similarity without leaving the JVM:
    substring via transform over a position sequence.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = normalize_text(c)
    return F.when(F.length(norm) < n, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(norm) - n + 1),
                lambda i: F.xxhash64(norm.substr(i, F.lit(n))),
            )
        )
    )


def punct_count(col: Column | str, chars: str = "-_ +") -> Column:
    """Count of characters from ``chars`` in the column — the
    'detailed filenames better' ranking signal (dedupc.py:87):
    length(x) - length(translate(x, chars, ''))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.translate(c, chars, ""))
