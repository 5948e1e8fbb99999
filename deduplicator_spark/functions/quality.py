"""Text-analysis column functions for training-data pipelines.

All pure JVM column algebra (whole-stage codegen; no UDFs), and every
formula is hand-translatable to ANSI SQL so the DuckDB oracle can
reproduce it bit-for-bit:

- token counting (whitespace tokens over normalized text),
- quality scoring (length / stopword-ratio / token-length heuristics),
- language-ID heuristic (per-language function-word hit counts),
- document fingerprinting (md5, crc32, prefix fingerprint).

These extend the reference's quality-ranking signals (imageSize /
frames, dedupc.py:35-68) to the text domain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from deduplicator_spark.functions.text import normalize_text

# function-word lists per language (tiny, deterministic; heuristic only)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}


def _whole_word_hits(norm: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whole token (split-count idiom —
    identical formula in DuckDB: len(string_split(...)) - 1)."""
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    return F.size(F.split(padded, f" {word} ", -1)) - 1


def n_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    norm = normalize_text(c)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(F.size(F.split(norm, " ", -1)))


def stopword_hits(text: Column | str, words: list[str] | None = None) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    norm = normalize_text(c)
    out = F.lit(0)
    for w in words or LANG_MARKERS["en"]:
        out = out + _whole_word_hits(norm, w)
    return out


def quality_score(text: Column | str) -> Column:
    """[0,1] heuristic: length sweet-spot * stopword presence.

    score = least(n_tokens/100, 1) * 0.6 + least(stop_ratio*10, 1) * 0.4
    (rounded to 6 digits for oracle comparison stability).
    """
    nt = n_tokens(text).cast("double")
    stop = stopword_hits(text).cast("double")
    stop_ratio = F.when(nt > 0, stop / nt).otherwise(F.lit(0.0))
    score = F.least(nt / 100.0, F.lit(1.0)) * 0.6 + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.4
    return F.round(score, 6)


def lang_id(text: Column | str) -> Column:
    """argmax of per-language marker hits; 'und' if all zero.

    Expressed as a greatest/when cascade (deterministic tie-break by
    the fixed language order en, es, de, fr, zh).
    """
    c = F.col(text) if isinstance(text, str) else text
    norm = normalize_text(c)
    hits = {}
    for lang, words in LANG_MARKERS.items():
        h = F.lit(0)
        for w in words:
            h = h + _whole_word_hits(norm, w)
        hits[lang] = h
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        out = F.when(hits[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
#: marks (class-only regex — identical semantics in Java regex and
#: DuckDB's RE2, so the oracle reproduces it bit-for-bit)
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-style token count: the whitespace count (n_tokens)
    underestimates cost for punctuation/digit-heavy web text; this is
    the standard regex pre-tokenization pass (JVM regexp_extract_all,
    no UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def doc_fingerprints(text: Column | str, prefix_len: int = 60) -> list[Column]:
    """(content_md5, content_crc32, prefix_fp) — md5 exact identity,
    crc32 disambiguation suffix (reference: dedupc.py:316-320), and the
    cheap prefix fingerprint used for shared-prefix clustering."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.md5(c).alias("content_md5"),
        F.crc32(c).alias("content_crc32"),
        F.md5(F.substring(c, 1, prefix_len)).alias("prefix_fp"),
    ]
