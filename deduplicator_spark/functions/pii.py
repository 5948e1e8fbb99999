"""PII detection and redaction (JVM regexes, whole-stage codegen).

Web corpora are scrubbed for emails / IPs / phone numbers before
training.  Patterns are deliberately RE2-compatible (no lookaround, no
backreferences) so the DuckDB oracle applies the identical regexes —
same discipline as functions/urls.py.

Redaction replaces each match with a fixed token, preserving document
structure for downstream dedup (two docs differing only in PII redact
to identical text and then dedup exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: order matters: emails are redacted before phones so a phone pattern
#: can never eat digits out of an address's local part
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}"

_PATTERNS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_counts(col: Column | str) -> list[Column]:
    """(n_emails, n_ips, n_phones) match counts per row."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, _ in _PATTERNS:
        out.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long").alias(f"n_{name}s")
        )
    return out


def redact_pii(col: Column | str) -> Column:
    """Replace every email / IPv4 / phone match with its token."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in _PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_report(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII accounting for rows with at least one hit:
    ``(key, n_emails, n_ips, n_phones, redacted_len)``.  Shuffle-free
    per-row column algebra."""
    counted = docs.select(
        key,
        *pii_counts(text_col),
        F.length(redact_pii(text_col)).alias("redacted_len"),
    )
    return counted.filter(
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) > 0
    )
