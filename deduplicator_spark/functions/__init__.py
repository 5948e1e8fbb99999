from deduplicator_spark.functions.fingerprints import (
    FINGERPRINT_STRUCT,
    make_fingerprint_udf,
    shingle_set_py,
    minhash_py,
)
from deduplicator_spark.functions.text import normalize_text, token_count, char_ngrams_hashed
from deduplicator_spark.functions.urls import canonical_url, url_dup_groups
from deduplicator_spark.functions.pii import pii_counts, pii_report, redact_pii

__all__ = [
    "canonical_url",
    "url_dup_groups",
    "pii_counts",
    "pii_report",
    "redact_pii",
    "FINGERPRINT_STRUCT",
    "make_fingerprint_udf",
    "shingle_set_py",
    "minhash_py",
    "normalize_text",
    "token_count",
    "char_ngrams_hashed",
]
