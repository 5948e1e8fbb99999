from deduplicator_spark.functions.fingerprints import (
    FINGERPRINT_STRUCT,
    make_fingerprint_udf,
    shingle_set_py,
    minhash_py,
)
from deduplicator_spark.functions.text import normalize_text, token_count, char_ngrams_hashed
from deduplicator_spark.functions.urls import canonical_url, url_dup_groups
from deduplicator_spark.functions.pii import pii_counts, pii_report, redact_pii
from deduplicator_spark.functions.text import ccnet_normalize
from deduplicator_spark.functions.lm import lm_score, train_bigram_lm
from deduplicator_spark.functions.bloom import bloom_build, bloom_probe

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
    "ccnet_normalize",
    "lm_score",
    "train_bigram_lm",
    "bloom_build",
    "bloom_probe",
]
