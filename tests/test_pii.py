"""PII detection/redaction (hand-computed expectations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.functions.pii import pii_counts, pii_report, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(redact_pii("text").alias("r"), *pii_counts("text")).collect()[0]


def test_email_redaction(spark):
    r = _one(spark, "mail me at a.b+c@ex-ample.co.uk today")
    assert r.r == "mail me at <EMAIL> today"
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 0, 0)


def test_ip_and_phone(spark):
    r = _one(spark, "from 192.168.0.1 call +44 20 7946 0958 now")
    assert r.r == "from <IP> call <PHONE> now"
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 1, 1)


def test_clean_text_untouched(spark):
    text = "no pii here, just words and 42 numbers"
    r = _one(spark, text)
    assert r.r == text
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)


def test_redacted_dups_collapse(spark):
    """Two docs differing only in PII must redact to identical text —
    the reason redaction runs before dedup."""
    rows = [(1, "contact alice@a.com for info"), (2, "contact bob.c@b.org for info")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vals = {r.doc_id: r.red for r in df.select("doc_id", redact_pii("text").alias("red")).collect()}
    assert vals[1] == vals[2] == "contact <EMAIL> for info"


def test_pii_report_filters_clean_docs(spark):
    rows = [(1, "write x@y.io"), (2, "nothing here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pii_report(df, key="doc_id").collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].redacted_len == len("write <EMAIL>")
