"""Adversarial input suite for the html->text extractor (VERDICT r4
next #8): the decode source guards the byte-identity invariant for the
whole raw-html pipeline (q8), so — like the image decoders
(test_multimodal.py) — it must survive malformed input without ever
throwing from inside the UDF.  The S6 quarantine contract
(`dupedb.py:229-244`): a degenerate document is extracted to whatever
text its bytes honestly yield (possibly empty, then quarantined
downstream by the zero-shingle gate), NEVER an executor exception.

Checked on every case, through the real Arrow UDF path:
- no throw, one output row per input row,
- output is a string (or NULL only for NULL input),
- deterministic: a second pass yields byte-identical text.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicator_spark.sources.extract import extract_text

MALFORMED = [
    # -- unclosed / misnested tags --
    b"<p>unclosed paragraph",
    b"<div><span>misnested</div></span>",
    b"<",
    b"<<<>>><<",
    b"text < 5 and > 3",  # bare angle brackets mid-text
    b"<a href='x' <b>nested open</a>",
    # -- script/style edge shapes --
    b"<script>var x = '<p>not text</p>';",  # unclosed script
    b"<script><script>alert(1)</script></script>trailing",
    b"<style>body { color: red; }</style>kept",
    b"<SCRIPT SRC=x>ignored</SCRIPT>case",
    b"<script>a</script><script>b</script>c",
    # -- comments --
    b"<!-- unterminated comment <p>swallowed?</p>",
    b"<!--><p>tricky short comment</p>",
    b"a<!-- c1 -->b<!-- c2 -->c",
    # -- entities --
    b"&amp;lt; must stay &lt; after double-unescape order",
    b"&unknown; &amp garbage &;&#x;&#",
    b"&#39;&quot;&nbsp;&gt;&lt;&amp;",
    b"&amp;amp;amp;",
    # -- encoding garbage --
    b"\xff\xfe invalid utf8 \x80\x81 bytes",
    b"\x00null\x00bytes\x00",
    "café <b>utf8 ok</b> ☃".encode("utf-8"),
    "latin1 café".encode("latin-1"),  # wrong-encoding bytes
    b"\xed\xa0\x80 lone surrogate bytes",
    # -- degenerate sizes / shapes --
    b"",
    b" ",
    b"<p></p>",
    b"<" * 2000,
    b">" * 2000,
    b"<p>" * 500 + b"deep" + b"</p>" * 500,
    b"plain text with no markup at all",
]


@pytest.fixture(scope="module")
def fuzz_df(spark):
    rng = np.random.Generator(np.random.PCG64(1234))
    garbage = [rng.bytes(n) for n in (1, 17, 256, 4096) for _ in range(8)]
    rows = [(i, b) for i, b in enumerate(MALFORMED + garbage)]
    rows.append((len(rows), None))  # NULL html
    return spark.createDataFrame(rows, "id long, html binary")


def test_extract_never_throws_and_is_total(fuzz_df):
    out = fuzz_df.select("id", "html", extract_text(F.col("html")).alias("text"))
    rows = {r["id"]: (r["html"], r["text"]) for r in out.collect()}
    assert len(rows) == fuzz_df.count()  # one output per input, no drop
    for i, (html, text) in rows.items():
        if html is None:
            assert text is None
        else:
            assert isinstance(text, str), (i, html[:40])


def test_extract_is_deterministic_on_garbage(fuzz_df):
    a = {r["id"]: r["t"] for r in
         fuzz_df.select("id", extract_text("html").alias("t")).collect()}
    b = {r["id"]: r["t"] for r in
         fuzz_df.select("id", extract_text("html").alias("t")).collect()}
    assert a == b


def test_extract_entity_order_on_malformed_neighbors():
    """'&amp;lt;' must yield the literal '&lt;' even when surrounded by
    broken entities — the unescape order is load-bearing and must not
    be disturbed by non-matching '&' noise."""
    import pandas as pd

    f = extract_text.func  # the raw pandas function under the UDF
    got = f(pd.Series([b"&;x &amp;lt; y&#", b"&amp;amp;"]))
    assert got.tolist() == ["&;x &lt; y&#", "&amp;"]


def test_extract_script_stripping_on_unclosed_blocks():
    import pandas as pd

    f = extract_text.func
    got = f(pd.Series([
        b"<script>var x = 1;",          # unclosed: tag strip still fires
        b"before<style>p{}</style>after",
    ]))
    # unclosed script: the block regex can't match, but the tag regex
    # removes '<script>'; the JS body honestly remains as text (it IS
    # the document's bytes) — the invariant is no-throw + determinism
    assert got.tolist() == ["var x = 1;", "beforeafter"]
