"""S4: html -> text extraction (the decode source).

Reference analog: the image-decode source (dupedb.py:85) — the step
that turns the stored raw bytes into the representation every
downstream fingerprint sees.  BASELINE.json's input_hint pins the
invariant: extraction must be BYTE-IDENTICAL per url (the same html
must always yield the same text, and on the synthetic fixture
``extract_text(html) == text`` exactly — pinned in
tests/test_sources.py).

Implementation notes (100 TB posture):
- one vectorized pandas UDF over Arrow batches; all heavy lifting is
  pandas' C-level ``str.replace`` regex engine — no per-row Python
  beyond the initial utf-8 decode,
- script/style/comment blocks are removed BEFORE tag stripping so
  their contents don't leak into the text,
- the five standard entities are unescaped LAST (order matters:
  '&amp;lt;' must become '&lt;', not '<'),
- no whitespace normalization: the fingerprint UDF owns tokenization,
  and collapsing here would break the byte-identity invariant for
  whitespace-significant documents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_BLOCK_RE = r"(?is)<(script|style)[^>]*>.*?</\1\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"

# unescape order: every numeric/named entity except &amp; first,
# &amp; strictly last
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    s = s.str.replace(_BLOCK_RE, "", regex=True)
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s
