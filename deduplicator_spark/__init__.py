"""deduplicator_spark — a PySpark-native near-duplicate detection and
clustering engine for web-scale text.

Re-expresses the query/data-processing capabilities of the reference
(GiovanH/deduplicator: perceptual-hash image dedup over a JSON shelve,
see SURVEY.md) as an idiomatic Spark DataFrame pipeline over
Common-Crawl-style page tables:

    pages(url, warc_ts, html, text, lang)
      -> extract_text (byte-identical invariant)
      -> fingerprints (md5 exact / MinHash / SimHash, vectorized Arrow UDFs)
      -> LSH banding -> candidate pairs -> exact-Jaccard verify
      -> connected components (iterative label propagation)
      -> clusters -> canonical ranking -> actions (audit log)

Everything is DataFrame API + AQE config; no RDDs, no per-row Python
UDFs, no private Spark APIs.
"""

from deduplicator_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
