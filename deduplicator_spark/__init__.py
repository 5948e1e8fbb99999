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

import os as _os

# numpy >= 1.18 calls madvise(MADV_HUGEPAGE) on every allocation >= 4 MB.
# On kernels with THP defrag=madvise (this box), each huge-page fault
# then attempts SYNCHRONOUS direct compaction — measured here at
# ~300 ms per fault, failing every time (AnonHugePages stays 0), which
# turned a 0.07 s batch-fill into 17 s and made every vectorized-UDF
# worker stall 10-20 s on its first Arrow batches (the round-2 bench
# "noise" and the q3/q5 regressions were exactly this).  Disable the
# madvise in THIS process (covers Spark Python workers too: unpickling
# any of our UDFs imports this package before the first batch runs)
# and via env for any numpy imported later elsewhere.  Honoring a
# pre-set value so deployments with healthy THP can re-enable it.
if _os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0") == "0":
    try:
        from numpy.core import multiarray as _np_multiarray

        _np_multiarray._set_madvise_hugepage(False)
    except (ImportError, AttributeError):  # future numpy moved/removed it
        pass

from deduplicator_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
