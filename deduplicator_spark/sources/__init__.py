from deduplicator_spark.sources.pages import (
    PAGES_SCHEMA,
    TRUTH_SCHEMA,
    synth_pages,
    synth_pages_with_truth,
    synth_truth,
)
from deduplicator_spark.sources.loaders import load_table, load_documents_as_pages
from deduplicator_spark.sources.extract import extract_text

__all__ = [
    "PAGES_SCHEMA",
    "TRUTH_SCHEMA",
    "synth_pages",
    "synth_pages_with_truth",
    "synth_truth",
    "load_table",
    "load_documents_as_pages",
    "extract_text",
]
