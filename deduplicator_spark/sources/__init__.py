from deduplicator_spark.sources.pages import (
    PAGES_SCHEMA,
    TRUTH_SCHEMA,
    synth_pages,
    synth_pages_with_truth,
    synth_truth,
)
from deduplicator_spark.sources.loaders import load_table, load_documents_as_pages
from deduplicator_spark.sources.extract import extract_text
from deduplicator_spark.sources.snapshots import SnapshotConflict, SnapshotTable
from deduplicator_spark.sources.shards import (
    pack_manifest,
    sample_bucket,
    shard_assignment,
    shard_manifest,
    stratified_sample,
    write_training_shards,
)

__all__ = [
    "pack_manifest",
    "sample_bucket",
    "shard_assignment",
    "stratified_sample",
    "shard_manifest",
    "write_training_shards",
    "PAGES_SCHEMA",
    "TRUTH_SCHEMA",
    "synth_pages",
    "synth_pages_with_truth",
    "synth_truth",
    "load_table",
    "load_documents_as_pages",
    "extract_text",
    "SnapshotConflict",
    "SnapshotTable",
]
