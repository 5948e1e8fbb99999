from deduplicator_spark.streaming.incremental import IncrementalDedup

__all__ = ["IncrementalDedup"]
