from deduplicator_spark.streaming.incremental import IncrementalDedup
from deduplicator_spark.streaming.stateful import stateful_exact_dedup, stateful_near_dup_candidates

__all__ = ["IncrementalDedup", "stateful_exact_dedup", "stateful_near_dup_candidates"]
