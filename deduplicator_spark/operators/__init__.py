from deduplicator_spark.operators.exact import exact_clusters, exact_dup_pairs
from deduplicator_spark.operators.buckets import bucket_pairs
from deduplicator_spark.operators.filters import (
    apply_keep_overrides,
    clusters_report,
    degenerate_guard,
    exempt_filter,
    protected_rows,
    rename_plan,
    undo_script,
)
from deduplicator_spark.operators.lsh import (
    cross_snapshot_pairs,
    band_explode,
    candidate_pairs,
    estimate_jaccard,
    simhash_pairs,
    verify_pairs,
    verify_pairs_two_stage,
    verify_pairs_two_stage_recompute,
)
from deduplicator_spark.operators.components import connected_components, clusters_from_pairs, update_clusters
from deduplicator_spark.operators.ranking import (
    actions_from_ranking,
    super_state,
    with_canonical,
)
from deduplicator_spark.operators.series import filter_known_alts, series_info, with_series_columns
from deduplicator_spark.operators.incremental import (
    apply_journal,
    snapshot_diff,
    changed_fingerprints,
    new_docs,
    prune,
    purge,
    validate_merge,
)
from deduplicator_spark.operators.substring import (
    longest_common_substring_len,
    substring_pairs,
    suffix_array,
)
from deduplicator_spark.operators.ann import cosine_topk_pairs, hyperplane_lsh_pairs
from deduplicator_spark.operators.multimodal import (
    extract_media_features,
    media_near_dup_pairs,
)
from deduplicator_spark.operators.spans import span_dedup
from deduplicator_spark.operators.segments import (
    boilerplate_segments,
    remove_duplicate_segments,
    contamination_check,
    gopher_quality_filter,
    duplicate_segment_stats,
    intra_doc_repetition,
    segment_hashes,
    word_ngram_hashes,
)
from deduplicator_spark.operators.windows import latest_snapshot, windowed_dedup
from deduplicator_spark.operators.exact import normalized_exact_clusters
from deduplicator_spark.operators.tiers import dedup_tiers, tier_summary
from deduplicator_spark.operators.cdc import cdc_chunk_table, cdc_dedup_stats, chunk_doc
from deduplicator_spark.operators.evaluate import pair_metrics
from deduplicator_spark.operators.softdedup import soft_dedup_summary, soft_dedup_weights

__all__ = [
    "bucket_pairs",
    "span_dedup",
    "cross_snapshot_pairs",
    "remove_duplicate_segments",
    "apply_keep_overrides",
    "clusters_report",
    "degenerate_guard",
    "exempt_filter",
    "protected_rows",
    "rename_plan",
    "undo_script",
    "verify_pairs_two_stage",
    "verify_pairs_two_stage_recompute",
    "exact_clusters",
    "exact_dup_pairs",
    "band_explode",
    "candidate_pairs",
    "estimate_jaccard",
    "simhash_pairs",
    "verify_pairs",
    "connected_components",
    "clusters_from_pairs",
    "update_clusters",
    "actions_from_ranking",
    "super_state",
    "with_canonical",
    "filter_known_alts",
    "series_info",
    "with_series_columns",
    "apply_journal",
    "snapshot_diff",
    "changed_fingerprints",
    "new_docs",
    "prune",
    "purge",
    "validate_merge",
    "longest_common_substring_len",
    "substring_pairs",
    "suffix_array",
    "cosine_topk_pairs",
    "hyperplane_lsh_pairs",
    "extract_media_features",
    "media_near_dup_pairs",
    "boilerplate_segments",
    "contamination_check",
    "duplicate_segment_stats",
    "gopher_quality_filter",
    "intra_doc_repetition",
    "segment_hashes",
    "word_ngram_hashes",
    "windowed_dedup",
    "latest_snapshot",
    "normalized_exact_clusters",
    "dedup_tiers",
    "tier_summary",
    "cdc_chunk_table",
    "cdc_dedup_stats",
    "chunk_doc",
    "pair_metrics",
    "soft_dedup_summary",
    "soft_dedup_weights",
]
