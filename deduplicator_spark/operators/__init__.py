from deduplicator_spark.operators.exact import exact_clusters, exact_dup_pairs
from deduplicator_spark.operators.lsh import (
    band_explode,
    candidate_pairs,
    estimate_jaccard,
    verify_pairs,
)
from deduplicator_spark.operators.components import connected_components, clusters_from_pairs

__all__ = [
    "exact_clusters",
    "exact_dup_pairs",
    "band_explode",
    "candidate_pairs",
    "estimate_jaccard",
    "verify_pairs",
    "connected_components",
    "clusters_from_pairs",
]
