from aeuc_vector_db_spark.functions.vector import (
    as_double,
    dot_col,
    l2_norm_col,
    l2_normalize_col,
    sq_norm_col,
)
from aeuc_vector_db_spark.functions.similarity import (
    METRICS,
    PHI,
    PHI_POWERS,
    cosine_col,
    euclidean_distance_col,
    euclidean_similarity_col,
    phi_weighted_col,
    similarity_col,
)

__all__ = [
    "as_double",
    "dot_col",
    "l2_norm_col",
    "l2_normalize_col",
    "sq_norm_col",
    "METRICS",
    "PHI",
    "PHI_POWERS",
    "cosine_col",
    "euclidean_distance_col",
    "euclidean_similarity_col",
    "phi_weighted_col",
    "similarity_col",
]
