from custom_vector_database_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    l2_squared,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "l2_squared",
]
