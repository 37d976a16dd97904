"""Query modules — importing this package registers every query/oracle pair
into custom_vector_database_spark.queries_registry (the driver contract hub).

Determinism contract shared by all modules (drives the driver's value-hash
compare): money-like double columns are cast to DECIMAL(18,2) *before* any
arithmetic — the cast is value-exact because the synthetic data is 2-decimal
valued — so sums/products are associative and bit-identical across Spark's
partial aggregation order and DuckDB's. Final outputs cast back to DOUBLE
(exact for these magnitudes). Per-row folds (distances) round(6) instead.
Every query ends in a total ORDER BY with a unique tie-break key.
"""

from custom_vector_database_spark.queries import (  # noqa: F401
    analytics_queries,
    breadth_queries,
    curation_queries,
    events_queries,
    extra_queries,
    pipeline_queries,
    relational_queries,
    text_queries,
    tpch_queries,
    udf_queries,
    vector_queries,
)
