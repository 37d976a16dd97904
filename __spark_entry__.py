"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (exact k-NN over embeddings at sf0.001).
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key (same column names,
floats rounded identically on both sides; see FIXTURES.md §C).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from custom_vector_database_spark import queries_registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries_registry.QUERIES["knn_exact"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each oracle-checkable query (ANN/rows-only omitted)."""
    return dict(queries_registry.ORACLES)
