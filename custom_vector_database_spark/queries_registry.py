"""The query/oracle matrix consumed by __spark_entry__.py.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, plus — when SQL-expressible — a
DuckDB oracle string with IDENTICAL output column names and float rounding.
Non-SQL-expressible ops (LSH ANN, MinHash dedup, SimHash) register the
query only; the driver then records a rows-only check and tests/ carry the
stronger recall/semantic assertions.

The actual queries live in custom_vector_database_spark/queries/* grouped by
domain (vector, relational, events, text); importing that package at the
bottom of this module populates QUERIES/ORACLES. Float determinism contract:
see queries/__init__.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_spread(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load + round-robin repartition to the session's parallelism.

    The small fixture tables arrive as ONE parquet file → one input split →
    CPU-heavy per-row expressions (shingling, hashing, distance folds) run
    single-task. A ~MB-scale shuffle buys full-core parallelism. On a real
    100 TB table the scan has thousands of natural splits and this becomes
    unnecessary (and should be dropped to avoid a pointless shuffle)."""
    return load(spark, sf_dir, table).repartition(
        spark.sparkContext.defaultParallelism
    )


# Populate the registry (import side effect; must come after register/load).
import custom_vector_database_spark.queries  # noqa: E402,F401
