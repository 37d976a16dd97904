"""The query/oracle matrix consumed by __spark_entry__.py.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle string with
IDENTICAL output column names and float rounding — as of round 4, EVERY
registered query carries an oracle. Approximate/hash-seeded operators
(LSH/PQ/IVF ANN, MinHash dedup, SimHash, the sketches) use the
guarantee-oracle pattern: the output is exact and SQL-reproducible, with
one boolean column certifying the approximate operator against it
(recall/precision/consistency bounds loose enough that regenerated data
cannot flip them); tests/ carry the tighter recall assertions.

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


def load_spread(
    spark: SparkSession, sf_dir: str, table: str, max_partitions: int | None = None
) -> DataFrame:
    """Load + round-robin repartition to the session's parallelism —
    but ONLY when the source lacks natural parallelism.

    The small fixture tables arrive as ONE parquet file → one input split →
    CPU-heavy per-row expressions (shingling, hashing, distance folds) run
    single-task. A ~MB-scale shuffle buys full-core parallelism. On a real
    100 TB table the scan already has thousands of natural splits, so the
    repartition is SKIPPED: ``inputFiles()`` is a cheap driver-side file
    listing (works on any Hadoop-visible filesystem), and a source with at
    least target-many files never pays the extra shuffle
    (plan-asserted in tests/test_plans.py).

    ``max_partitions`` caps the fan-out below the session parallelism for
    operators whose per-task fixed cost (Python worker + Arrow channel
    startup in mapInPandas) outweighs per-row work on fixture-sized
    inputs."""
    df = load(spark, sf_dir, table)
    target = spark.sparkContext.defaultParallelism
    if max_partitions is not None:
        target = min(target, max_partitions)
    try:
        n_files = len(df.inputFiles())
    except Exception:  # exotic sources without a listing: keep the spread
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


# Populate the registry (import side effect; must come after register/load).
import custom_vector_database_spark.queries  # noqa: E402,F401
