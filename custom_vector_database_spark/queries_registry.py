"""The query/oracle matrix consumed by __spark_entry__.py.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, plus — when SQL-expressible — a
DuckDB oracle string with IDENTICAL output column names and float rounding.
Non-SQL-expressible ops (LSH ANN, MinHash dedup, streaming) register the
query only; the driver then records a rows-only check and tests/ carry the
stronger recall/semantic assertions.

Float determinism: distances fold float→double casts left-to-right with a
0.0 init on both engines (see functions/vector.py docstring), then round(6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import knn as knn_ops

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


# DuckDB fragment computing the same double fold as functions.vector.l2_squared
_DUCK_L2SQ = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
    "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v)"
)


# --------------------------------------------------------------------------
# O7 search — exact k-NN (SURVEY §2.1 O7; reference vectordb.cpp:120-156).
# Query vector = the embedding of vec_id 0 (taken from the table itself so
# the oracle can reference it too). Plan: pruned scan → codegen distance →
# TakeOrderedAndProject. No vector ever reaches the driver.
# --------------------------------------------------------------------------
@register(
    "knn_exact",
    f"""
    WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS vec_id,
           round({_DUCK_L2SQ.format(a="e.embedding", b="q.q")}, 6) AS dist_sq
    FROM embeddings e CROSS JOIN q
    ORDER BY dist_sq ASC, vec_id ASC
    LIMIT 10
    """,
)
def q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return knn_ops.knn(emb, qdf, k=10, id_col="vec_id", vec_col="embedding")
