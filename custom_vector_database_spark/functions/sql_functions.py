"""The vector-distance surface as SQL scalar functions (Spark 4
``CREATE FUNCTION … RETURN <expr>``): a pure-SQL user gets the exact
same engine as the DataFrame API.

These are NOT UDFs in the slow sense — a SQL scalar function is inlined
into the plan at analysis time, so `l2_sq(e.embedding, q.qv)` compiles to
the identical aggregate/zip_with expression tree as
functions.vector.l2_squared (whole-stage codegen, no Python worker, no
serialization boundary). The plan test asserts this: the SQL kNN query
produces the same TakeOrderedAndProject shape with zero BatchEvalPython
nodes.

Mirrors the Catalyst builders in functions/vector.py — same float→double
casts, same 0.0-init left fold, so results (and the DuckDB oracle match)
are bit-identical across the two surfaces.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DEFS = {
    "l2_sq": """
        CREATE OR REPLACE TEMPORARY FUNCTION l2_sq(
            a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN aggregate(
            zip_with(a, b, (x, y) ->
                (double(x) - double(y)) * (double(x) - double(y))),
            0D, (acc, v) -> acc + v)
    """,
    "dot_p": """
        CREATE OR REPLACE TEMPORARY FUNCTION dot_p(
            a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN aggregate(
            zip_with(a, b, (x, y) -> double(x) * double(y)),
            0D, (acc, v) -> acc + v)
    """,
    "l2_norm": """
        CREATE OR REPLACE TEMPORARY FUNCTION l2_norm(
            a ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN sqrt(aggregate(
            transform(a, x -> double(x) * double(x)),
            0D, (acc, v) -> acc + v))
    """,
    "cosine_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
            a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN CASE WHEN l2_norm(a) * l2_norm(b) != 0
               THEN dot_p(a, b) / (l2_norm(a) * l2_norm(b)) END
    """,
}


def register_sql_functions(spark: SparkSession) -> None:
    """Install the vector functions into the session's SQL namespace.
    Idempotent (CREATE OR REPLACE). cosine_sim references l2_norm/dot_p,
    so insertion order matters."""
    for name in ("l2_sq", "dot_p", "l2_norm", "cosine_sim"):
        spark.sql(_DEFS[name])
