"""Vector distance / similarity as native Catalyst column expressions.

The reference's only metric is squared L2 (a scalar C loop,
/root/reference/lib/hnsw/hnsw.h:45-52, wired as the default at hnsw.h:41);
the CLI prints sqrt of it (/root/reference/src/main.cpp:115-116). Here every
metric is a pure column expression — `zip_with` + `aggregate` — so it runs
inside whole-stage codegen on the JVM, vectorizes over Parquet scans, and
needs no Python worker. This is the scale-critical choice: at 100 TB a
Python UDF distance would dominate the runtime.

Determinism contract (drives the DuckDB oracle match): elements are cast
float→double (exact), combined left-to-right with a 0.0 initial accumulator.
DuckDB's `list_reduce(list_transform(list_zip(a, b), ...))` folds in the
same order, so distances are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "l2_squared",
    "l2_distance",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "parse_vector",
]


def _d(c: Column) -> Column:
    return c.cast("double")


def l2_squared(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two array<float|double> columns.

    Mirrors the reference's L2Sqr (hnsw.h:45-52): sum over (a_i - b_i)^2.
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y)))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """True L2 (the reference CLI's display metric, main.cpp:115-116)."""
    return F.sqrt(l2_squared(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _d(x) * _d(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: _d(x) * _d(x))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def parse_vector(col: Column | str, dim: int | None = None) -> Column:
    """O11 parseVector (reference main.cpp:8-23): CSV-of-floats string →
    array<float>. With ``dim`` set, a wrong-length vector raises at execution
    time — the reference's hard-error contract (main.cpp:19-21)."""
    col = F.col(col) if isinstance(col, str) else col
    vec = F.split(col, ",").cast("array<float>")
    # cast maps unparseable tokens to NULL elements; the reference's stof
    # throws (main.cpp:14-16) — surface the same hard error here instead of
    # letting a NULL-holed vector silently poison every downstream distance
    vec = F.when(
        F.exists(vec, lambda x: x.isNull()),
        F.raise_error("invalid vector: unparseable float element").cast(
            "array<float>"
        ),
    ).otherwise(vec)
    if dim is not None:
        vec = F.when(F.size(vec) == dim, vec).otherwise(
            F.raise_error(f"vector dimension mismatch: expected {dim}").cast(
                "array<float>"
            )
        )
    return vec


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| * |b|); 0-norm inputs yield NULL (division by zero)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
