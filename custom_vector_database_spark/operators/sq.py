"""SQ8 scalar quantization — the third member of the compressed-search
family (with PQ and IVF-PQ, operators/pq.py): 4× less scan I/O than float32
with near-perfect recall after rerank.

Scheme: one global symmetric scale s = max(|x|) over every element of the
corpus; code(x) = round(x / s * 127) as int8. Squared-L2 between code
vectors is then a pure *integer* (≤ 254²·dim, far inside int64), so —
unlike PQ's float ADC — candidate ranking is deterministic and the entire
search (quantize → int distance → top-k·r → exact rerank) is expressible in
ANSI SQL and hash-checkable against DuckDB.

Scale shape:
- the scale is ONE double (an `agg(max(array_max(...)))` with map-side
  combine) broadcast into the scan — no collect of vectors;
- the candidate scan ranks by the int code distance and ends in
  TakeOrderedAndProject (per-partition heaps, no global sort); the heap
  rows carry the float vector, so rerank needs NO second scan — only the
  k·r survivors' vectors ever leave their executors. (With a separately
  stored codes table — the real 100 TB layout, where the scan reads dim
  bytes/row instead of 4·dim — you would instead join the k·r ids back to
  the float table via broadcast hash join, as PqIndex.search does.)

Reference parity: the reference searches float32 only (hnsw.h:45-52);
quantized search is part of the promised billion-scale surface
(SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from custom_vector_database_spark.functions.vector import l2_squared


def _encode(vec: Column, scale: Column) -> Column:
    """array<float> → array<int> codes in [-127, 127] (stored int8-sized;
    kept int-typed for the arithmetic)."""
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.least(F.round(x.cast("double") / scale * 127).cast("int"), F.lit(127)),
            F.lit(-127),
        ),
    )


def _int_l2_sq(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 between two code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_scale(df: DataFrame, vec_col: str) -> DataFrame:
    """One-row DataFrame with the global symmetric scale max(|x|)."""
    return df.agg(
        F.max(F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))))
        .alias("scale")
    )


def sq8_search(
    df: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 3,
) -> DataFrame:
    """Top-k by exact L2 over SQ8-preselected candidates.

    Candidate set = top k·rerank by integer code distance (ties broken by
    id, so the set is deterministic); output = exact (id, dist_sq) over
    that set, nearest-first.
    """
    qlit = F.array(*[F.lit(float(x)) for x in query])
    # encode the query ONCE against the one-row scale table — putting
    # _encode(qlit, scale) in the per-row projection would redo dim×
    # (divide, round, clamp) on the identical literal for every data row
    side = F.broadcast(
        sq8_scale(df, vec_col).select(
            "scale", _encode(qlit, F.col("scale")).alias("__qcode")
        )
    )
    coded = df.crossJoin(side).select(
        F.col(id_col),
        F.col(vec_col),
        _int_l2_sq(
            _encode(F.col(vec_col), F.col("scale")), F.col("__qcode")
        ).alias("code_dist"),
    )
    cands = coded.orderBy("code_dist", id_col).limit(k * rerank)
    return (
        cands.select(
            F.col(id_col), F.round(l2_squared(F.col(vec_col), qlit), 6).alias("dist_sq")
        )
        .orderBy("dist_sq", id_col)
        .limit(k)
    )
