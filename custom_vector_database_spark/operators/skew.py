"""Skew-resistant two-phase (salted) aggregation.

At 100 TB a groupBy on a key with heavy hitters funnels whole key groups
through single reducers. Salting splits each key into ``salt`` sub-keys for
the partial aggregation, then combines partials in a second, tiny
aggregation — the classic two-phase shape, packaged as a reusable operator.
(AQE's skew handling covers joins; aggregation skew still needs this.)

Only decomposable aggregates are offered (sum/count/min/max) — they
recombine exactly, so the salted result is bit-identical to the direct
groupBy and stays DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts recombine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (kind, column)
    with kind ∈ {sum, count, min, max}.

    Phase 1 groups by (keys + random salt) — heavy keys spread over
    ``salt`` reducers; phase 2 groups by keys alone over ``salt`` rows per
    key. The salt column is random but the result is exact because every
    offered aggregate is associative/commutative."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if kind == "count" else _COMBINE[kind](col)).alias(
                f"_p_{name}"
            )
            for name, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[kind](F.col(f"_p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_src: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: spread each fact key's rows over `salt`
    sub-partitions and replicate the dim side `salt`× so every sub-partition
    still finds its match.

    ``salt_src`` must be a (near-)unique fact column — the salt is
    ``xxhash64(salt_src) % salt``, which spreads rows WITHIN a heavy key
    (salting by the key itself would put the whole hot key back in one
    reducer). Deterministic, so reruns partition identically. The join
    result is exactly the plain join's (dim rows replicate, fact rows
    don't), so it stays oracle-checkable.

    Use when one side has heavy-hitter keys and AQE's skew split isn't
    available (e.g. the join feeds a co-partitioned downstream op). Cost:
    the dim shuffle grows salt×; the fact side — the big one — still
    shuffles once.

    Only fact-preserving joins are legal: an outer side on the REPLICATED
    dim would emit each unmatched dim row `salt` times, silently inflating
    the result — so 'right'/'full' are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports inner/left joins only: outer-preserving "
            "the replicated dim side would duplicate unmatched dim rows "
            f"salt× (got how={how!r})"
        )
    sid = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt)).cast("int")
    f = fact.withColumn("__fsalt", sid)
    d = dim.withColumn(
        "__dsalt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (F.col("__fsalt") == F.col("__dsalt")),
        how,
    )
    return joined.drop("__fsalt", "__dsalt")
