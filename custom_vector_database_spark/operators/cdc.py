"""Change-data-capture diff + incremental aggregate maintenance — the two
verbs that let a 100 TB pipeline avoid full recomputes between runs.

``snapshot_diff``: given two keyed snapshots, emit (key, change_type ∈
INSERT/DELETE/UPDATE) plus the new row. One full-outer join on the key;
row equality is decided by comparing a canonical serialization hash, so
the shuffle carries (key, hash) — never the wide rows — until the final
projection. At scale both sides hash-partition on the key once; with
bucketed snapshots the join is shuffle-free.

``merge_agg_delta``: maintain a SUM/COUNT pre-aggregate given only a delta
batch: re-aggregate the delta, union with the stored aggregate, and
combine per group. Valid for any commutative-monoid aggregate (sum, count,
min, max — avg as sum+count); the point is the base table is NEVER
rescanned. This is materialized-view incremental maintenance in plain
DataFrame ops.

Reference parity: ABSENT in the reference (whole-file save/load only,
vectordb.cpp:158-218); promised by SURVEY.md §2.2's pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_signature(df: DataFrame, key: str) -> Column:
    """Deterministic per-row hash over every non-key column (sorted for
    column-order independence). NULLs are distinguished from empty strings
    by a length-prefixed serialization."""
    cols = []
    for c in sorted(df.columns):
        if c == key:
            continue
        s = F.col(c).cast("string")
        cols.append(F.concat(F.coalesce(F.length(s), F.lit(-1)), F.lit(":"), F.coalesce(s, F.lit(""))))
    return F.xxhash64(F.concat_ws("|", *cols))


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """(key, change_type, new-row columns) for every changed key.

    UPDATE rows carry the new values; DELETE rows carry nulls (the row no
    longer exists). Unchanged keys are dropped before anything wide
    shuffles.

    PRECONDITION: `key` is unique within each snapshot (primary-key
    tables). Duplicate keys would cross-product in the full-outer join and
    emit contradictory change rows — if the upstream can't guarantee this,
    run a groupBy(key).count() gate (dq_expectations-style) first.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot schemas differ")
    o = old.select(F.col(key), row_signature(old, key).alias("__h_old"))
    n = new.select(F.col(key), row_signature(new, key).alias("__h_new"))
    j = o.join(n, key, "full_outer").select(
        key,
        F.when(F.col("__h_old").isNull(), F.lit("INSERT"))
        .when(F.col("__h_new").isNull(), F.lit("DELETE"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("UPDATE"))
        .alias("change_type"),
    ).filter(F.col("change_type").isNotNull())
    # attach the new row's payload for INSERT/UPDATE (left join keeps
    # DELETE rows with null payload)
    return j.join(new, key, "left").select(
        key, "change_type", *[c for c in new.columns if c != key]
    )


_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def merge_agg_delta(
    stored: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Combine a stored aggregate with a delta's aggregate (same schema:
    keys + measure columns). `measures` maps column → monoid ('sum',
    'count', 'min', 'max'); counts combine by summing. Never touches the
    base table — cost is O(|stored agg| + |delta|), one keyed shuffle."""
    unknown = set(measures.values()) - set(_COMBINE)
    if unknown:
        raise ValueError(f"unsupported measure ops: {sorted(unknown)}")
    return (
        stored.select(*keys, *measures)
        .unionByName(delta_agg.select(*keys, *measures))
        .groupBy(*keys)
        .agg(*[_COMBINE[op](c).alias(c) for c, op in measures.items()])
    )
