"""MERGE INTO (SCD1 upsert) as a single full-outer join — the lakehouse
merge verb on plain Parquet, no table format required.

Semantics (match ANSI MERGE with WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT): one pass, one shuffle on the key (or none if the source is small
enough to broadcast — pass ``broadcast_source=True``); every non-key column
resolves as ``coalesce(source.col, target.col)`` so matched rows take the
source's values, unmatched target rows persist, and source-only rows
insert. Null-valued source columns *keep* the target value under this
encoding — the documented limitation of coalesce-style merges (same
trade-off Hive's merge-on-read and most SCD1 ETL jobs make).

At 100 TB the target side stays where it lives: with a broadcast source the
merge is map-side only, and the rewrite can be restricted to the partitions
the source touches (partition-overwrite), never a full-table shuffle.

Reference parity: the reference's update() is a point upsert-by-id
(vectordb.cpp:61-72); this is its set-oriented generalization
(VectorTable.update_many uses the same join shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    broadcast_source: bool = False,
) -> DataFrame:
    """Return the merged table (target ⟕⟖ source on `key`, source wins)."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    src = F.broadcast(source) if broadcast_source else source
    t, s = target.alias("t"), src.alias("s")
    merged = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    cols = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key)
    ] + [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
        for c in target.columns
        if c != key
    ]
    return merged.select(*cols)
