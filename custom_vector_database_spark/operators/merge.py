"""MERGE INTO (SCD1 upsert) — the lakehouse merge verb on plain Parquet,
no table format required.

Semantics (match ANSI MERGE with WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT): every non-key column resolves as ``coalesce(source.col,
target.col)`` so matched rows take the source's values, unmatched target
rows persist, and source-only rows insert. Null-valued source columns
*keep* the target value under this encoding — the documented limitation of
coalesce-style merges (the same trade-off Hive's merge-on-read and most
SCD1 ETL jobs make). Keys are assumed unique per side (primary-key
snapshots); duplicates would multiply rows, as in ANSI MERGE.

Two physical shapes:

- default: ONE full-outer sort-merge join — one shuffle of each side on
  the key. (Spark cannot execute a full-outer join as a broadcast hash
  join, so there is no broadcast variant of this plan.)
- ``broadcast_source=True`` (small source, the overwhelmingly common
  upsert): the wide target rows NEVER shuffle. Matched/unmatched target
  rows classify in one map-side pass (left-outer broadcast hash join);
  source-only inserts come from a left-anti join of the tiny source
  against only the target's key column — the single key column is the
  only thing from the target that ever crosses the wire.

At 100 TB, pair the broadcast path with partition-overwrite so the rewrite
touches only partitions the source hits.

Reference parity: the reference's update() is a point upsert-by-id
(vectordb.cpp:61-72); this is its set-oriented generalization
(VectorTable.update_many uses the same join shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _coalesced(t_alias: str, s_alias: str, columns: list[str], key: str):
    return [
        F.coalesce(F.col(f"{s_alias}.{key}"), F.col(f"{t_alias}.{key}")).alias(key)
    ] + [
        F.coalesce(F.col(f"{s_alias}.{c}"), F.col(f"{t_alias}.{c}")).alias(c)
        for c in columns
        if c != key
    ]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    broadcast_source: bool = False,
) -> DataFrame:
    """Return the merged table (source wins on matched keys)."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    cols = target.columns
    if not broadcast_source:
        t, s = target.alias("t"), source.alias("s")
        merged = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
        return merged.select(*_coalesced("t", "s", cols, key))
    # Small-source path: target-side rows handled map-side (left outer
    # against the broadcast source), inserts via anti join of the tiny
    # source against the target's key column only.
    t, s = target.alias("t"), F.broadcast(source).alias("s")
    upserted = t.join(
        s, F.col(f"t.{key}") == F.col(f"s.{key}"), "left_outer"
    ).select(*_coalesced("t", "s", cols, key))
    inserts = source.alias("s").join(
        target.select(F.col(key).alias("__tk")),
        F.col(f"s.{key}") == F.col("__tk"),
        "left_anti",
    ).select(*cols)
    return upserted.unionByName(inserts)
