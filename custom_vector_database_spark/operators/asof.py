"""As-of (point-in-time) join — a standard analytics operator the reference
lacks entirely (SURVEY §2.2 'Range / as-of / interval joins': ABSENT).

``asof_join(left, right, ...)`` attaches to every left row the latest right
row of the same key whose timestamp is <= the left timestamp (backward
direction, inclusive — the classic point-in-time lookup).

Physical shape (the 100 TB design): instead of a range-condition join (which
Spark would execute as a cross-ish join per key), both sides are UNIONED and
processed with ONE window pass:

    union(tag sides) → shuffle by key → sort by (ts, side) →
    last(right_payload, ignorenulls) over rows-unbounded-preceding → filter left

Cost: one shuffle of (key, ts, payload) and a per-partition sort — the same
cost as a sort-merge join, with no risk of a range-join blowup. Right rows
sort BEFORE left rows at equal timestamps so an exactly-simultaneous right
row is visible (inclusive semantics, matching DuckDB's ASOF JOIN
``l.ts >= r.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest right row with right.on <= left.on per key.

    Returns all left columns plus ``{on}{suffix}`` (the matched right
    timestamp, NULL when no right row precedes) and each requested right
    column as ``{col}{suffix}``.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or []

    payload = F.struct(
        F.col(on).alias("_r_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *by_cols,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_is_left"),
        payload.alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *by_cols,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_match._r_ts").alias(f"{on}{suffix}"))
    out_cols.extend(F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return matched.select(*out_cols)
