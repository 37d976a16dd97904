"""Tombstone deletes for saved, partitioned index layouts (round 6).

The reference prices delete as a first-class verb (vectordb.cpp:74-80;
test.cpp:108-127 asserts the stale-then-fresh contract), but its only
index path is the full rebuild. The incremental layouts here (IvfIndex,
IvfPqIndex) were append-only through round 5: upsert made daily ingestion
affordable while a GDPR-style removal still paid the full rebuild the
upsert verb exists to avoid. Tombstones close that gap:

- ``delete(ids)`` appends the ids to a small parquet sidecar next to the
  layout (``<index>/tombstones``). Pre-existing part files are untouched.
- Every search path anti-joins the sidecar BEFORE distance work; the
  sidecar is small by design (deletes accrued between compactions), so
  Catalyst/AQE broadcasts it. With no tombstones the plan is unchanged.
- ``compact()`` physically drops tombstoned rows (the filter rides the
  compaction shuffle for free) and clears the sidecar.
- An ``upsert()`` that re-adds a deleted id rewrites the sidecar without
  it, so the new row is searchable immediately.

This mixin carries the shared verbs; the host class provides
``self._path``, ``self.id_col``, and ``_raw_layout()`` (the full stored
DataFrame including tombstoned rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.layout import (
    append_tombstones,
    clear_tombstones,
    overwrite_tombstones,
    read_tombstones,
)

__all__ = ["TombstoneDeleteMixin"]


class TombstoneDeleteMixin:
    _tombstones: DataFrame | None = None
    _path: str | None
    id_col: str

    def _raw_layout(self) -> DataFrame:
        raise NotImplementedError

    def _live(self, df: DataFrame) -> DataFrame:
        """``df`` minus tombstoned ids — identity when none exist."""
        if self._tombstones is None:
            return df
        return df.join(self._tombstones, self.id_col, "left_anti")

    def _load_tombstones(self, spark) -> None:
        self._tombstones = read_tombstones(spark, self._path, self.id_col)

    def _tombstone_count(self) -> int:
        return self._tombstones.count() if self._tombstones is not None else 0

    def delete(self, ids) -> int:
        """Delete rows from the SAVED index without a rebuild (module
        docstring). ``ids`` is a list or a single-column DataFrame (the
        batch shape — a removal feed at scale is a table, not a literal
        list). Returns the number of LIVE rows tombstoned by this call;
        already-deleted or absent ids count zero."""
        if self._path is None:
            raise ValueError(
                "delete requires a saved index (call save() or load() first)"
            )
        raw = self._raw_layout()
        spark = raw.sparkSession
        id_type = raw.schema[self.id_col].dataType
        if isinstance(ids, DataFrame):
            src = ids.columns[0]
            ids_df = ids.select(
                F.col(src).cast(id_type).alias(self.id_col)
            ).distinct()
        else:
            ids_df = spark.createDataFrame(
                [(i,) for i in ids], f"`{self.id_col}` long"
            ).select(F.col(self.id_col).cast(id_type)).distinct()
        # count live hits BEFORE appending (the return contract); one
        # bounded semi-join — the id side is the small one
        n_live = self._live(raw).join(ids_df, self.id_col, "left_semi").count()
        append_tombstones(ids_df, self._path)
        self._load_tombstones(spark)
        return int(n_live)

    def _clear_readded_tombstones(self, readded_ids: DataFrame) -> None:
        """An upsert that re-adds a previously deleted id must make the
        new row searchable — otherwise the tombstone would hide it
        forever. The sidecar is rewritten minus the re-added ids (bounded
        work: the sidecar is small by design). No-op when nothing
        overlaps."""
        if self._tombstones is None:
            return
        spark = self._raw_layout().sparkSession
        overlap = self._tombstones.join(
            readded_ids, self.id_col, "left_semi"
        ).count()
        if not overlap:
            return
        remaining = self._tombstones.join(
            readded_ids, self.id_col, "left_anti"
        ).localCheckpoint(eager=True)  # materialize BEFORE overwriting the
        # sidecar the plan reads from
        if remaining.count():
            overwrite_tombstones(remaining, self._path)
            self._load_tombstones(spark)
        else:
            clear_tombstones(self._path)
            self._tombstones = None

    def _compact_transform_and_clear(self):
        """(transform, on_success) pair for layout.compact_partitioned:
        the transform anti-joins tombstoned rows out of the rewrite, and
        on_success clears the sidecar once the swap landed."""
        tomb = self._tombstones

        def transform(df: DataFrame) -> DataFrame:
            return df.join(tomb, self.id_col, "left_anti")

        def on_success() -> None:
            clear_tombstones(self._path)
            self._tombstones = None

        if tomb is None:
            return None, lambda: None
        return transform, on_success
