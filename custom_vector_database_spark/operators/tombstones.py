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
- An ``upsert()`` whose delta collides with a tombstoned id REFUSES with
  a compact-first error. Rationale: the old physical copy is still in
  the layout, so clearing the tombstone would resurrect BOTH copies (a
  duplicate id), and any order of (append, sidecar-rewrite) leaves a
  crash window that either un-deletes the old row or silently dooms the
  new one. The reference never reuses ids at all (monotonic nextId,
  vectordb.cpp:43); requiring a compact() before id reuse is the
  two-artifact-safe version of that contract.

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
            # build the literal list in the LAYOUT's id type — a
            # hardcoded long schema would crash on string/other id columns
            from pyspark.sql import types as T

            schema = T.StructType([T.StructField(self.id_col, id_type)])
            ids_df = spark.createDataFrame(
                [(i,) for i in ids], schema
            ).distinct()
        # count live hits BEFORE appending (the return contract); one
        # bounded semi-join — the id side is the small one
        n_live = self._live(raw).join(ids_df, self.id_col, "left_semi").count()
        append_tombstones(ids_df, self._path)
        self._load_tombstones(spark)
        return int(n_live)

    def _refuse_tombstoned_delta(self, delta_ids: DataFrame) -> None:
        """Called by upsert() BEFORE appending: a delta that reuses a
        tombstoned id must refuse (module docstring — clearing the
        tombstone would resurrect the old physical copy alongside the new
        one, and either commit order has a crash window that silently
        un-deletes or dooms a row). One bounded semi-join; no-op when no
        tombstones exist."""
        if self._tombstones is None:
            return
        n = self._tombstones.join(delta_ids, self.id_col, "left_semi").count()
        if n:
            raise ValueError(
                f"{n} delta id(s) are tombstoned on this index; run "
                "compact() first to physically clear deletions, then "
                "upsert (ids are otherwise append-only, matching the "
                "reference's monotonic id contract)"
            )

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
