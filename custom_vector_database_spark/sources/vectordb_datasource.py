"""The reference's vectordb.json snapshot format as a first-class Spark
DataSource (Spark 4 Python DataSource API): after registration,

    spark.read.format("vectordbjson").load(path)

yields the canonical (id, vec, metadata) frame — the same rows as
sources.reference_snapshot.read_snapshot, but through the connector
surface, so the format composes with everything that takes a reader
(SQL `CREATE TABLE ... USING`, multi-path loads, downstream libraries).

The format is a single whole-file JSON document by the reference's design
(vectordb.cpp:158-218), so the reader exposes ONE partition per file —
parallelism comes from loading many snapshot files (each its own
partition), not from splitting one. Parsing runs executor-side; the
driver never touches vector payloads. Writing stays with
reference_snapshot.write_snapshot (the format's single-file atomic
overwrite doesn't fit partition-parallel DataSourceWriter semantics).

Error contract matches read_snapshot (reference load(),
vectordb.cpp:191-214): missing dim/nextId/vectors or a vector entry
without id/vec raises instead of silently dropping rows.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class VectorDbJsonDataSource(DataSource):
    """format name: ``vectordbjson``; option/path: the snapshot file."""

    @classmethod
    def name(cls) -> str:
        return "vectordbjson"

    def schema(self) -> str:
        return "id bigint, vec array<float>, metadata string"

    def reader(self, schema) -> "VectorDbJsonReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("vectordbjson requires a path (.load(path))")
        return VectorDbJsonReader(path)


class VectorDbJsonReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        # one partition per snapshot FILE — the unit the format allows
        return [InputPartition(self.path)]

    def read(self, partition):
        with open(partition.value) as f:
            doc = json.load(f)
        if doc.get("dim") is None or doc.get("nextId") is None:
            raise ValueError(
                "Database file is corrupted (missing fields): dim/nextId"
            )
        vectors = doc.get("vectors")
        if vectors is None:
            raise ValueError(
                "Database file is corrupted (missing fields): vectors"
            )
        for v in vectors:
            if v.get("id") is None or v.get("vec") is None:
                raise ValueError(
                    "Database file is corrupted (missing fields): id/vec"
                )
            meta = v.get("metadata")
            yield (
                int(v["id"]),
                [float(x) for x in v["vec"]],
                None if meta is None else json.dumps(meta, separators=(",", ":")),
            )


def register(spark) -> None:
    """Idempotently register the format with this session."""
    try:
        spark.dataSource.register(VectorDbJsonDataSource)
    except Exception:
        pass  # already registered in this session
