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
partition), not from splitting one. The path may be a single file, a
glob pattern, or a directory (every regular file inside): pointing it at
a ``write_snapshot_sharded`` output (``snap.json.part-*``) gives an
N-way parallel parse. Parsing runs executor-side; the driver never
touches vector payloads. Writing stays with
reference_snapshot.write_snapshot / write_snapshot_sharded (the
format's whole-file atomic overwrite doesn't fit partition-parallel
DataSourceWriter semantics).

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
        # one partition per snapshot FILE — the unit the format allows.
        # Globs and directories expand (driver-side listing, cheap) so a
        # sharded export parses with one task per part file.
        import glob as _glob
        import os as _os

        if _os.path.isdir(self.path):
            # skip hidden/marker files ('.': in-progress shard tmps;
            # '_': Spark-convention markers like _SUCCESS)
            files = sorted(
                _os.path.join(self.path, f)
                for f in _os.listdir(self.path)
                if _os.path.isfile(_os.path.join(self.path, f))
                and not f.startswith((".", "_"))
            )
        elif any(c in self.path for c in "*?["):
            files = sorted(_glob.glob(self.path))
        else:
            files = [self.path]
        if not files:
            raise FileNotFoundError(self.path)
        return [InputPartition(f) for f in files]

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
