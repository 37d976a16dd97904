"""Interop with the reference engine's on-disk snapshot format.

The reference persists its entire database as ONE pretty-printed JSON file
(vectordb.cpp:158-178 `save`, 180-218 `load`):

    {
      "dim": 64,
      "nextId": 2001,
      "vectors": [ {"id": 1, "metadata": {...}, "vec": [0.1, ...]}, ... ]
    }

These functions are the migration path: a user of the reference points
`read_snapshot` at their existing database file and gets the canonical
(id, vec, metadata) DataFrame this engine uses everywhere; `write_snapshot`
produces a file the reference's `load()` accepts, so results can round-trip
back.

Scale note: the format itself is single-file by the reference's design, so
it is an *interop* source/sink, not the at-scale storage layer (that is
Parquet, VectorTable). Reading still goes through Spark's distributed JSON
reader (`multiLine`), so parse + explode happen executor-side; only the
sink streams through the driver (`toLocalIterator`, O(1) driver memory)
because the output must be one well-formed JSON document.

Error semantics preserved from the reference load() (vectordb.cpp:191-214):
missing file → caller's problem (we raise FileNotFoundError rather than the
reference's silent fresh-start, which only makes sense for a mutable
engine); unparseable JSON → error; missing dim/nextId/id/vec fields →
error ("corrupted (missing fields)").
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("dim", T.IntegerType()),
        T.StructField("nextId", T.LongType()),
        T.StructField(
            "vectors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("vec", T.ArrayType(T.DoubleType())),
                        # metadata is an arbitrary JSON object; keep it as the
                        # raw document (engine-canonical: opaque JSON string)
                        T.StructField("metadata", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def snapshot_meta(path: str) -> Tuple[int, int]:
    """(dim, nextId) from a snapshot file. NOTE: driver-side ``json.load``
    — materializes the whole document, fine for reference-sized files.
    ``read_snapshot``/``read_snapshot_with_meta`` get the header from the
    distributed parse instead and never pay this cost."""
    with open(path) as f:
        doc = json.load(f)
    if "dim" not in doc or "nextId" not in doc:
        raise ValueError("Database file is corrupted (missing fields): dim/nextId")
    return int(doc["dim"]), int(doc["nextId"])


def read_snapshot_with_meta(
    spark: SparkSession, path: str
) -> Tuple[DataFrame, int, int]:
    """(rows, dim, nextId) from a reference snapshot — ONE executor-side
    ``multiLine`` parse supplies both the header scalars and the exploded
    rows; nothing is materialized on the driver.

    Error contract (reference load(), vectordb.cpp:191-214): missing file →
    FileNotFoundError; absent dim/nextId → ValueError; any vector entry
    missing its id or vec field → ValueError (the reference throws; silently
    dropping a migrating user's rows is not acceptable). The row validation
    is one aggregate over the parsed entries, executor-side.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    raw = (
        spark.read.option("multiLine", "true")
        .schema(_SNAPSHOT_SCHEMA)
        .json(path)
    )
    header = raw.select(
        "dim", "nextId", F.col("vectors").isNull().alias("no_vectors")
    ).first()
    if header is None or header["dim"] is None or header["nextId"] is None:
        raise ValueError("Database file is corrupted (missing fields): dim/nextId")
    if header["no_vectors"]:
        raise ValueError("Database file is corrupted (missing fields): vectors")
    # inner explode: an empty vectors array yields zero rows (explode_outer
    # would fabricate one all-null row and trip the corruption check below)
    df = raw.select(F.explode("vectors").alias("v")).select(
        F.col("v.id").alias("id"),
        F.col("v.vec").cast(T.ArrayType(T.FloatType())).alias("vec"),
        F.col("v.metadata").alias("metadata"),
    )
    bad = df.filter(F.col("id").isNull() | F.col("vec").isNull()).limit(1).count()
    if bad:
        raise ValueError("Database file is corrupted (missing fields): id/vec")
    return df, int(header["dim"]), int(header["nextId"])


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Reference JSON snapshot → canonical (id, vec, metadata) DataFrame.

    vec arrives as array<float> (engine-canonical), metadata as the raw
    JSON text of the reference's metadata object. Same error contract as
    ``read_snapshot_with_meta``."""
    df, _, _ = read_snapshot_with_meta(spark, path)
    return df


def write_snapshot(
    df: DataFrame, path: str, dim: int, next_id: int | None = None
) -> None:
    """Canonical DataFrame → a JSON file the reference's load() accepts.

    Streams rows through the driver one Arrow batch at a time
    (`toLocalIterator`) so driver memory stays O(batch), then writes
    atomically (tmp + rename) matching the engine's whole-file overwrite
    consistency model. next_id defaults to max(id)+1 computed in the same
    pass (reference invariant: nextId > every live id, vectordb.cpp:43).
    """
    rows: Iterator = df.select("id", "vec", "metadata").toLocalIterator()
    tmp = path + "_tmp"
    max_id = 0
    with open(tmp, "w") as f:
        f.write('{\n  "dim": %d,\n  "vectors": [' % dim)
        first = True
        for r in rows:
            if r.id is not None and r.id > max_id:
                max_id = r.id
            meta_obj = None
            if r.metadata is not None:
                try:
                    meta_obj = json.loads(r.metadata)
                except (TypeError, ValueError):
                    meta_obj = r.metadata  # plain string metadata stays a string
            entry = json.dumps(
                {
                    "id": r.id,
                    "metadata": meta_obj,
                    "vec": [float(x) for x in (r.vec or [])],
                }
            )
            f.write(("" if first else ",") + "\n    " + entry)
            first = False
        nid = next_id if next_id is not None else max_id + 1
        f.write('\n  ],\n  "nextId": %d\n}\n' % nid)
    os.replace(tmp, path)


def write_snapshot_sharded(
    df: DataFrame,
    path: str,
    dim: int,
    next_id: int | None = None,
    shards: int = 8,
) -> list[str]:
    """Canonical DataFrame → ``shards`` reference-loadable part files
    ``{path}.part-0000`` … — the scale-out variant of ``write_snapshot``.

    Each part is a COMPLETE, well-formed snapshot document
    ``{dim, nextId, vectors:[subset]}`` that the reference's load()
    accepts on its own (the subsets partition the id space; every part
    carries the same global nextId, preserving the nextId > every live
    id invariant, vectordb.cpp:43). Serialization and file IO happen
    EXECUTOR-side, one task per shard — no row ever streams through the
    driver, removing the single-file writer's driver-serial path. The
    target directory must be a filesystem all executors share (local FS
    in local mode; NFS/object-store mount on a cluster).

    Returns the part-file paths. Writes are atomic per part (tmp +
    rename); partial failures leave no part file half-written.
    """
    if shards < 1:
        raise ValueError("shards must be >= 1")
    if next_id is None:
        row = df.agg(F.max("id").alias("m")).first()
        next_id = int(row["m"] or 0) + 1
    # resolve relative paths DRIVER-side before the closure captures them —
    # executors run with their own cwd, so a raw relative path would land
    # parts in executor scratch dirs on a real cluster
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)

    # NOTE: this closure runs on executors; it must be fully self-contained
    # (stdlib imports inside, no references to package-level names) so it
    # works even when the package isn't importable on executor workers
    def write_part(idx: int, rows) -> Iterator[tuple]:
        import json as _json
        import os as _os

        from pyspark import TaskContext as _TaskContext

        part = f"{path}.part-{idx:04d}"
        # tmp name must match NEITHER the documented '.part-*' read glob
        # nor a directory listing (dot-prefixed; the datasource skips
        # hidden files) — a crashed export must not poison later reads.
        # The attempt id keeps concurrent attempts of the same task
        # (speculation / zombie retry on a shared FS) off each other's
        # file; the final os.replace is atomic, last completed attempt
        # wins with identical content.
        _d, _base = _os.path.split(part)
        _attempt = _TaskContext.get().taskAttemptId()
        tmp = _os.path.join(_d, f".{_base}.attempt-{_attempt}.tmp")
        n = 0
        with open(tmp, "w") as f:
            f.write('{\n  "dim": %d,\n  "vectors": [' % dim)
            for r in rows:
                meta_obj = None
                if r.metadata is not None:
                    try:
                        meta_obj = _json.loads(r.metadata)
                    except (TypeError, ValueError):
                        meta_obj = r.metadata  # plain string stays a string
                entry = _json.dumps(
                    {
                        "id": r.id,
                        "metadata": meta_obj,
                        "vec": [float(x) for x in (r.vec or [])],
                    }
                )
                f.write(("" if n == 0 else ",") + "\n    " + entry)
                n += 1
            f.write('\n  ],\n  "nextId": %d\n}\n' % next_id)
        _os.replace(tmp, part)
        yield (idx, n)

    # hash-repartition on id so shard sizes stay balanced regardless of the
    # table's current layout; the per-partition write is genuinely
    # imperative IO, the one place an RDD mapPartitions is the right tool
    written = (
        df.select("id", "vec", "metadata")
        .repartition(shards, "id")
        .rdd.mapPartitionsWithIndex(write_part)
        .collect()
    )
    assert len(written) == shards
    return [f"{path}.part-{i:04d}" for i, _ in sorted(written)]
