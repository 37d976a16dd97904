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
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class VectorDbJsonDataSource(DataSource):
    """format name: ``vectordbjson``; option/path: the snapshot file.

    Writing (``df.write.format("vectordbjson").mode("overwrite")
    .option("dim", d).save(path)``) produces the SHARDED layout — one
    reference-loadable ``{path}.part-NNNN`` document per input partition
    (two-phase commit: parts land under hidden tmp names, the commit
    stamps the global nextId footer and renames; an aborted job leaves
    nothing visible). Read it back with ``.load(f"{path}.part-*")``.
    ``option("nextId", n)`` overrides the computed max(id)+1."""

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

    def writer(self, schema, overwrite: bool) -> "VectorDbJsonWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("vectordbjson requires a path (.save(path))")
        if not overwrite:
            raise ValueError(
                "vectordbjson supports only mode('overwrite') — the "
                "reference format is a whole-snapshot write "
                "(vectordb.cpp:158-178)"
            )
        names = [f.name for f in schema.fields]
        if not {"id", "vec"} <= set(names):
            raise ValueError(
                f"vectordbjson write needs id and vec columns, got {names}"
            )
        dim = self.options.get("dim")
        if dim is None:
            raise ValueError("vectordbjson write requires option('dim', <int>)")
        next_id = self.options.get("nextid", self.options.get("nextId"))
        return VectorDbJsonWriter(
            os.path.abspath(path),
            int(dim),
            None if next_id is None else int(next_id),
        )


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


class _PartMessage(WriterCommitMessage):
    def __init__(self, tmp_path: str, idx: int, n: int, max_id: int):
        self.tmp_path = tmp_path
        self.idx = idx
        self.n = n
        self.max_id = max_id


class VectorDbJsonWriter(DataSourceWriter):
    """One reference-format part document per partition, two-phase:
    ``write`` leaves ``.{base}.part-NNNN.attempt-K.tmp`` files WITHOUT the
    nextId footer and reports each partition's local max id plus its own
    tmp path; ``commit`` (driver) appends the global footer to exactly the
    WINNING attempts' files (the tmp path rides the commit message, so a
    speculative or zombie retry can never corrupt the committed part),
    renames them into place FIRST — ``os.replace`` overwrites same-index
    parts atomically — and only then removes stale parts a previous wider
    write left behind, so a crash mid-commit never destroys the previous
    snapshot without a complete replacement in place. ``abort`` removes
    the tmps.

    Filesystem contract: the two-phase commit renames executor-written
    temp files DRIVER-side with ``os.replace``, which requires the target
    directory to be one filesystem shared by driver and executors (local
    FS in local mode, NFS/fuse mount on a cluster) — appropriate for an
    inherently single-node interop format. On HDFS/S3 the promotion would
    need to route through the Hadoop FileSystem API instead; writes there
    fail loudly in ``commit`` (the driver cannot see the tmp files), never
    silently."""

    def __init__(self, path: str, dim: int, next_id: int | None):
        self.path = path
        self.dim = dim
        self.next_id = next_id

    def write(self, iterator) -> _PartMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        idx = ctx.partitionId()
        d, base = os.path.split(self.path)
        # attempt id in the tmp name: two concurrent attempts of the same
        # task (speculation / zombie retry on a shared FS) must never
        # append to one file
        tmp = os.path.join(
            d, f".{base}.part-{idx:04d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        n, max_id = 0, 0
        with open(tmp, "w") as f:
            f.write('{\n  "dim": %d,\n  "vectors": [' % self.dim)
            for r in iterator:
                if r["id"] is None or r["vec"] is None:
                    raise ValueError("vectordbjson write: null id/vec")
                if r["id"] > max_id:
                    max_id = r["id"]
                meta = r["metadata"] if "metadata" in r.__fields__ else None
                meta_obj = None
                if meta is not None:
                    try:
                        meta_obj = json.loads(meta)
                    except (TypeError, ValueError):
                        meta_obj = meta
                entry = json.dumps(
                    {
                        "id": r["id"],
                        "metadata": meta_obj,
                        "vec": [float(x) for x in r["vec"]],
                    }
                )
                f.write(("" if n == 0 else ",") + "\n    " + entry)
                n += 1
            f.write("\n  ]")  # footer (nextId) deferred to commit
        return _PartMessage(tmp, idx, n, max_id)

    def commit(self, messages) -> None:
        import glob as _glob

        global_next = (
            self.next_id
            if self.next_id is not None
            else max((m.max_id for m in messages), default=0) + 1
        )
        # promote new parts FIRST (atomic same-index overwrite), then drop
        # only the stale leftovers — at every instant the directory holds a
        # complete snapshot (old, new, or old-higher-parts + new)
        committed = set()
        for m in sorted(messages, key=lambda m: m.idx):
            with open(m.tmp_path, "a") as f:
                f.write(',\n  "nextId": %d\n}\n' % global_next)
            final = f"{self.path}.part-{m.idx:04d}"
            os.replace(m.tmp_path, final)
            committed.add(final)
        for stale in _glob.glob(f"{self.path}.part-*"):
            if stale not in committed:
                os.remove(stale)  # parts of a previous, wider snapshot
        d, base = os.path.split(self.path)
        for loser in _glob.glob(os.path.join(d, f".{base}.part-*.tmp")):
            try:
                os.remove(loser)  # tmps of losing/zombie attempts
            except OSError:
                pass

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


def register(spark) -> None:
    """Idempotently register the format with this session."""
    try:
        spark.dataSource.register(VectorDbJsonDataSource)
    except Exception:
        pass  # already registered in this session
