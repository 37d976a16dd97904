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
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _has_scheme(path: str) -> bool:
    """True for URI-style paths (file:/, hdfs://, s3a://, ...) that must
    route through a filesystem API instead of POSIX os.* calls."""
    return bool(re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:/", path))


def _strip_file_scheme(path: str) -> str:
    """file:-URI → plain local path (file:///a, file:/a → /a)."""
    from urllib.parse import urlparse

    return urlparse(path).path


def _uri_split(path: str) -> tuple[str, str]:
    """(dir, base) for a URI path — URIs always separate with '/'."""
    d, _, base = path.rpartition("/")
    return d, base


def _resolve_uri(uri: str):
    """(pyarrow FileSystem, filesystem-native path) for a URI. file:
    URIs go straight to LocalFileSystem (pyarrow's from_uri is strict
    about the file://host form); s3a:// — the Hadoop spelling — maps to
    pyarrow's s3://. Everything else (hdfs://, s3://, gs://) resolves
    through pyarrow.fs directly."""
    import pyarrow.fs as pafs

    if uri.startswith("file:"):
        return pafs.LocalFileSystem(), _strip_file_scheme(uri)
    if uri.startswith("s3a://"):
        uri = "s3://" + uri[len("s3a://"):]
    return pafs.FileSystem.from_uri(uri)


class _UriFs:
    """Filesystem-API promotion for scheme-qualified targets (HDFS, S3,
    file:, ...) through pyarrow.fs — usable from the Python DataSource
    commit/abort context, which runs in a Python worker WITHOUT a py4j
    gateway (the JVM Hadoop FileSystem is unreachable there; pyarrow's
    C++ filesystems are not)."""

    def __init__(self, any_uri: str):
        self._fs, _ = _resolve_uri(any_uri)

    def _p(self, uri: str) -> str:
        return _resolve_uri(uri)[1]

    def append_text(self, uri: str, text: str) -> bool:
        """True if the filesystem supports append and it succeeded
        (local/HDFS do; object stores do not)."""
        try:
            with self._fs.open_append_stream(self._p(uri)) as out:
                out.write(text.encode("utf-8"))
            return True
        except (NotImplementedError, OSError, IOError):
            return False

    def read_bytes(self, uri: str) -> bytes:
        with self._fs.open_input_stream(self._p(uri)) as f:
            return f.read()

    def write_bytes(self, uri: str, data: bytes) -> None:
        with self._fs.open_output_stream(self._p(uri)) as out:
            out.write(data)

    def promote(self, tmp: str, final: str) -> None:
        """move tmp → final, overwriting. HDFS rename semantics REFUSE an
        existing destination (unlike POSIX rename and the object-store
        copy+delete path), so an existing final is deleted first — the
        complete replacement keeps existing under the tmp name through
        that window, preserving the two-phase-commit recovery contract
        (a reader that races the gap finds the tmp and rolls forward);
        the local-no-scheme fast path keeps the stricter os.replace."""
        try:
            self._fs.move(self._p(tmp), self._p(final))
        except OSError:
            # destination likely exists on rename-refusing filesystems
            self.delete_quiet(final)
            self._fs.move(self._p(tmp), self._p(final))

    def glob(self, pattern: str) -> list[str]:
        """URI-glob over the pattern's parent directory (pyarrow has no
        native glob; one directory listing + fnmatch on base names)."""
        import fnmatch

        import pyarrow.fs as pafs

        d, base_pat = _uri_split(pattern)
        infos = self._fs.get_file_info(
            pafs.FileSelector(self._p(d), allow_not_found=True)
        )
        return [
            f"{d}/{i.base_name}"
            for i in infos
            if fnmatch.fnmatch(i.base_name, base_pat)
        ]

    def delete_quiet(self, uri: str) -> None:
        try:
            self._fs.delete_file(self._p(uri))
        except Exception:
            pass


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
            path if _has_scheme(path) else os.path.abspath(path),
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

        # file:-URIs normalize to plain local paths; other schemes would
        # need a Hadoop listing and are not supported by this reader
        if self.path.startswith("file:"):
            self.path = _strip_file_scheme(self.path)
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

    Filesystem contract: plain (scheme-less) paths promote with
    ``os.replace`` — one filesystem shared by driver and executors
    (local FS in local mode, NFS/fuse mount on a cluster), the strictest
    atomic-overwrite semantics. URI paths (``file:/``, ``hdfs://``,
    ``s3://``/``s3a://``, ``gs://``) route the ENTIRE two-phase commit
    through pyarrow.fs instead — the filesystem layer reachable from the
    Python DataSource write AND commit contexts (commit runs in a Python
    worker without a py4j gateway, so the JVM Hadoop FileSystem is not an
    option there): executors write tmps via ``open_output_stream``, the
    commit appends the footer via ``open_append_stream`` where the store
    supports it (local, HDFS) with a read+rewrite fallback (object
    stores), then promotes via ``move`` — a true rename on real
    filesystems, copy+delete on object stores — and glob-cleans stale
    parts and loser tmps. The ``file:``-URI spelling exercises this
    exact branch on the local filesystem and is what the tests drive."""

    def __init__(self, path: str, dim: int, next_id: int | None):
        self.path = path
        self.dim = dim
        self.next_id = next_id

    def _open_tmp(self, tmp: str):
        """Executor-side tmp writer: POSIX open for plain and file:
        paths, pyarrow.fs for other URI schemes (executors have no JVM
        gateway, so the Hadoop API is driver-only; pyarrow covers
        hdfs/s3/gs where its bindings are present)."""
        if not _has_scheme(tmp):
            return open(tmp, "w")
        if tmp.startswith("file:"):
            return open(_strip_file_scheme(tmp), "w")
        import io

        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(tmp)
        return io.TextIOWrapper(fs.open_output_stream(p), encoding="utf-8")

    def write(self, iterator) -> _PartMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        idx = ctx.partitionId()
        if _has_scheme(self.path):
            d, base = _uri_split(self.path)
            join = lambda a, b: f"{a}/{b}"  # noqa: E731 — URIs use '/'
        else:
            d, base = os.path.split(self.path)
            join = os.path.join
        # attempt id in the tmp name: two concurrent attempts of the same
        # task (speculation / zombie retry on a shared FS) must never
        # append to one file
        tmp = join(
            d, f".{base}.part-{idx:04d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        n, max_id = 0, 0
        with self._open_tmp(tmp) as f:
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
        global_next = (
            self.next_id
            if self.next_id is not None
            else max((m.max_id for m in messages), default=0) + 1
        )
        footer = ',\n  "nextId": %d\n}\n' % global_next
        # promote new parts FIRST (same-index overwrite), then drop only
        # the stale leftovers — at every instant the directory holds a
        # complete snapshot (old, new, or old-higher-parts + new)
        if _has_scheme(self.path):
            self._commit_hadoop(messages, footer)
            return
        import glob as _glob

        committed = set()
        for m in sorted(messages, key=lambda m: m.idx):
            with open(m.tmp_path, "a") as f:
                f.write(footer)
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

    def _commit_hadoop(self, messages, footer: str) -> None:
        """URI-path promotion through pyarrow.fs (class docstring:
        append-or-rewrite the footer, move-with-overwrite, glob cleanup)
        — the same two-phase sequence on any filesystem pyarrow can
        reach (local, HDFS via libhdfs, S3/s3a, GCS)."""
        hfs = _UriFs(self.path)
        committed = set()
        for m in sorted(messages, key=lambda m: m.idx):
            if not hfs.append_text(m.tmp_path, footer):
                # append unsupported (object stores): read + rewrite the
                # part with the footer under the same tmp name
                data = hfs.read_bytes(m.tmp_path)
                hfs.write_bytes(m.tmp_path, data + footer.encode("utf-8"))
            final = f"{self.path}.part-{m.idx:04d}"
            hfs.promote(m.tmp_path, final)
            committed.add(final)
        # compare by basename — stable across URI spellings of the
        # same directory (file:/a vs file:///a)
        committed_names = {c.rpartition("/")[2] for c in committed}
        for stale in hfs.glob(f"{self.path}.part-*"):
            if stale.rpartition("/")[2] not in committed_names:
                hfs.delete_quiet(stale)
        d, base = _uri_split(self.path)
        for loser in hfs.glob(f"{d}/.{base}.part-*.tmp"):
            hfs.delete_quiet(loser)

    def abort(self, messages) -> None:
        if _has_scheme(self.path):
            hfs = _UriFs(self.path)
            for m in messages:
                hfs.delete_quiet(m.tmp_path)
            return
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
