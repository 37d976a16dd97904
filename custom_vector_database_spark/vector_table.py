"""VectorTable — the reference's storage/engine class, Spark-first.

Re-expresses /root/reference/src/vectordb.{h,cpp} (class VectorDB) as a
Parquet-backed DataFrame API. Canonical schema (SURVEY §1.2):

    id        BIGINT        -- assigned 1,2,3,... on insert, never reused
    vec       ARRAY<FLOAT>  -- fixed dim per table
    metadata  STRING        -- opaque JSON document

Semantics preserved from the reference (SURVEY §2.3):
- init refuses to overwrite an existing table   (vectordb.cpp:24-26)
- ids monotone from 1, never reused after delete (vectordb.cpp:28,43,161)
- dimension mismatch on add/update/search → error (vectordb.cpp:39-41,65-67,124-126)
- get/update/delete of a missing id → found=False, not an error (vectordb.cpp:54-80)
- mutations are whole-dataset rewrites — exactly the reference's
  whole-file-overwrite consistency model (vectordb.cpp:158-178)
- the ANN index is a separately materialized artifact refreshed only by an
  explicit rebuild(), so searches between a mutation and a rebuild answer
  from the stale index (contractual: reference test.cpp:116-118)

Scale notes: `add` accepts a *batch* (DataFrame or list) — the scalable
unit of mutation; the contiguous-id contract is kept with row_number()
over a single-partition window on the NEW batch only (new batches are
small; the big table is never single-partitioned). `monotonically_increasing_id`
is deliberately not used — it is non-contiguous (SURVEY §1.2).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from custom_vector_database_spark.functions.vector import l2_squared
from custom_vector_database_spark.operators import knn as knn_ops

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("vec", T.ArrayType(T.FloatType(), False), False),
        T.StructField("metadata", T.StringType(), True),
    ]
)


class DimensionMismatchError(ValueError):
    """Reference behavior: hard error on wrong-dim add/update/search."""


@dataclass
class TableMeta:
    dim: int
    next_id: int

    @classmethod
    def read(cls, path: str) -> "TableMeta":
        with open(path) as f:
            d = json.load(f)
        return cls(dim=int(d["dim"]), next_id=int(d["nextId"]))

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"dim": self.dim, "nextId": self.next_id}, f)


class VectorTable:
    """A Parquet-backed vector table with explicit-rebuild ANN indexing."""

    # subclasses (multivector_table.MultiVectorTable) override BOTH to
    # reuse init/df/_local_batch — including df()'s crash-recovery
    # rollback — without copy-pasting the schema-dependent bodies
    SCHEMA = VECTOR_SCHEMA
    _BATCH_COLUMNS = ("id", "vec", "metadata")

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path  # directory; data under data/, meta sidecar, index under index/
        self._data_path = os.path.join(path, "data")
        self._meta_path = os.path.join(path, "meta.json")
        self._index_path = os.path.join(path, "index")

    # -- O1 init (vectordb.cpp:23-36) ------------------------------------
    def init(self, dim: int) -> "VectorTable":
        if os.path.exists(self._meta_path):
            raise FileExistsError(f"table already exists at {self.path}")
        if dim <= 0:
            raise ValueError("dim must be positive")
        os.makedirs(self.path, exist_ok=True)
        empty = self.spark.createDataFrame([], self.SCHEMA)
        empty.write.mode("overwrite").parquet(self._data_path)
        TableMeta(dim=dim, next_id=1).write(self._meta_path)
        return self

    # -- O9 load / O10 getDimensions --------------------------------------
    @property
    def meta(self) -> TableMeta:
        return TableMeta.read(self._meta_path)

    def dim(self) -> int:
        return self.meta.dim

    def df(self) -> DataFrame:
        """The table as a DataFrame (O9 load; schema enforced by Parquet).

        Recovers from a crash between _rewrite's two renames: if the data
        dir is missing but the pre-rename copy survives, roll back to it.
        """
        if not os.path.exists(self._data_path) and os.path.exists(
            self._data_path + "_old"
        ):
            os.rename(self._data_path + "_old", self._data_path)
        return self.spark.read.schema(self.SCHEMA).parquet(self._data_path)

    # -- reference snapshot interop (vectordb.cpp:158-218) -----------------
    def import_snapshot(self, snapshot_path: str) -> "VectorTable":
        """Create this table from a reference-format vectordb.json — the
        migration entry point for a user of the reference engine. Preserves
        ids, vectors, metadata, and the nextId counter (so subsequent add()
        continues the reference's id sequence)."""
        from custom_vector_database_spark.sources.reference_snapshot import (
            read_snapshot_with_meta,
        )

        if os.path.exists(self._meta_path):
            raise FileExistsError(f"table already exists at {self.path}")
        rows, dim, next_id = read_snapshot_with_meta(self.spark, snapshot_path)
        # one validation pass: per-row dim + the header's id-counter
        # invariant (nextId > every live id, vectordb.cpp:43 — otherwise
        # subsequent add() would reissue a live id)
        stats = rows.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("id").alias("n_ids"),
            F.max("id").alias("max_id"),
            F.sum((F.size("vec") != dim).cast("long")).alias("bad_dim"),
        ).first()
        if (stats["bad_dim"] or 0) > 0:
            raise DimensionMismatchError(f"snapshot vector dim != header dim {dim}")
        if stats["n"] != stats["n_ids"]:
            # the reference's std::map keys by id (last-wins); a DataFrame
            # has no document order to pick a winner from, so reject
            raise ValueError("corrupted snapshot: duplicate vector ids")
        if stats["n"] > 0 and next_id <= int(stats["max_id"]):
            raise ValueError(
                f"corrupted snapshot: nextId {next_id} <= max live id "
                f"{stats['max_id']} (ids would be reused)"
            )
        os.makedirs(self.path, exist_ok=True)
        rows.select("id", "vec", "metadata").write.mode("overwrite").parquet(
            self._data_path
        )
        TableMeta(dim=dim, next_id=next_id).write(self._meta_path)
        return self

    def export_snapshot(
        self, snapshot_path: str, shards: int | None = None
    ) -> list[str] | None:
        """Write the table as reference-format vectordb.json the
        reference's load() accepts — the migration exit (and a portable
        whole-table backup at small scale).

        Default (shards=None): ONE file, exactly the reference's layout,
        streamed through the driver. shards=N: N independently loadable
        part files written executor-side in parallel (the scale path —
        no driver-serial step); returns their paths."""
        from custom_vector_database_spark.sources.reference_snapshot import (
            write_snapshot,
            write_snapshot_sharded,
        )

        meta = self.meta
        if shards is None:
            write_snapshot(
                self.df(), snapshot_path, dim=meta.dim, next_id=meta.next_id
            )
            return None
        return write_snapshot_sharded(
            self.df(),
            snapshot_path,
            dim=meta.dim,
            next_id=meta.next_id,
            shards=shards,
        )

    def _local_batch(self, rows: list[tuple]) -> DataFrame:
        """Driver-side rows → DataFrame via pandas/Arrow: the batch lands
        as a JVM LocalRelation, so downstream writes never spin up Python
        workers (createDataFrame over plain tuples pickles through
        parallelize(), costing a ~3 s Python-worker round on the first
        mutation of a session — measured, not guessed)."""
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=list(self._BATCH_COLUMNS))
        return self.spark.createDataFrame(pdf, self.SCHEMA)

    # -- O2 add (vectordb.cpp:38-52) --------------------------------------
    def add(self, rows: DataFrame | list[tuple[list[float], str | None]]) -> list[int]:
        """Batch insert; returns the assigned ids (contiguous from nextId).

        ``rows``: DataFrame with (vec, metadata) columns, or a list of
        (vec, metadata_json) tuples.

        Scale shape: the batch is materialized ONCE (localCheckpoint) so the
        dimension check, id stamping, and rewrite all see identical rows even
        for non-deterministic sources (sample/limit inputs). Contiguous ids
        come from a per-partition local row_number plus broadcast cumulative
        partition offsets — every partition stamps in parallel; nothing ever
        funnels the batch through one partition. (`monotonically_increasing_id`
        alone is non-contiguous; a global `Window.orderBy` would single-thread
        the batch — both rejected, SURVEY §1.2 / VERDICT r1.)
        """
        meta = self.meta
        if isinstance(rows, list):
            # Driver-side fast path: the batch already lives on the driver,
            # so dimension-check and id-stamp in plain Python — zero extra
            # Spark jobs. (The reference's add is exactly this point/small
            # batch case, vectordb.cpp:38-52; big ingests arrive as
            # DataFrames and take the distributed path below.)
            for v, _ in rows:
                if len(v) != meta.dim:
                    raise DimensionMismatchError(f"expected dim {meta.dim}")
            n = len(rows)
            stamped = self._local_batch(
                [
                    (meta.next_id + i, [float(x) for x in v], m)
                    for i, (v, m) in enumerate(rows)
                ]
            )
            # id counter is bumped BEFORE the data rewrite: a crash in
            # between leaves an id gap (harmless) instead of reissuing ids
            # already durably written (duplicate-id corruption)
            TableMeta(dim=meta.dim, next_id=meta.next_id + n).write(self._meta_path)
            self._rewrite(
                self.df().unionByName(stamped),
                incoming_bytes=sum(
                    len(v) * 4 + (len(m) if m else 0) + 32 for v, m in rows
                ),
            )
            return list(range(meta.next_id, meta.next_id + n))
        batch = rows.select("vec", "metadata")
        batch = batch.localCheckpoint(eager=True)
        if batch.filter(F.size("vec") != meta.dim).limit(1).count():
            raise DimensionMismatchError(f"expected dim {meta.dim}")
        # Per-partition dense ranks, offset by the cumulative row count of
        # earlier partitions. The offsets table is one row per partition —
        # tiny — so its cumulative-sum window and broadcast are O(partitions).
        local = batch.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
            ),
        )
        counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
        off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))
        )
        off_rows = offsets.collect()  # one tiny row per partition
        n = int(sum(r["_cnt"] for r in off_rows))
        stamped = (
            local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
            .withColumn(
                "id", (F.lit(meta.next_id - 1) + F.col("_off") + F.col("_rn")).cast("long")
            )
            .select("id", "vec", "metadata")
        )
        # counter before data, as in the list path: crash ⇒ gap, never reuse
        TableMeta(dim=meta.dim, next_id=meta.next_id + n).write(self._meta_path)
        self._rewrite(
            self.df().unionByName(stamped),
            incoming_bytes=n * (meta.dim * 4 + 96),  # est. row width
        )
        return list(range(meta.next_id, meta.next_id + n))

    # -- O3 get (vectordb.cpp:54-59) --------------------------------------
    def get(self, id_: int):
        """Point lookup; returns (Row, found) like the reference's pair."""
        rows = self.df().filter(F.col("id") == F.lit(int(id_))).collect()
        return (rows[0], True) if rows else (None, False)

    def _exists(self, id_: int) -> bool:
        """Point-existence probe: the id equality predicate is pushed into
        the Parquet scan (row-group min/max pruning), so this touches only
        the row groups that can contain the id — not a second full pass
        (VERDICT r1: fold the existence check out of the full-scan path)."""
        return bool(
            self.df().filter(F.col("id") == F.lit(int(id_))).limit(1).count()
        )

    # -- O4 update (vectordb.cpp:61-72) ------------------------------------
    def update(self, id_: int, vec: list[float], metadata: str | None) -> bool:
        meta = self.meta
        if len(vec) != meta.dim:
            raise DimensionMismatchError(f"expected dim {meta.dim}")
        if not self._exists(id_):
            return False
        replacement = self._local_batch(
            [(int(id_), [float(x) for x in vec], metadata)]
        )
        kept = self.df().filter(F.col("id") != F.lit(int(id_)))
        self._rewrite(kept.unionByName(replacement))
        return True

    # -- O5 delete (vectordb.cpp:74-80) -------------------------------------
    def delete(self, id_: int) -> bool:
        if not self._exists(id_):
            return False
        self._rewrite(self.df().filter(F.col("id") != F.lit(int(id_))))
        return True

    # -- batch mutations: the scalable path (one rewrite amortizes any
    # number of point mutations — the reference pays a whole-file rewrite
    # PER mutation, main.cpp:66-70) ----------------------------------------
    def delete_many(self, ids: list[int]) -> int:
        """Delete a batch of ids in ONE rewrite; returns how many existed."""
        if not ids:
            return 0
        import pandas as pd

        wanted = self.spark.createDataFrame(
            pd.DataFrame({"id": sorted({int(i) for i in ids})}), "id LONG"
        )
        existed = self.df().join(F.broadcast(wanted), "id", "left_semi").count()
        self._rewrite(self.df().join(F.broadcast(wanted), "id", "left_anti"))
        return existed

    def update_many(self, rows: DataFrame) -> int:
        """Upsert-by-id for existing ids only (reference update semantics:
        absent ids are skipped, vectordb.cpp:61-72). ``rows`` has columns
        (id, vec, metadata). One anti-join + union + rewrite; returns the
        number of rows replaced."""
        meta = self.meta
        batch = rows.select(
            F.col("id").cast("long"),
            F.col("vec").cast("array<float>"),
            F.col("metadata").cast("string"),
        ).localCheckpoint(eager=True)
        stats = batch.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("id").alias("n_ids"),
            F.sum((F.size("vec") != meta.dim).cast("long")).alias("bad_dim"),
        ).first()
        if (stats["bad_dim"] or 0) > 0:
            raise DimensionMismatchError(f"expected dim {meta.dim}")
        if stats["n"] != stats["n_ids"]:
            # a duplicated id would survive the anti-join twice and break
            # the unique-id invariant; batches are unordered so there is no
            # deterministic "last write" to prefer — reject instead
            raise ValueError("update_many batch contains duplicate ids")
        # no broadcast hint on the table side — the batch is the small side;
        # Catalyst picks SMJ/broadcast appropriately at scale
        existing_ids = self.df().select("id")
        applicable = batch.join(existing_ids, "id", "left_semi")
        n = applicable.count()
        kept = self.df().join(F.broadcast(applicable.select("id")), "id", "left_anti")
        self._rewrite(kept.unionByName(applicable))
        return n

    def compact(self, n_partitions: int | None = None) -> None:
        """Storage maintenance: rewrite the table into ``n_partitions``
        balanced files (defaults to the session parallelism). Point
        mutations accrete small files; compaction restores healthy scan
        splits — the OPTIMIZE analogue for this whole-rewrite store."""
        n = n_partitions or self.spark.sparkContext.defaultParallelism
        self._rewrite(self.df().repartition(n), n_files=n)

    # -- O6 rebuild (vectordb.cpp:82-118) -----------------------------------
    def rebuild(
        self,
        num_hash_tables: int = 4,
        bucket_length: float | None = None,
        kind: str = "lsh",
        n_clusters: int = 16,
        metric: str = "l2_sq",
        model_id: str | None = None,
    ):
        """Explicit index build. ``kind="lsh"`` (default): fit a
        BucketedRandomProjectionLSH model (euclidean — matching the
        reference's L2 metric) and persist model + hashed table.
        ``kind="ivf"``: fit the cluster-partitioned IVF index instead —
        the partition-pruned probe layout (operators/ivf.py), the scale
        path for big tables, under any of its metrics: ``metric="l2_sq"``
        (default, the reference's), ``"cosine"`` (normalize-at-build), or
        ``"dot"`` (MIPS via the augmented-dimension reduction) — the
        engine's saved-index metric family exposed through the
        reference-parity facade (the reference declares the metric slot,
        hnsw.h:41, but never fills it). ``kind="ivfbq"``: the binary-code
        layout (operators/ivfbq.py, l2_sq only) — 32× smaller probed
        scans, reranked against the LIVE table; its CODE shortlist is
        stale until rebuild like every index here, but because codes
        hold no floats, a row deleted from the table vanishes from
        approximate results immediately instead of lingering like the
        reference's HNSW copies (test.cpp:116-118) — fresher than the
        stale contract, stated here because it differs from lsh/ivf.
        Either way search answers from
        this artifact until the next rebuild — the stale-index contract.

        Crash-safe: the new index builds into a sibling tmp directory
        (kind marker written LAST = completeness flag), then swaps in via
        renames — a crash at any point leaves either the old index or the
        new one, never neither and never a mixed-kind layout.
        """
        if kind not in ("lsh", "ivf", "ivfbq"):
            raise ValueError(
                f"unknown index kind {kind!r}; 'lsh', 'ivf', or 'ivfbq'"
            )
        if kind != "ivf" and metric != "l2_sq":
            raise ValueError(
                f"kind={kind!r} supports only the l2_sq metric; use "
                f"kind='ivf' for metric={metric!r}"
            )
        # the embedding-model pin rides the facade build too: a pinned
        # layout refuses declared-different vectors at every later
        # upsert/search/report entry point (layout.check_model_id) —
        # optional, so the reference-parity surface is unchanged
        if kind == "ivfbq":
            from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

            index = IvfBqIndex.fit(
                self.df(), id_col="id", vec_col="vec", n_clusters=n_clusters,
                model_id=model_id,
            )
        elif kind == "ivf":
            from custom_vector_database_spark.operators.ivf import IvfIndex

            index = IvfIndex.fit(
                self.df(), id_col="id", vec_col="vec",
                n_clusters=n_clusters, metric=metric, model_id=model_id,
            )
        else:
            from custom_vector_database_spark.operators.ann import LshIndex

            index = LshIndex.fit(
                self.df(),
                id_col="id",
                vec_col="vec",
                num_hash_tables=num_hash_tables,
                bucket_length=bucket_length,
                model_id=model_id,
            )
        return self._swap_index_in(index, kind)

    def _swap_index_in(self, index, kind: str):
        """Crash-safe index install shared by every rebuild flavor
        (including MultiVectorTable's): build into a sibling tmp dir and
        swap with renames (the layout.compact_partitioned recovery
        pattern). rmtree-then-save in place would leave NO index after a
        crash mid-save, and a crash between save and the kind marker
        would leave a layout read back as the wrong kind."""
        import json as _json

        from custom_vector_database_spark.operators.layout import (
            install_dir_swap,
        )

        def write_tmp(tmp: str) -> None:
            index.save(tmp)
            with open(os.path.join(tmp, "kind.json"), "w") as f:
                _json.dump({"kind": kind}, f)  # LAST: tmp is complete

        # ONE copy of the rename choreography (layout.install_dir_swap);
        # the heal override rolls a COMPLETE tmp forward via the kind
        # marker — without healing first, the helper's rmtree would
        # destroy the only surviving index copies (tmp/old) while the
        # index dir itself is missing
        install_dir_swap(
            self._index_path, write_tmp, heal=self._recover_index_swap
        )
        # the returned handle must point at the swapped-in layout, not the
        # renamed-away tmp path (IvfIndex.upsert/delete/compact resolve
        # via _path; LshIndex carries no path)
        if hasattr(index, "_path"):
            index._path = self._index_path
        return index

    def _recover_index_swap(self) -> None:
        """Heal a crash mid-rebuild swap: a complete tmp (kind marker
        present — it is written last) rolls FORWARD; otherwise the old
        index rolls BACK. Mirrors layout.recover_partitioned_swap."""
        if os.path.exists(self._index_path):
            return
        tmp = self._index_path + "_tmp"
        old = self._index_path + "_old"
        if os.path.exists(os.path.join(tmp, "kind.json")):
            os.rename(tmp, self._index_path)
        elif os.path.exists(old):
            os.rename(old, self._index_path)

    def _load_index(self):
        import json as _json

        self._recover_index_swap()
        if not os.path.exists(self._index_path):
            raise RuntimeError("no index built; run rebuild() first")
        kind = "lsh"  # pre-kind-marker tables are LSH
        marker = os.path.join(self._index_path, "kind.json")
        if os.path.exists(marker):
            with open(marker) as f:
                kind = _json.load(f)["kind"]
        if kind == "ivfbq":
            from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

            return IvfBqIndex.load(self.spark, self._index_path)
        if kind == "ivf":
            from custom_vector_database_spark.operators.ivf import IvfIndex

            return IvfIndex.load(self.spark, self._index_path)
        from custom_vector_database_spark.operators.ann import LshIndex

        return LshIndex.load(self.spark, self._index_path)

    # -- O7 search (vectordb.cpp:120-156) -------------------------------------
    def search(
        self,
        query: list[float],
        k: int,
        exact: bool = True,
        metric: str = "l2_sq",
    ) -> DataFrame:
        """k-NN as (id, dist_sq) nearest-first.

        exact=True: single-pass scan + TakeOrderedAndProject over the LIVE
        table (always fresh, oracle-checkable), under any operators.knn
        metric ("l2_sq", "cosine", "dot"). exact=False: approximate search
        over the last-rebuilt index — stale until rebuild() like the
        reference's HNSW (test.cpp:116-118 contract). An IVF index serves
        the metric it was BUILT with (rebuild(kind="ivf", metric=...));
        asking for a different one errors with the rebuild hint rather
        than silently answering in the wrong geometry. LSH is euclidean
        only (MLlib LSH family). Result column follows the metric:
        dist_sq / cos_dist / score (score is LARGEST-first).
        """
        meta = self.meta
        if len(query) != meta.dim:
            raise DimensionMismatchError(f"expected dim {meta.dim}")
        if exact:
            return knn_ops.knn(
                self.df(), [float(x) for x in query], k, metric=metric
            )
        idx = self._load_index()
        from custom_vector_database_spark.operators.ivf import IvfIndex
        from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

        if isinstance(idx, IvfBqIndex):
            if metric != "l2_sq":
                raise ValueError(
                    "the saved IVF-BQ index is l2_sq-only; run "
                    f"rebuild(kind='ivf', metric={metric!r}) for metric search"
                )
            # rerank against the LIVE table (stale-index contract applies
            # to the CODES; rerank distances are over current floats for
            # ids the stale shortlist surfaced - same staleness class as
            # the reference's HNSW holding copies, test.cpp:116-118)
            return idx.search(
                [float(x) for x in query], k, base_df=self.df(), nprobe=8
            )
        if isinstance(idx, IvfIndex):
            if metric != idx.metric:
                raise ValueError(
                    f"the saved IVF index was built for metric "
                    f"{idx.metric!r}, not {metric!r}; run "
                    f"rebuild(kind='ivf', metric={metric!r}) first"
                )
            return idx.search([float(x) for x in query], k, nprobe=8)
        if metric != "l2_sq":
            raise ValueError(
                "the saved LSH index supports only the l2_sq metric; run "
                f"rebuild(kind='ivf', metric={metric!r}) for metric search"
            )
        return idx.search([float(x) for x in query], k)

    def search_many(
        self,
        queries: DataFrame,
        k: int,
        query_id: str = "qid",
        query_vec: str = "qvec",
        metric: str = "l2_sq",
        max_query_rows: int | None = 100_000,
        exact: bool = True,
        nprobe: int = 8,
    ) -> DataFrame:
        """Batch search: the k nearest rows for every query row — the
        set-oriented generalization of the reference's one-vector search
        loop (main.cpp:95-118 calls search per CLI command; here one job
        answers the whole query table).

        exact=True (default): LIVE rows, broadcast(queries) ⨯ table scan →
        per-qid top-k window; only (qid, id, dist) triples shuffle
        (operators/knn.knn_join). exact=False: the last-rebuilt IVF index
        answers via its partition-pruned batch path (IvfIndex.search_many
        — per-query nprobe shortlist, statically pruned scan), in the
        metric the index was built with; stale until rebuild(), matching
        single-vector search(exact=False). An LSH index has no batch path
        — rebuild(kind="ivf") first.

        The query side must broadcast — ``max_query_rows`` guards that.
        Every query vector is dimension-checked (one cheap count over the
        small query side) — the same contract as single-vector search().
        """
        if not exact:
            idx = self._load_index()
            from custom_vector_database_spark.operators.ivf import IvfIndex
            from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

            if isinstance(idx, IvfBqIndex):
                if metric != "l2_sq":
                    raise ValueError(
                        "the saved IVF-BQ index is l2_sq-only; run "
                        f"rebuild(kind='ivf', metric={metric!r}) for "
                        "metric search"
                    )
                return idx.search_many(
                    queries, k, base_df=self.df(), nprobe=nprobe,
                    query_id=query_id, query_vec=query_vec,
                    max_query_rows=max_query_rows,
                )
            if not isinstance(idx, IvfIndex):
                raise ValueError(
                    "batch approximate search needs the IVF or IVF-BQ "
                    "layout; run rebuild(kind='ivf') first (LSH has no "
                    "batch path)"
                )
            if metric != idx.metric:
                raise ValueError(
                    f"the saved IVF index was built for metric "
                    f"{idx.metric!r}, not {metric!r}; run "
                    f"rebuild(kind='ivf', metric={metric!r}) first"
                )
            # the index path runs its own fused dim+count guard — a
            # facade-side dim check here would re-scan the query lineage
            # a second time for the same error
            return idx.search_many(
                queries, k, nprobe=nprobe, query_id=query_id,
                query_vec=query_vec, max_query_rows=max_query_rows,
            )
        n_bad = queries.filter(F.size(F.col(query_vec)) != self.meta.dim).count()
        if n_bad:
            raise DimensionMismatchError(
                f"{n_bad} query vector(s) do not have dim {self.meta.dim}"
            )
        return knn_ops.knn_join(
            self.df(),
            queries,
            k,
            data_id="id",
            data_vec="vec",
            query_id=query_id,
            query_vec=query_vec,
            metric=metric,
            max_query_rows=max_query_rows,
        )

    def search_stale(self, query: list[float], k: int) -> DataFrame:
        """Exact-scan search against the ROWS CAPTURED AT LAST REBUILD —
        the reference's literal semantic (search answers from the index
        snapshot, not the live rows). On an IVF index this probes ALL
        clusters (exhaustive = exact over the snapshot, in the index's own
        metric and output column); the stored vectors are in index space
        (normalized / augmented), so the metric-aware search path is the
        correct reader. Returns (id, <metric dist>) best-first."""
        idx = self._load_index()
        from custom_vector_database_spark.operators.ivf import IvfIndex
        from custom_vector_database_spark.operators.ivfbq import IvfBqIndex

        if isinstance(idx, IvfBqIndex):
            # the BQ layout stores 1-bit sign codes only — no float
            # copies exist to answer "exact over the snapshot", and
            # reranking codes against LIVE rows would be neither stale
            # nor fresh. Refuse with the route instead of crashing in
            # hashed_df() (which a code-only layout does not define).
            raise ValueError(
                "search_stale is not available on an 'ivfbq' index: the "
                "BQ layout keeps no float vectors, so there is no "
                "snapshot to answer exactly from. Use search(exact=True) "
                "for live-exact, search(exact=False) for approximate "
                "(which reranks against live rows and therefore never "
                "serves stale vectors), or rebuild(kind='ivf') if the "
                "reference's stale-snapshot semantic is required."
            )
        if isinstance(idx, IvfIndex):
            return idx.search(
                [float(x) for x in query], k, nprobe=len(idx.centroids)
            )
        snapshot = idx.hashed_df().select("id", "vec")
        return knn_ops.knn(snapshot, [float(x) for x in query], k)

    # -- O8 save: every mutation already persists (whole-rewrite), like the
    # reference's save-per-command loop (main.cpp:66-70). ---------------------
    def _disk_bytes(self) -> int:
        total = 0
        for root, _dirs, files in os.walk(self._data_path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    _TARGET_FILE_BYTES = 64 * 1024 * 1024  # ~64 MiB output files

    def _rewrite(
        self,
        df: DataFrame,
        n_files: int | None = None,
        incoming_bytes: int = 0,
    ) -> None:
        # Size the output file count from current table size + the
        # incoming batch estimate (a bulk add into an empty table must NOT
        # coalesce the whole ingest to one task; a 20-row table must not
        # scatter into 32 near-empty part files per mutation). Bounded
        # above by the input partitioning — coalesce never shuffles. An
        # explicit ``n_files`` (compact()) overrides the heuristic.
        if n_files is None:
            total = self._disk_bytes() + incoming_bytes
            n_files = max(1, total // self._TARGET_FILE_BYTES + 1)
            if n_files < df.rdd.getNumPartitions():
                df = df.coalesce(int(n_files))
        tmp = self._data_path + "_tmp"
        if os.path.exists(tmp):  # leftover from a previous failed write
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        old = self._data_path + "_old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self._data_path, old)
        os.rename(tmp, self._data_path)
        shutil.rmtree(old)

    # -- O12 distance (exposed for parity with L2Sqr, hnsw.h:45-52) ----------
    @staticmethod
    def l2_sq(a, b):
        return l2_squared(a, b)
