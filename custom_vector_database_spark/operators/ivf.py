"""IVF (inverted-file) approximate nearest neighbor — the second ANN scale
path next to LSH (builder brief: "an IVF or LSH-bucketed variant").

Design, Spark-first:
- fit      = coarse KMeans quantizer trained driver-side in numpy over a
             bounded sample (operators/fitting.py rationale: the sample
             bound makes the fit small math; MLlib's job-per-iteration
             was pure scheduler latency); every row is then assigned its
             nearest centroid by ONE distributed codegen'd projection;
             the clustered table is the materialized index.
- save     = Parquet **partitioned by cluster id** — so a search that
             probes `nprobe` of `n_clusters` clusters is a partition-pruned
             scan reading only nprobe/n_clusters of the data (the `explain`
             shows PartitionFilters, not a full scan).
- search   = centroid shortlist computed driver-side (centroids are tiny:
             n_clusters × dim floats), then exact k-NN over the probed
             clusters only.
- search_many = the batch generalization: a query TABLE is answered in ONE
             job — each query row computes its own nprobe shortlist with a
             codegen'd projection over the literal centroid table, the
             (qid, cluster) pairs broadcast-join the clustered layout
             (statically partition-pruned to the union of probed clusters),
             and a per-qid window takes the top k. Production retrieval is
             millions of queries, not one; the reference answers one query
             per process (main.cpp:95-118).
- delete   = tombstone sidecar (operators/tombstones.py): removals become
             searchable-invisible immediately without touching a part
             file; compact() physically drops them. Completes CRUD on the
             layout — the reference's delete verb (vectordb.cpp:74-80)
             otherwise forces the full rebuild between ingestion batches.
- upsert   = delta ingestion without a rebuild: ONLY the new rows are
             assigned clusters with the SAVED centroids (one projection
             over the delta) and appended to the cluster-partitioned
             layout. The coarse quantizer is deliberately NOT refit — that
             stays the explicit rebuild contract (reference
             vectordb.cpp:82-118: adds are invisible to search until
             rebuild; here adds become searchable immediately, and
             rebuild()/fit() remains the codebook-refresh verb when the
             data distribution drifts).

Metrics: squared L2 (the reference's only metric, hnsw.h:41), cosine, and
dot (maximum inner product).
Cosine is normalize-at-build: unit-normalize every vector in the ONE
encode projection (cosine distance ≡ L2²/2 on unit vectors), normalize the
query at search time, and report ``cos_dist`` = 1 − cosine similarity.
Zero-norm vectors are stored unnormalized (their cosine to anything is
undefined; they can never enter a top-k under the exact path either).
Dot is augment-at-build — the standard MIPS→NN reduction (Bachrach et al.
2014, Neyshabur & Srebro 2015, both public): with M = max ‖x‖ over the
build data, store x' = [x, √(M²−‖x‖²)] (all x' have norm M) and search
with q' = [q, 0]; then ‖x'−q'‖² = M² + ‖q‖² − 2⟨x,q⟩, so ascending
augmented L2 IS descending inner product. The augmentation is fused into
the same single encode projection; search reports ``score`` = ⟨x,q⟩
(recovered arithmetically from the augmented distance), largest first.
Upserted rows with ‖x‖ > the build-time M are clamped onto the M-sphere
(their MIPS rank degrades gracefully); a rebuild refreshes M.

Recall knob: ``nprobe`` (more probed clusters → higher recall, more I/O) —
the IVF analogue of HNSW's ef (reference hnsw.h:117) and LSH's
numHashTables. Accuracy contract: recall vs exact k-NN in tests, never
oracle hash-equality (SURVEY §4.3).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import knn as knn_ops
from custom_vector_database_spark.operators.fitting import (
    collect_sample_matrix,
    kmeans_fit_np,
    nearest_centroid_col,
    nprobe_clusters_col,
)

__all__ = ["IvfIndex"]

_METRICS = {"l2_sq", "cosine", "dot"}


def _norm2_sql(vec_sql: str) -> str:
    return (
        f"aggregate(transform({vec_sql}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), 0.0D, (s, v) -> s + v)"
    )


def _augment_expr(vec_sql: str, m2: float) -> F.Column:
    """MIPS augmentation [x, √(M²−‖x‖²)] as one codegen expression;
    greatest(…, 0) clamps rows whose norm exceeds the build-time M
    (possible only via upsert) onto the M-sphere instead of emitting
    NaN."""
    return F.expr(
        f"CAST(concat({vec_sql}, array(CAST(sqrt(greatest("
        f"{float(m2)!r}D - ({_norm2_sql(vec_sql)}), 0.0D)) AS FLOAT))) "
        f"AS ARRAY<FLOAT>)"
    )


def _unit_normalize_expr(vec_sql: str) -> F.Column:
    """array<float> unit normalization as one codegen expression; 0-norm
    vectors pass through unchanged (see module docstring).

    The squared norm is bound ONCE by riding it in as zip_with's second
    ARGUMENT (array_repeat evaluates the fold a single time) — Spark
    does not hoist loop-invariant subexpressions out of higher-order-
    function lambdas, so inlining the norm fold in the per-element
    lambda would re-evaluate it for every element: O(d²) per row
    instead of O(d).

    Deliberately NOT the one-element-transform let-binding
    (``transform(array(norm2), n2 -> ... transform(vec, x -> x/n2))``):
    an inner lambda that captures an OUTER lambda variable leaks a
    phantom canonical exprId into ``Expression.canonicalized.references``
    on Spark 4.1.2, and ExtractPythonUDFs filters candidate UDFs with a
    references-subset check over those canonicalized forms — any pandas
    UDF whose argument collapses onto such an expression is then
    silently never extracted and dies at runtime with INTERNAL_ERROR
    "Cannot evaluate expression" inside an InterpretedUnsafeProjection
    (root-caused round 14; regression: tests/test_udf_extraction.py).
    The zip_with form keeps every lambda variable at its own level."""
    return F.expr(
        f"zip_with({vec_sql}, "
        f"array_repeat({_norm2_sql(vec_sql)}, size({vec_sql})), "
        f"(x, n2) -> CASE WHEN n2 = 0.0D THEN x "
        f"ELSE CAST(CAST(x AS DOUBLE) / sqrt(n2) AS FLOAT) END)"
    )


def _normalize_query(query: list[float]) -> list[float]:
    norm = math.sqrt(math.fsum(float(x) * float(x) for x in query))
    if norm == 0.0:
        return [float(x) for x in query]
    return [float(x) / norm for x in query]


from custom_vector_database_spark.operators.calibrate import (
    AutoNprobeMixin,
)
from custom_vector_database_spark.operators.tombstones import (
    TombstoneDeleteMixin,
)


class IvfIndex(TombstoneDeleteMixin, AutoNprobeMixin):
    """KMeans-clustered vector table + centroid shortlist search.

    Incremental CRUD on the saved layout: ``upsert`` (delta append),
    ``delete`` (tombstone sidecar, operators/tombstones.py), ``compact``
    (heals fragmentation AND physically clears tombstones)."""

    def __init__(self, centroids: list[list[float]], clustered: DataFrame,
                 id_col: str, vec_col: str, metric: str = "l2_sq",
                 path: str | None = None, max_norm: float | None = None,
                 carry_cols: list[str] | None = None,
                 model_id: str | None = None):
        if metric not in _METRICS:
            raise ValueError(f"unknown metric {metric!r}; expected {_METRICS}")
        self.centroids = centroids
        self._clustered = clustered
        self.id_col = id_col
        self.vec_col = vec_col
        self.metric = metric
        self.max_norm = max_norm  # the MIPS M-sphere radius (dot only)
        self._path = path  # set when saved/loaded; required by upsert()
        self.carry_cols = list(carry_cols or [])  # filter attributes stored
        # IN the layout so filtered searches push down into the pruned scan
        self.model_id = model_id  # embedding-model pin (layout.check_model_id)
        self.calibration: dict | None = None  # nprobe pin (operators/calibrate)
        self._tombstones: DataFrame | None = None  # deleted-id sidecar view

    def _check_model(self, supplied: str | None, what: str) -> None:
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
        )

        check_model_id(self.model_id, supplied, what)

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        n_clusters: int | str = 16,
        seed: int = 42,
        max_iter: int = 10,
        fit_sample: int = 100_000,
        metric: str = "l2_sq",
        carry_cols: list[str] | None = None,
        model_id: str | None = None,
        target_rows_per_cluster: int = 512,
    ) -> "IvfIndex":
        """Build the index. The coarse quantizer trains on at most
        ``fit_sample`` rows (uniform sample — statistically plenty for
        k ≪ sample centroids) driver-side in numpy; only the single
        assign pass below is full-table, and it is one whole-stage-
        codegen'd projection (nearest_centroid_expr), not an MLlib model
        UDF. ``metric="cosine"`` normalizes vectors INSIDE that same
        projection (normalize-at-build), so cosine costs zero extra
        passes.

        ``n_clusters="auto"`` derives k from the corpus row count so
        per-cluster occupancy tracks ``target_rows_per_cluster`` as the
        corpus grows (fitting.auto_n_clusters — probe cost then stays
        CONSTANT under corpus scale instead of linear, the r11 sf100
        lesson); the count rides the stats pass this fit already runs,
        so auto sizing costs zero extra jobs. Rebuilding through fit
        re-derives k from the data the rebuild serves — the autopilot's
        resize action (operators/maintenance.py) is exactly such a
        rebuild."""
        if metric not in _METRICS:
            raise ValueError(f"unknown metric {metric!r}; expected {_METRICS}")
        carry_cols = list(carry_cols or [])
        bad = {id_col, vec_col, "cluster"} & set(carry_cols)
        if bad:
            raise ValueError(f"carry_cols collide with index columns: {bad}")
        carry = [F.col(c) for c in carry_cols]
        feats = df.select(F.col(id_col), F.col(vec_col), *carry)
        # ONE stats pass serves three needs: the row count the sampler
        # wants, the NULL/dim guard (a NULL or wrong-length vector would
        # get a NULL cluster from the zip_with fold and be filed under a
        # NULL partition no probe ever scans — the silent loss upsert's
        # _check_input_dims exists to catch, previously missing on the
        # build path), and — dot only — the MIPS M-sphere radius.
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(vec_col).isNull().cast("long")).alias("n_null"),
            F.min(F.size(F.col(vec_col))).alias("dmin"),
            F.max(F.size(F.col(vec_col))).alias("dmax"),
        ]
        if metric == "dot":
            aggs.append(
                F.max(F.expr(f"sqrt({_norm2_sql(f'`{vec_col}`')})")).alias("m")
            )
        stats = feats.agg(*aggs).first()
        n = int(stats["n"])
        if n == 0:
            raise ValueError("cannot fit on an empty table")
        if stats["n_null"] or stats["dmin"] != stats["dmax"]:
            raise ValueError(
                f"{stats['n_null']} NULL vector(s) and dims spanning "
                f"[{stats['dmin']}, {stats['dmax']}] in the build input — "
                "every build vector must be non-NULL with one shared dim"
            )
        from custom_vector_database_spark.operators.fitting import (
            resolve_n_clusters,
        )

        n_clusters = resolve_n_clusters(
            n_clusters, n, target_rows_per_cluster, fit_sample
        )
        max_norm = None
        if metric == "cosine":
            feats = feats.select(
                F.col(id_col),
                _unit_normalize_expr(f"`{vec_col}`").alias(vec_col),
                *carry,
            )
        elif metric == "dot":
            max_norm = float(stats["m"])
            feats = feats.select(
                F.col(id_col),
                _augment_expr(f"`{vec_col}`", max_norm * max_norm).alias(vec_col),
                *carry,
            )
        x = collect_sample_matrix(feats, vec_col, n, fit_sample, seed)
        centroids = kmeans_fit_np(x, n_clusters, seed, max_iter)
        clustered = (
            feats.withColumn(
                "cluster",
                nearest_centroid_col(
                    f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)", centroids
                ),
            )
            .localCheckpoint(eager=True)  # the materialized index
            # (eager measured FASTER than lazy here: materializing the
            # encode into cached blocks makes save()'s dynamic-partition
            # write a cheap cache scan — A/B'd at sf0.1, +2.2 s lazy)
        )
        return cls(centroids, clustered, id_col, vec_col, metric,
                   max_norm=max_norm, carry_cols=carry_cols,
                   model_id=model_id)

    # -- persistence: partitioned by cluster → partition-pruned probes -----
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        # a save is a full rewrite: tombstoned rows are physically dropped
        # (clustered_df is the live view), so the new layout needs no sidecar
        # big-k saves repartition BY CLUSTER first: without it every
        # write task emits one file per cluster it holds (up to
        # tasks x n_clusters files - an auto-sized k=4000 layout would
        # shatter into ~125k ~100KB files and every later probe pays
        # the listing/open tax compact() exists to heal). One hash
        # shuffle aligns clusters to tasks -> one file per cluster.
        # Small-k layouts (every fixture) keep the shuffle-free path
        # and their existing file layout.
        rows_w = self.clustered_df()
        if len(self.centroids) > 64:
            rows_w = rows_w.repartition(F.col("cluster"))
        rows_w.write.mode("overwrite").partitionBy(
            "cluster"
        ).parquet(os.path.join(path, "rows"))
        from custom_vector_database_spark.operators.layout import (
            clear_tombstones,
        )

        clear_tombstones(path)  # any stale sidecar at the target is obsolete
        if self._tombstones is not None:
            # re-point the handle at what was just written BEFORE dropping
            # the tombstone view — otherwise the old raw layout (which
            # still physically holds the deleted rows) would resurrect
            # them on this very handle. Only needed when tombstones were
            # dropped; a clean save keeps the (path-independent,
            # checkpointed) in-memory frame so callers may move/rename
            # the written directory afterwards (VectorTable.rebuild's
            # tmp-and-swap does exactly that).
            self._clustered = self._clustered.sparkSession.read.parquet(
                os.path.join(path, "rows")
            )
            self._tombstones = None
        meta = {
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "metric": self.metric,
            "max_norm": self.max_norm,
            "carry_cols": self.carry_cols,
            "model_id": self.model_id,
            "centroids": self.centroids,
        }
        if self.calibration is not None:
            # the quantizer on THIS handle is unchanged, so a pinned
            # recall calibration stays valid across a re-save; a fresh
            # fit() builds a new handle (calibration None) and must
            # re-earn the pin (operators/calibrate.py lifecycle note)
            meta["calibration"] = self.calibration
        from custom_vector_database_spark.operators.layout import (
            meta_write_lease,
        )

        # the meta install takes the artifact's sibling lock so a
        # concurrent calibrate_nprobe(persist=True) read-modify-replace
        # can never clobber this fresh meta with the old body + pin
        # (r11 ADVICE finding)
        with meta_write_lease(path, "save"):
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
        self._path = path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfIndex":
        from custom_vector_database_spark.operators.layout import (
            recover_partitioned_swap,
        )

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        # heal a crash mid-compact swap before touching the layout
        recover_partitioned_swap(os.path.join(path, "rows"))
        rows = spark.read.parquet(os.path.join(path, "rows"))
        idx = cls(
            meta["centroids"], rows, meta["id_col"], meta["vec_col"],
            meta.get("metric", "l2_sq"), path=path,
            max_norm=meta.get("max_norm"),
            carry_cols=meta.get("carry_cols"),
            model_id=meta.get("model_id"),  # absent = legacy, loads unpinned
        )
        idx.calibration = meta.get("calibration")  # nprobe pin, if earned
        idx._load_tombstones(spark)
        return idx

    def _raw_layout(self) -> DataFrame:
        return self._clustered

    def clustered_df(self) -> DataFrame:
        """The LIVE index view: the saved layout minus tombstoned rows."""
        return self._live(self._clustered)

    # -- incremental ingestion ---------------------------------------------
    def upsert(self, delta: DataFrame, model_id: str | None = None) -> int:
        """Append a delta batch to the SAVED layout, encoding ONLY the new
        rows: one projection assigns each delta row its cluster with the
        saved centroids (plus the cosine normalization when the index is
        cosine), and the result appends into the cluster-partitioned
        Parquet. At 100 TB this is what makes daily ingestion affordable —
        the add→full-rebuild path re-encodes everything for a 0.01% delta.

        The quantizer is NOT refit (module docstring: codebook refresh
        stays the explicit rebuild verb). Existing part files are never
        touched — Parquet append only adds files under the delta's cluster
        directories (asserted in tests/test_recall.py). Returns the number
        of rows appended; the in-memory clustered view is refreshed to
        include them."""
        if self._path is None:
            raise ValueError(
                "upsert requires a saved index (call save() or load() first)"
            )
        self._check_model(model_id, "this IVF layout")
        self._check_input_dims(delta, self.vec_col, "delta")
        carry = [F.col(c) for c in self.carry_cols]
        # cast to the layout's array<float> on EVERY branch — an
        # array<double> delta would otherwise append DOUBLE-typed parquet
        # files next to FLOAT ones and break every later scan of the index
        feats = delta.select(
            F.col(self.id_col),
            F.col(self.vec_col).cast("array<float>").alias(self.vec_col),
            *carry,
        )
        if self.metric != "l2_sq":
            feats = feats.select(
                F.col(self.id_col),
                self._metric_src_expr(self.vec_col).alias(self.vec_col),
                *carry,
            )
        encoded = feats.withColumn(
            "cluster",
            nearest_centroid_col(
                f"CAST(`{self.vec_col}` AS ARRAY<DOUBLE>)", self.centroids
            ),
        ).localCheckpoint(eager=False)  # one encode pass feeds count AND
        # write (lazy: the full-scan count right below materializes it)
        n = encoded.count()
        self._refuse_tombstoned_delta(encoded.select(self.id_col))
        rows_path = os.path.join(self._path, "rows")
        encoded.write.mode("append").partitionBy("cluster").parquet(rows_path)
        self._clustered = delta.sparkSession.read.parquet(rows_path)
        return int(n)

    def _expected_input_dim(self) -> int:
        """The dim callers must supply: the raw vector dim — one less than
        the stored dim on a dot index (the augmented coordinate is added
        inside upsert/search, never by the caller)."""
        d = len(self.centroids[0])
        return d - 1 if self.metric == "dot" else d

    def _staleness_feats(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Staleness-report input (operators/pq.quantization_error_report
        protocol) for the COARSE quantizer: the metric-transformed
        vector, whose distance to its nearest saved centroid is the
        distortion the cluster assignment commits to — the signal that
        prices the explicit rebuild as upserted deltas drift away from
        the centroids' training sample (probe recall degrades with
        it)."""
        from custom_vector_database_spark.operators.pq import (
            _refuse_report_vectors,
        )

        self._check_input_dims(df, vec_col, "report input")
        _refuse_report_vectors(df, vec_col, None)
        return df.select(
            self._metric_src_expr(vec_col).cast("array<double>").alias("_vec")
        )

    def _metric_src_expr(self, vec_col: str):
        """The metric-specific raw->stored vector transform (cosine
        normalize / dot sphere-augment with the saved M, over-M rows
        clamping / l2 identity) — ONE definition consumed by upsert's
        delta encode and the staleness report, so the report always
        measures exactly the assignment space encode commits to (the
        IvfPqIndex._metric_src_expr convention)."""
        if self.metric == "cosine":
            return _unit_normalize_expr(f"`{vec_col}`")
        if self.metric == "dot":
            m2 = float(self.max_norm) * float(self.max_norm)
            return _augment_expr(f"`{vec_col}`", m2)
        return F.col(vec_col)

    def _staleness_error_expr(self) -> F.Column:
        from custom_vector_database_spark.operators.pq import (
            _min_sq_dist_sql,
        )

        return F.expr(_min_sq_dist_sql("_vec", self.centroids))

    def _check_input_dims(self, df: DataFrame, vec_col: str, what: str) -> int:
        """Hard-error on wrong-length vectors BEFORE encoding: zip_with
        against the centroids pads mismatches with NULL, which would file
        the rows under a NULL cluster partition that no probe ever scans —
        silent data loss. ONE aggregate over the (small) input side that
        also returns the row count, so callers needing both (the batch
        guards) pay a single scan."""
        want = self._expected_input_dim()
        # NULL-safe: under ANSI mode size(NULL) is NULL, so `size != want`
        # is NULL (not true) for a NULL vector and a plain filter would
        # wave exactly the rows this guard exists to catch straight
        # through; isNull() | NULL evaluates true for those rows
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.col(vec_col).isNull()
                    | (F.size(F.col(vec_col)) != want)
                ).cast("long")
            ).alias("n_bad"),
        ).first()
        if stats["n_bad"]:
            raise ValueError(
                f"{stats['n_bad']} {what} vector(s) are NULL or do not have "
                f"dim {want} (index metric {self.metric!r})"
            )
        return int(stats["n"])

    def compact(self, files_per_cluster: int = 1) -> dict:
        """Rewrite the saved layout so each cluster partition holds
        ``files_per_cluster`` part files — the maintenance verb that pairs
        with upsert/stream ingest: every delta append adds small files,
        and at 100 TB a cluster fragmented into thousands of them turns
        the probe's partition-pruned scan into a file-listing and
        open-per-file tax. Delegates to layout.compact_partitioned (one
        hash shuffle + tmp-write + two-rename swap with crash recovery);
        search results are identical before and after (the registered
        ivf_compact query certifies this against the exact oracle).
        Returns {files_before, files_after, n_rows}."""
        if self._path is None:
            raise ValueError(
                "compact requires a saved index (call save() or load() first)"
            )
        from custom_vector_database_spark.operators.layout import (
            compact_partitioned,
        )

        spark = self._clustered.sparkSession
        rows_path = os.path.join(self._path, "rows")
        # the rewrite is the moment tombstoned rows physically leave the
        # layout — the filter rides the compaction shuffle for free
        transform, on_success = self._compact_transform_and_clear()
        stats = compact_partitioned(
            spark, rows_path, "cluster", len(self.centroids),
            files_per_cluster, salt_col=self.id_col, transform=transform,
        )
        on_success()
        self._clustered = spark.read.parquet(rows_path)
        return stats

    def describe(self) -> dict:
        """Operational snapshot of the index: config + layout health.
        One keyed aggregate over the clustered table (cluster counts are
        n_clusters scalars); file stats only when saved. skew = max
        cluster size / mean — the number that predicts probe-time
        stragglers (a hot cluster makes one probe scan huge; mitigate by
        refitting with more clusters)."""
        counts = {
            r["cluster"]: r["n"]
            for r in self.clustered_df().groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_rows = sum(counts.values())
        mean = n_rows / max(len(counts), 1)
        out = {
            "kind": "ivf",
            "metric": self.metric,
            "n_rows": int(n_rows),
            "n_clusters": len(self.centroids),
            # the CALLER-facing dim — what search/upsert vectors must have;
            # on a dot index the stored dim is one more (the augmented
            # coordinate is internal, never supplied by the caller)
            "dim": self._expected_input_dim(),
            "stored_dim": len(self.centroids[0]),
            "n_tombstones": self._tombstone_count(),
            "carry_cols": list(self.carry_cols),
            "nonempty_clusters": len(counts),
            "max_cluster_rows": max(counts.values(), default=0),
            "cluster_skew": round(max(counts.values(), default=0) / mean, 3)
            if n_rows
            else 0.0,
            "saved": self._path is not None,
        }
        if self._path is not None:
            rows_path = os.path.join(self._path, "rows")
            out["n_files"] = sum(
                1
                for dp, _, fs in os.walk(rows_path)
                for f in fs
                if f.endswith(".parquet")
            )
        return out

    def _probe_clusters(self, query: list[float], nprobe: int) -> list[int]:
        """Centroid shortlist — pure driver-side math over the tiny
        centroid set (n_clusters × dim). The query must already be in
        index space (normalized for cosine — callers go through
        search/search_many which handle that)."""
        dists = []
        for cid, center in enumerate(self.centroids):
            d = math.fsum((float(c) - float(q)) ** 2 for c, q in zip(center, query))
            dists.append((d, cid))
        dists.sort()
        return [cid for _, cid in dists[:nprobe]]

    def search(
        self, query: list[float], k: int, nprobe: int = 4,
        dist_col: str | None = None, predicate=None,
        model_id: str | None = None,
    ) -> DataFrame:
        """Exact k-NN restricted to the ``nprobe`` nearest clusters.
        L2 index: returns (id, dist_sq) nearest-first — squared L2, the
        reference's API-level metric (vectordb.cpp:154). Cosine index:
        the query is unit-normalized and the result column is
        ``cos_dist`` = 1 − cosine similarity (≡ L2²/2 on unit vectors),
        nearest-first. Dot index: the query is zero-augmented and the
        result column is ``score`` = ⟨x,q⟩, LARGEST first (MIPS)."""
        self._check_model(model_id, "this IVF layout")
        nprobe = self._resolve_nprobe(nprobe)
        want = self._expected_input_dim()
        if len(query) != want:
            # _probe_clusters' zip() would silently truncate and the
            # distance fold would NULL-pad — garbage results, not an error
            raise ValueError(
                f"query dim {len(query)} != index dim {want} "
                f"(metric {self.metric!r})"
            )
        query = [float(x) for x in query]
        # per-metric query preparation + output projection; the candidate
        # pipeline below (probe -> pruned scan -> predicate -> heap top-k)
        # is ONE shared tail
        if self.metric == "dot":
            qn2 = math.fsum(x * x for x in query)
            m2 = float(self.max_norm) * float(self.max_norm)
            prepared = query + [0.0]
            dist_col = dist_col or "score"
            # ‖x'−q'‖² = M² + ‖q‖² − 2⟨x,q⟩ ⇒ score recovered exactly;
            # ascending _d2 order IS descending score order
            project = F.round((F.lit(m2 + qn2) - F.col("_d2")) / 2.0, 6)
        elif self.metric == "cosine":
            prepared = _normalize_query(query)
            dist_col = dist_col or "cos_dist"
            project = F.round(F.col("_d2") / 2.0, 6)
        else:
            prepared = query
            dist_col = dist_col or "dist_sq"
            project = None
        probe = self._probe_clusters(prepared, nprobe)
        candidates = self._live(
            self._clustered.filter(F.col("cluster").isin(probe))
        )
        if predicate is not None:
            candidates = candidates.filter(predicate)
        if project is None:
            # L2 ranks on ROUND-6 distances with the id tie-break (knn's
            # default), matching the batch path's rounded window order
            return knn_ops.knn(
                candidates, prepared, k,
                id_col=self.id_col, vec_col=self.vec_col, dist_col=dist_col,
            )
        hits = knn_ops.knn(
            candidates, prepared, k,
            id_col=self.id_col, vec_col=self.vec_col, dist_col="_d2",
            round_to=None,
        )
        return hits.select(self.id_col, project.alias(dist_col))

    def search_many(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 4,
        query_id: str = "qid",
        query_vec: str = "qvec",
        dist_col: str | None = None,
        max_query_rows: int | None = 100_000,
        filter_map: dict[str, str] | None = None,
        max_broadcast_bytes: int | None = 256 << 20,
        model_id: str | None = None,
    ) -> DataFrame:
        """Batch ANN: the k approximate nearest rows for EVERY row of a
        query table, answered from the saved cluster-partitioned layout in
        ONE job — the vector analogue of ranking.bm25_batch, and the
        production retrieval shape (embed a corpus once, retrieve for
        millions of queries).

        Physical plan, in order:
        1. each query row computes its OWN nprobe-nearest-centroid
           shortlist as a codegen'd projection over the literal centroid
           table (fitting.nprobe_clusters_sql) and explodes to
           (qid, qvec, cluster) — nprobe rows per query;
        2. the union of probed clusters (≤ n_clusters ints — one tiny job
           over the small query side only) becomes a LITERAL isin filter
           on the clustered table, so the scan is statically
           partition-pruned at file-listing time (plan-asserted in
           tests/test_plans.py) — rows in never-probed clusters are not
           even listed;
        3. the exploded query side (|queries| × nprobe rows) is BROADCAST
           into an equi-join on cluster — each query meets exactly the
           rows of its own probed clusters, so distance evaluations are
           ∝ |queries| × (nprobe/n_clusters) × |data|, never the full
           cross product;
        4. per-qid top-k window — only (qid, id, dist) scalars shuffle,
           never vectors.

        ``filter_map`` = {layout_col: query_col} adds per-query equality
        constraints (the multi-tenant "namespace" pattern: each query only
        retrieves rows whose carried attribute — fit(carry_cols=[...]) —
        equals ITS OWN value). The constraints evaluate inside the same
        probed-partition join, before any distance work, and cost nothing
        extra: the layout column is read from the pruned scan and compared
        against the broadcast side.

        The query side must broadcast; ``max_query_rows`` enforces that
        with an explicit error (the knn_join convention). Returns
        (qid, id, dist_sq) — or (qid, id, cos_dist) on a cosine index
        (query vectors unit-normalized inside the same projection as the
        shortlist), or (qid, id, score) LARGEST-first on a dot index
        (queries zero-augmented, ‖q‖² riding the broadcast side) —
        best-first within each qid, id tie-break.
        """
        self._check_model(model_id, "this IVF layout")
        nprobe = self._resolve_nprobe(nprobe)
        for qc in (query_id, query_vec):
            if qc in self._clustered.columns:
                raise ValueError(
                    f"query column {qc!r} collides with a layout column — "
                    "alias it on the query side first"
                )
        filter_map = dict(filter_map or {})
        for dcol, qcol in filter_map.items():
            if dcol not in self._clustered.columns:
                raise ValueError(
                    f"filter column {dcol!r} is not in the saved layout — "
                    f"build the index with fit(carry_cols=[{dcol!r}])"
                )
            if qcol in self._clustered.columns:
                raise ValueError(
                    f"query filter column {qcol!r} collides with a layout "
                    "column — alias it on the query side first"
                )
        qfilter_cols = [F.col(c) for c in filter_map.values()]
        # ONE scan of the query side serves the dim guard AND the row
        # count the broadcast guards need
        n_q = self._check_input_dims(queries, query_vec, "query")
        if max_query_rows is not None and n_q > max_query_rows:
            raise ValueError(
                f"queries has {n_q} rows > max_query_rows={max_query_rows}; "
                "a broadcast this large risks executor OOM — split the "
                "query table and search_many per split"
            )
        if max_broadcast_bytes is not None:
            # the broadcast ships the EXPLODED side: n_q × nprobe rows,
            # each carrying the query vector — row count alone
            # under-estimates it (the round-6 sf1 probe's lesson), so
            # guard on the byte arithmetic explicitly, at the ACTUAL
            # element width (callers may pass array<double> queries) plus
            # the dot path's augmented element and ‖q‖² column
            from pyspark.sql import types as T

            elem_t = queries.schema[query_vec].dataType.elementType
            elem_b = 8 if isinstance(elem_t, T.DoubleType) else 4
            dims = self._expected_input_dim() + (1 if self.metric == "dot" else 0)
            per_row = dims * elem_b + 24 + (8 if self.metric == "dot" else 0)
            # the explode caps at the cluster count - an exhaustive
            # nprobe >= n_clusters must not be refused for rows the
            # broadcast will never carry
            est = n_q * min(nprobe, len(self.centroids)) * per_row
            if est > max_broadcast_bytes:
                raise ValueError(
                    f"estimated broadcast {est >> 20} MiB (= {n_q} queries × "
                    f"{min(nprobe, len(self.centroids))} probes × ~{per_row} B/row) > "
                    f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB; "
                    "split the query table, lower nprobe, or use the "
                    "IVF-PQ batch path (32× smaller codes)"
                )
        qv = f"`{query_vec}`"
        qside = queries.select(F.col(query_id), F.col(query_vec), *qfilter_cols)
        extra_q_cols: list = []
        if self.metric == "cosine":
            qside = qside.select(
                F.col(query_id),
                _unit_normalize_expr(qv).alias(query_vec),
                *qfilter_cols,
            )
        elif self.metric == "dot":
            # per-query ‖q‖² travels with the (tiny) broadcast side; the
            # probe shortlist is computed on the zero-augmented query
            qside = qside.select(
                F.col(query_id),
                F.expr(
                    f"CAST(concat({qv}, array(CAST(0.0 AS FLOAT))) "
                    f"AS ARRAY<FLOAT>)"
                ).alias(query_vec),
                F.expr(_norm2_sql(qv)).alias("_qn2"),
                *qfilter_cols,
            )
            extra_q_cols = [F.col("_qn2")]
        probes = nprobe_clusters_col(
            f"CAST({qv} AS ARRAY<DOUBLE>)", self.centroids, nprobe
        )
        exploded = qside.select(
            F.col(query_id),
            F.col(query_vec),
            *extra_q_cols,
            *qfilter_cols,
            F.explode(probes).alias("cluster"),
        ).localCheckpoint(eager=False)  # computed once: feeds the probed-
        # cluster listing AND the join below (lazy: the listing's
        # collect materializes it)
        probed = sorted(
            r["cluster"] for r in exploded.select("cluster").distinct().collect()
        )
        out_dist = dist_col or {
            "cosine": "cos_dist", "dot": "score"
        }.get(self.metric, "dist_sq")
        dist = knn_ops.l2_squared(F.col(self.vec_col), F.col(query_vec))
        nearest_first = True
        if self.metric == "cosine":
            dist = dist / 2.0
        elif self.metric == "dot":
            m2 = float(self.max_norm) * float(self.max_norm)
            dist = (F.lit(m2) + F.col("_qn2") - dist) / 2.0  # = ⟨x,q⟩
            nearest_first = False
        joined = self._live(
            self._clustered.filter(F.col("cluster").isin(probed))
        ).join(F.broadcast(exploded), "cluster")
        for dcol, qcol in filter_map.items():
            joined = joined.filter(F.col(dcol) == F.col(qcol))
        scored = joined.select(
            F.col(query_id),
            F.col(self.id_col),
            F.round(dist, 6).alias(out_dist),
        )
        from pyspark.sql import Window

        order = (
            F.col(out_dist).asc_nulls_last()
            if nearest_first
            else F.col(out_dist).desc_nulls_last()
        )
        w = Window.partitionBy(query_id).orderBy(order, F.col(self.id_col).asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("rank")
        )
