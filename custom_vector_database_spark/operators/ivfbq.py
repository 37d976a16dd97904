"""IVF-BQ — the composed billion-scale layout with BINARY codes: coarse
KMeans partitioning (probe only nprobe clusters — scan-FRACTION pruning,
file-listing-level like IvfIndex) over 1-bit sign codes (8 bytes per 64
dims — 32× less I/O per scanned row than float32, operators/bq.py), with
an exact rerank joining the shortlist ids back to the caller's float
table.

Where it sits in the family: IVF-PQ's ADC is more accurate per stored
byte, but its codebooks are FITTED — a drifting corpus degrades code
quality until an explicit refit, and every upsert encodes deltas with
yesterday's codebooks. BQ codes are data-independent: an upserted
batch's codes are exactly as good as the build's, forever; only the
coarse probe routing shares IVF's drift exposure. That makes IVF-BQ the
maintenance-free point of the quantized family — the right default for
high-churn corpora on the daily-ingest path, with IVF-PQ as the
accuracy-tuned option for stable ones.

Determinism: the candidate stage ranks on (hamming, id) — a strict total
order over exact integers — and the rerank is exact float L2 with the id
tie-break, so, like BQ and SQ8 and unlike PQ's float ADC, the ENTIRE
search is engine-reproducible; the registered query uses the
guarantee-oracle pattern only because the probe shortlist depends on the
fitted centroids, which DuckDB cannot retrain.

Reference parity: generalizes the declared-but-unused index slot
(hnsw.h:41, 149) same as the sibling layouts; the reference itself is
float32-only (hnsw.h:45-52).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.bq import (
    bq_hamming,
    bq_pack,
    bq_pack_python,
)
from custom_vector_database_spark.operators.fitting import (
    collect_sample_matrix,
    kmeans_fit_np,
    nearest_centroid_col,
)
from custom_vector_database_spark.operators.calibrate import (
    AutoNprobeMixin,
)
from custom_vector_database_spark.operators.tombstones import TombstoneDeleteMixin

__all__ = ["IvfBqIndex"]


class IvfBqIndex(TombstoneDeleteMixin, AutoNprobeMixin):
    """Cluster-partitioned 1-bit sign codes + exact rerank (L2).

    Same incremental-CRUD surface as the sibling layouts: ``upsert``
    (delta append — and the delta's codes carry NO fit staleness),
    ``delete`` (tombstone sidecar), ``compact`` (heals fragmentation and
    physically clears tombstones)."""

    def __init__(self, centroids: list[list[float]], encoded: DataFrame,
                 id_col: str, vec_col: str, dim: int,
                 path: str | None = None, model_id: str | None = None):
        self.centroids = centroids
        self._encoded = encoded  # (id, cluster, words array<long>)
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self._path = path
        self.model_id = model_id  # embedding-model pin (layout.check_model_id)
        self.calibration: dict | None = None  # nprobe pin (operators/calibrate)
        self._tombstones: DataFrame | None = None

    def _check_model(self, supplied: str | None) -> None:
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
        )

        check_model_id(self.model_id, supplied, "this IVF-BQ layout")

    # -- build -------------------------------------------------------------
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
        model_id: str | None = None,
        target_rows_per_cluster: int = 512,
    ) -> "IvfBqIndex":
        """Coarse quantizer from a bounded driver-side sample (the ONLY
        fitted artifact — the codes themselves are sign bits, nothing to
        train); the full table pays exactly one codegen projection
        computing (cluster, packed words) together.

        ``n_clusters="auto"`` sizes the quantizer from the corpus row
        count (fitting.auto_n_clusters over ``target_rows_per_cluster``;
        the IvfIndex.fit rationale)."""
        feats = df.select(F.col(id_col), F.col(vec_col))
        stats = feats.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(vec_col).isNull().cast("long")).alias("n_null"),
            F.min(F.size(F.col(vec_col))).alias("dmin"),
            F.max(F.size(F.col(vec_col))).alias("dmax"),
        ).first()
        n = int(stats["n"])
        if n == 0:
            raise ValueError("cannot fit on an empty table")
        if stats["n_null"] or stats["dmin"] != stats["dmax"]:
            raise ValueError(
                f"{stats['n_null']} NULL vector(s) and dims spanning "
                f"[{stats['dmin']}, {stats['dmax']}] in the build input — "
                "every build vector must be non-NULL with one shared dim"
            )
        dim = int(stats["dmin"])
        from custom_vector_database_spark.operators.fitting import (
            resolve_n_clusters,
        )

        n_clusters = resolve_n_clusters(
            n_clusters, n, target_rows_per_cluster, fit_sample
        )
        x = collect_sample_matrix(feats, vec_col, n, fit_sample, seed)
        centroids = kmeans_fit_np(x, n_clusters, seed, max_iter)
        encoded = feats.select(
            F.col(id_col),
            nearest_centroid_col(
                f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)", centroids
            ).alias("cluster"),
            bq_pack(F.col(vec_col), dim).alias("words"),
        ).localCheckpoint(eager=True)  # eager measured faster than
        # lazy here (the A/B note in IvfIndex.fit)
        return cls(centroids, encoded, id_col, vec_col, dim,
                   model_id=model_id)

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        # big-k saves repartition BY CLUSTER first: without it every
        # write task emits one file per cluster it holds (up to
        # tasks x n_clusters files - an auto-sized k=4000 layout would
        # shatter into ~125k ~100KB files and every later probe pays
        # the listing/open tax compact() exists to heal). One hash
        # shuffle aligns clusters to tasks -> one file per cluster.
        # Small-k layouts (every fixture) keep the shuffle-free path
        # and their existing file layout.
        codes_w = self.encoded_df()
        if len(self.centroids) > 64:
            codes_w = codes_w.repartition(F.col("cluster"))
        codes_w.write.mode("overwrite").partitionBy(
            "cluster"
        ).parquet(os.path.join(path, "codes"))
        from custom_vector_database_spark.operators.layout import clear_tombstones

        clear_tombstones(path)  # stale sidecar at the target is obsolete
        if self._tombstones is not None:
            # re-point at what was just written BEFORE dropping the
            # tombstone view (same hazard as the sibling saves: the old
            # raw layout still physically holds the deleted rows)
            self._encoded = self._encoded.sparkSession.read.parquet(
                os.path.join(path, "codes")
            )
            self._tombstones = None
        meta = {
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "dim": self.dim,
            "model_id": self.model_id,
            "centroids": self.centroids,
        }
        if self.calibration is not None:
            # quantizer unchanged on this handle → the pinned recall
            # calibration stays valid; a fresh fit() starts unpinned
            # (operators/calibrate.py lifecycle note)
            meta["calibration"] = self.calibration
        from custom_vector_database_spark.operators.layout import (
            meta_write_lease,
        )

        # serialized against calibrate's read-modify-replace on the same
        # sibling lock (r11 ADVICE finding; ivf.py save rationale)
        with meta_write_lease(path, "save"):
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
        self._path = path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfBqIndex":
        from custom_vector_database_spark.operators.layout import (
            recover_partitioned_swap,
        )

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        recover_partitioned_swap(os.path.join(path, "codes"))
        codes = spark.read.parquet(os.path.join(path, "codes"))
        idx = cls(meta["centroids"], codes, meta["id_col"], meta["vec_col"],
                  int(meta["dim"]), path=path,
                  model_id=meta.get("model_id"))  # absent = legacy, unpinned
        idx.calibration = meta.get("calibration")  # nprobe pin, if earned
        idx._load_tombstones(spark)
        return idx

    def _raw_layout(self) -> DataFrame:
        return self._encoded

    def encoded_df(self) -> DataFrame:
        """The LIVE code view: the saved layout minus tombstoned rows."""
        return self._live(self._encoded)

    # -- incremental ingestion ---------------------------------------------
    def upsert(self, delta: DataFrame, model_id: str | None = None) -> int:
        """Append a delta batch to the SAVED layout. Unlike the PQ
        siblings the delta's codes carry zero fit staleness (sign bits
        are data-independent); only cluster ROUTING uses the fitted
        centroids. Ids colliding with tombstones refuse (compact first —
        the two-artifact-safe id-reuse contract of the mixin)."""
        if self._path is None:
            raise ValueError(
                "upsert requires a saved index (call save() or load() first)"
            )
        self._check_model(model_id)
        self._check_input_dims(delta, self.vec_col, "delta")
        encoded = delta.select(
            F.col(self.id_col),
            nearest_centroid_col(
                f"CAST(`{self.vec_col}` AS ARRAY<DOUBLE>)", self.centroids
            ).alias("cluster"),
            bq_pack(F.col(self.vec_col), self.dim).alias("words"),
        ).localCheckpoint(eager=False)  # lazy: the count materializes it
        n = encoded.count()
        self._refuse_tombstoned_delta(encoded.select(self.id_col))
        codes_path = os.path.join(self._path, "codes")
        encoded.write.mode("append").partitionBy("cluster").parquet(codes_path)
        self._encoded = delta.sparkSession.read.parquet(codes_path)
        return int(n)

    def _staleness_feats(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Staleness-report input (operators/pq.quantization_error_report
        protocol): the sign CODES carry zero fit staleness (data-
        independent bits), but cluster ROUTING uses the fitted coarse
        centroids exactly like IvfIndex — drifted deltas degrade stage-1
        probe recall identically, so the report prices the same
        rebuild."""
        from custom_vector_database_spark.operators.pq import (
            _refuse_report_vectors,
        )

        self._check_input_dims(df, vec_col, "report input")
        _refuse_report_vectors(df, vec_col, None)
        return df.select(F.col(vec_col).cast("array<double>").alias("_vec"))

    def _staleness_error_expr(self):
        from custom_vector_database_spark.operators.pq import (
            _min_sq_dist_sql,
        )

        return F.expr(_min_sq_dist_sql("_vec", self.centroids))

    def _check_input_dims(self, df: DataFrame, vec_col: str, what: str) -> int:
        """NULL-safe dim guard (the family contract): NULL or ragged
        vectors would pack NULL words into an unsearchable row."""
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.col(vec_col).isNull()
                    | (F.size(F.col(vec_col)) != self.dim)
                ).cast("long")
            ).alias("n_bad"),
        ).first()
        if stats["n_bad"]:
            raise ValueError(
                f"{stats['n_bad']} {what} vector(s) are NULL or do not have "
                f"dim {self.dim}"
            )
        return int(stats["n"])

    def compact(self, files_per_cluster: int = 1) -> dict:
        """Compact the saved code layout (layout.compact_partitioned);
        same contract as the siblings — and the 8-byte rows make
        per-file fixed costs proportionally the worst in the family."""
        if self._path is None:
            raise ValueError(
                "compact requires a saved index (call save() or load() first)"
            )
        from custom_vector_database_spark.operators.layout import (
            compact_partitioned,
        )

        spark = self._encoded.sparkSession
        codes_path = os.path.join(self._path, "codes")
        transform, on_success = self._compact_transform_and_clear()
        stats = compact_partitioned(
            spark, codes_path, "cluster", len(self.centroids),
            files_per_cluster, salt_col=self.id_col, transform=transform,
        )
        on_success()
        self._encoded = spark.read.parquet(codes_path)
        return stats

    def describe(self) -> dict:
        # LIVE view (sibling contract): n_rows/cluster stats must not
        # count tombstoned rows that every search already excludes
        counts = {
            int(r["cluster"]): int(r["n"])
            for r in self.encoded_df().groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_rows = sum(counts.values())
        nonempty = [c for c in counts.values() if c > 0]
        out = {
            "kind": "ivfbq",
            "n_rows": n_rows,
            "n_clusters": len(self.centroids),
            "dim": self.dim,
            "words_per_row": max(1, math.ceil(self.dim / 64)),
            "compression_x": 4.0 * self.dim / (8 * max(1, math.ceil(self.dim / 64))),
            "nonempty_clusters": len(nonempty),
            "cluster_skew": (max(nonempty) * len(nonempty) / n_rows)
            if n_rows else 0.0,
            "n_tombstones": self._tombstone_count(),
            "saved": self._path is not None,
        }
        if self._path is not None:
            n_files = 0
            for _, _, files in os.walk(os.path.join(self._path, "codes")):
                n_files += sum(f.endswith(".parquet") for f in files)
            out["n_files"] = n_files
        return out

    # -- search ------------------------------------------------------------
    def _probe_clusters(self, query: list[float], nprobe: int) -> list[int]:
        dists = []
        for cid, center in enumerate(self.centroids):
            d = math.fsum((float(c) - float(q)) ** 2 for c, q in zip(center, query))
            dists.append((d, cid))
        dists.sort()
        return [cid for _, cid in dists[:nprobe]]

    def search(
        self,
        query: list[float],
        k: int,
        base_df: DataFrame,
        nprobe: int = 4,
        rerank: int = 4,
        model_id: str | None = None,
    ) -> DataFrame:
        """Top-k by exact L2: probe the nprobe nearest clusters, rank
        the pruned CODE scan by (hamming, id), then broadcast-join the
        k·rerank shortlist ids back into ``base_df`` (the float table
        the index was built from) for exact distances — the scan reads 8
        bytes per 64 dims per candidate row, and full vectors are read
        for shortlist survivors only."""
        self._check_model(model_id)
        nprobe = self._resolve_nprobe(nprobe)
        if len(query) != self.dim:
            raise ValueError(f"query dim {len(query)} != index dim {self.dim}")
        query = [float(x) for x in query]
        qwords = F.array(
            *[F.lit(int(w)).cast("long") for w in bq_pack_python(query)]
        )
        probe = self._probe_clusters(query, nprobe)
        cands = self._live(
            self._encoded.filter(F.col("cluster").isin(probe))
        ).select(
            F.col(self.id_col),
            bq_hamming(F.col("words"), qwords).alias("hamming"),
        )
        shortlist = (
            cands.orderBy(F.col("hamming").asc_nulls_last(), F.col(self.id_col))
            .limit(k * rerank)
            .select(self.id_col)
        )
        from custom_vector_database_spark.functions.vector import l2_squared

        qlit = F.array(*[F.lit(x) for x in query])
        return (
            base_df.select(F.col(self.id_col), F.col(self.vec_col))
            .join(F.broadcast(shortlist), self.id_col)
            .select(
                F.col(self.id_col),
                F.round(l2_squared(F.col(self.vec_col), qlit), 6).alias(
                    "dist_sq"
                ),
            )
            .orderBy(F.col("dist_sq").asc_nulls_last(), F.col(self.id_col))
            .limit(k)
        )

    def search_many(
        self,
        queries: DataFrame,
        k: int,
        base_df: DataFrame,
        nprobe: int = 4,
        query_id: str = "qid",
        query_vec: str = "qvec",
        rerank: int = 4,
        max_query_rows: int | None = 100_000,
        max_broadcast_bytes: int | None = 256 << 20,
        model_id: str | None = None,
    ) -> DataFrame:
        """Batch IVF-BQ: the k nearest rows for every query row, answered
        from the saved code layout in one job — the family's
        search_many contract on the cheapest stored codes.

        Plan (the IvfIndex.search_many shape with a Hamming candidate
        stage): each query row computes its own nprobe shortlist as a
        codegen projection and explodes to (qid, qwords, cluster); the
        union of probed clusters statically partition-prunes the CODE
        scan; the broadcast equi-join on cluster scores candidates by
        XOR+popcount; a per-qid window keeps k·rerank by (hamming, id) —
        bare triples shuffle, 8-byte codes scan; survivors broadcast-join
        back into ``base_df`` with the (broadcast) query vectors for the
        exact per-qid top-k. Deterministic after the probe stage, exactly
        like the single-query path."""
        self._check_model(model_id)
        nprobe = self._resolve_nprobe(nprobe)
        for qc in (query_id, query_vec):
            # the rejoin also meets base_df's (id, vec) columns, so those
            # names collide too - the layout-only check missed base-side
            # ambiguity (review finding)
            if qc in self._encoded.columns or qc in (self.id_col, self.vec_col):
                raise ValueError(
                    f"query column {qc!r} collides with a layout or base "
                    "column - alias it on the query side first"
                )
        n_q = self._check_input_dims(queries, query_vec, "query")
        if max_query_rows is not None and n_q > max_query_rows:
            raise ValueError(
                f"queries has {n_q} rows > max_query_rows={max_query_rows}; "
                "a broadcast this large risks executor OOM - split the "
                "query table and search_many per split"
            )
        if max_broadcast_bytes is not None:
            # the rerank broadcast carries the FULL float query vectors -
            # the family's row-count-is-not-bytes lesson applies here too
            from pyspark.sql import types as T

            elem_t = queries.schema[query_vec].dataType.elementType
            elem_b = 8 if isinstance(elem_t, T.DoubleType) else 4
            words = max(1, math.ceil(self.dim / 64))
            per_row = self.dim * elem_b + words * 8 + 32
            est = n_q * per_row
            if est > max_broadcast_bytes:
                raise ValueError(
                    f"estimated broadcast {est >> 20} MiB (= {n_q} queries × "
                    f"~{per_row} B of vector+code words/row) > "
                    f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB; "
                    "split the query table and search_many per split"
                )
        from custom_vector_database_spark.operators.fitting import (
            nprobe_clusters_col,
        )

        qv = f"`{query_vec}`"
        probes = nprobe_clusters_col(
            f"CAST({qv} AS ARRAY<DOUBLE>)", self.centroids, nprobe
        )
        exploded = queries.select(
            F.col(query_id),
            bq_pack(F.col(query_vec), self.dim).alias("__qwords"),
            F.explode(probes).alias("cluster"),
        ).localCheckpoint(eager=False)  # feeds the probed listing AND the
        # join (lazy: the listing's collect materializes it)
        probed = sorted(
            r["cluster"] for r in exploded.select("cluster").distinct().collect()
        )
        from pyspark.sql import Window

        triples = (
            self._live(self._encoded.filter(F.col("cluster").isin(probed)))
            .join(F.broadcast(exploded), "cluster")
            .select(
                F.col(query_id),
                F.col(self.id_col),
                bq_hamming(F.col("words"), F.col("__qwords")).alias("hamming"),
            )
        )
        wq = Window.partitionBy(query_id).orderBy(
            F.col("hamming").asc_nulls_last(), F.col(self.id_col).asc()
        )
        shortlist = (
            triples.withColumn("__rk", F.row_number().over(wq))
            .filter(F.col("__rk") <= k * rerank)
            .select(query_id, self.id_col)
        )
        from custom_vector_database_spark.functions.vector import l2_squared

        rejoined = (
            base_df.select(F.col(self.id_col), F.col(self.vec_col))
            .join(F.broadcast(shortlist), self.id_col)
            .join(
                F.broadcast(queries.select(F.col(query_id), F.col(query_vec))),
                query_id,
            )
        )
        wr = Window.partitionBy(query_id).orderBy(
            F.col("dist_sq").asc_nulls_last(), F.col(self.id_col).asc()
        )
        return (
            rejoined.select(
                query_id,
                self.id_col,
                F.round(
                    l2_squared(F.col(self.vec_col), F.col(query_vec)), 6
                ).alias("dist_sq"),
            )
            .withColumn("__rk", F.row_number().over(wr))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
        )
