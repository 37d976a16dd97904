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
    nearest_centroid_expr,
)

__all__ = ["IvfIndex"]


class IvfIndex:
    """KMeans-clustered vector table + centroid shortlist search."""

    def __init__(self, centroids: list[list[float]], clustered: DataFrame,
                 id_col: str, vec_col: str):
        self.centroids = centroids
        self._clustered = clustered
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        n_clusters: int = 16,
        seed: int = 42,
        max_iter: int = 10,
        fit_sample: int = 100_000,
    ) -> "IvfIndex":
        """Build the index. The coarse quantizer trains on at most
        ``fit_sample`` rows (uniform sample — statistically plenty for
        k ≪ sample centroids) driver-side in numpy; only the single
        assign pass below is full-table, and it is one whole-stage-
        codegen'd projection (nearest_centroid_expr), not an MLlib model
        UDF."""
        feats = df.select(F.col(id_col), F.col(vec_col))
        n = feats.count()
        x = collect_sample_matrix(feats, vec_col, n, fit_sample, seed)
        centroids = kmeans_fit_np(x, n_clusters, seed, max_iter)
        clustered = (
            feats.withColumn(
                "cluster",
                nearest_centroid_expr(
                    f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)", centroids
                ),
            )
            .localCheckpoint(eager=True)  # the materialized index
        )
        return cls(centroids, clustered, id_col, vec_col)

    # -- persistence: partitioned by cluster → partition-pruned probes -----
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self._clustered.write.mode("overwrite").partitionBy("cluster").parquet(
            os.path.join(path, "rows")
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "id_col": self.id_col,
                    "vec_col": self.vec_col,
                    "centroids": self.centroids,
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        rows = spark.read.parquet(os.path.join(path, "rows"))
        return cls(meta["centroids"], rows, meta["id_col"], meta["vec_col"])

    def clustered_df(self) -> DataFrame:
        return self._clustered

    def _probe_clusters(self, query: list[float], nprobe: int) -> list[int]:
        """Centroid shortlist — pure driver-side math over the tiny
        centroid set (n_clusters × dim)."""
        dists = []
        for cid, center in enumerate(self.centroids):
            d = math.fsum((float(c) - float(q)) ** 2 for c, q in zip(center, query))
            dists.append((d, cid))
        dists.sort()
        return [cid for _, cid in dists[:nprobe]]

    def search(
        self, query: list[float], k: int, nprobe: int = 4,
        dist_col: str = "dist_sq",
    ) -> DataFrame:
        """Exact k-NN restricted to the ``nprobe`` nearest clusters.
        Returns (id, dist_sq) nearest-first — squared L2, the reference's
        API-level metric (vectordb.cpp:154)."""
        probe = self._probe_clusters(query, nprobe)
        candidates = self._clustered.filter(F.col("cluster").isin(probe))
        return knn_ops.knn(
            candidates, [float(x) for x in query], k,
            id_col=self.id_col, vec_col=self.vec_col, dist_col=dist_col,
        )
