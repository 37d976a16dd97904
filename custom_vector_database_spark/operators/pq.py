"""Product quantization (PQ) — the memory-bounded ANN scale path next to
LSH (bucketing) and IVF (partition pruning).

Why it matters at 100 TB: a 64-d float32 vector is 256 bytes; its PQ code
(m=8 subspaces × 1 byte) is 8 bytes — 32× compression. The ADC
(asymmetric distance computation) scan therefore touches only (id, codes),
so the candidate-generation pass over the whole table reads ~3% of the
vector bytes; the full-precision vectors are fetched for a final rerank of
only the top candidates via an id-pushdown point read.

Design, Spark-first (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public method):
- fit    = per-subspace MLlib KMeans codebooks (m tiny fits on a bounded
           sample), then ONE chained-transform pass encodes every row to
           its m-byte code. All JVM-side.
- search = the query's distance to every centroid of every subspace is a
           tiny driver-side table (m × k floats — the LUT). ADC distance
           is then a pure Catalyst expression: m element_at lookups + adds
           per row, whole-stage-codegen'd, topped with
           orderBy().limit() → TakeOrderedAndProject (heap top-k).
- rerank = exact L2 over just the ADC top ``k × rerank`` candidates,
           fetched by an IN(id…) predicate that pushes into the base scan.

Accuracy contract: recall vs exact k-NN in tests (SURVEY §4.3), never
oracle hash-equality. Reference parity: this plays the reference's HNSW
role (approximate O7 after an explicit O6 build, vectordb.cpp:82-156)
with a scale story the single-node graph cannot offer.
"""

from __future__ import annotations

import json
import os

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import knn as knn_ops
from custom_vector_database_spark.operators.fitting import bounded_train_sample

__all__ = ["PqIndex", "IvfPqIndex"]


class PqIndex:
    """Per-subspace KMeans codebooks + the m-byte-code table."""

    def __init__(
        self,
        codebooks: list[list[list[float]]],  # [m][k][dsub]
        encoded: DataFrame,  # (id_col, codes array<int>)
        id_col: str,
        dim: int,
    ):
        self.codebooks = codebooks
        self._encoded = encoded
        self.id_col = id_col
        self.dim = dim
        self.m = len(codebooks)
        self.k = len(codebooks[0])

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        m: int = 8,
        k: int = 16,
        seed: int = 42,
        max_iter: int = 10,
        fit_sample: int = 100_000,
    ) -> "PqIndex":
        """Train m subspace codebooks (k centroids each) on a bounded
        sample, then encode the full table in one pass.

        The m KMeans fits each scan only the checkpointed sample; the
        full-table work is a single chained transform whose plan is m
        KMeans-assign projections — no shuffle, no Python."""
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("cannot fit PQ on an empty table")
        dim = int(first["d"])
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m

        feats = df.select(F.col(id_col), F.col(vec_col).alias("_vec"))
        for j in range(m):
            feats = feats.withColumn(
                f"_sub{j}",
                array_to_vector(
                    F.slice("_vec", j * dsub + 1, dsub).cast("array<double>")
                ),
            )
        n = feats.count()
        train = bounded_train_sample(feats, n, fit_sample, seed)

        # The m subspace fits are independent jobs over the same cached
        # sample — submit them concurrently (Spark's scheduler interleaves
        # them) so fit wall-time is ~the slowest single fit, not m× serial.
        def _fit_subspace(j: int):
            km = KMeans(
                k=k,
                seed=seed + j,
                featuresCol=f"_sub{j}",
                predictionCol=f"_code{j}",
                maxIter=max_iter,
                initMode="random",
            )
            return km.fit(train)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
            models = list(pool.map(_fit_subspace, range(m)))

        codebooks: list[list[list[float]]] = []
        encoded = feats
        for model in models:
            codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
            encoded = model.transform(encoded)
        encoded = encoded.select(
            id_col, F.array(*[f"_code{j}" for j in range(m)]).alias("codes")
        ).localCheckpoint(eager=True)
        return cls(codebooks, encoded, id_col, dim)

    def encoded_df(self) -> DataFrame:
        return self._encoded

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "codebooks.json"), "w") as f:
            json.dump(
                {"id_col": self.id_col, "dim": self.dim, "codebooks": self.codebooks},
                f,
            )
        self._encoded.write.mode("overwrite").parquet(os.path.join(path, "codes"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PqIndex":
        with open(os.path.join(path, "codebooks.json")) as f:
            meta = json.load(f)
        encoded = spark.read.parquet(os.path.join(path, "codes"))
        return cls(meta["codebooks"], encoded, meta["id_col"], meta["dim"])

    # -- search -------------------------------------------------------------
    def _adc_expr(self, query: list[float]) -> Column:
        """Asymmetric distance: Σ_j LUT_j[code_j], with the per-subspace
        LUTs (query-to-centroid squared distances) inlined as literal
        arrays — m element_at lookups + adds per row, fully codegen'd."""
        dsub = self.dim // self.m
        terms: list[Column] = []
        for j in range(self.m):
            q_sub = query[j * dsub : (j + 1) * dsub]
            lut = [
                sum((float(c) - float(q)) ** 2 for c, q in zip(center, q_sub))
                for center in self.codebooks[j]
            ]
            lut_arr = F.array(*[F.lit(v) for v in lut])
            # codes are 0-based KMeans cluster ids; element_at is 1-based
            terms.append(
                F.element_at(lut_arr, F.element_at(F.col("codes"), j + 1) + 1)
            )
        adc = terms[0]
        for t in terms[1:]:
            adc = adc + t
        return adc

    def search(
        self,
        query: list[float],
        k: int,
        base_df: DataFrame | None = None,
        vec_col: str = "vec",
        rerank: int = 0,
        dist_col: str = "dist_sq",
    ) -> DataFrame:
        """ADC top-k over the code table. With ``rerank`` > 0 and the
        full-precision ``base_df``, the ADC top ``k·rerank`` candidate ids
        are re-scored exactly — the candidate fetch is an IN(ids) predicate
        pushed into the base scan, so the full vectors of only k·rerank
        rows are ever read."""
        if len(query) != self.dim:
            raise ValueError(f"query dim {len(query)} != index dim {self.dim}")
        query = [float(x) for x in query]
        adc = (
            self._encoded.select(
                self.id_col, self._adc_expr(query).alias(dist_col)
            )
            .orderBy(F.col(dist_col).asc_nulls_last())
            .limit(k * rerank if rerank > 0 else k)
        )
        if rerank <= 0:
            return adc
        if base_df is None:
            raise ValueError("rerank requires the full-precision base_df")
        cand_ids = [r[self.id_col] for r in adc.select(self.id_col).collect()]
        candidates = base_df.filter(F.col(self.id_col).isin(cand_ids))
        return knn_ops.knn(
            candidates, query, k,
            id_col=self.id_col, vec_col=vec_col, dist_col=dist_col,
        )


class IvfPqIndex:
    """IVF-PQ: coarse KMeans clusters + PQ-coded RESIDUALS — the composed
    billion-scale ANN layout (FAISS's IVFPQ, from the same public Jégou
    et al. 2011 paper).

    Why compose: IVF prunes I/O (probe nprobe/n_clusters of the data —
    saved layout is Parquet partitioned by cluster, so probes are
    partition-pruned scans); PQ shrinks what's left (the probed partitions
    store 1-byte-per-subspace codes, not vectors). Quantizing residuals
    (vec − cluster centroid) instead of raw vectors concentrates the
    codebooks on the within-cluster distribution — materially better
    recall at the same code budget.

    Search: shortlist clusters driver-side; per probed cluster build the
    LUT from the query's residual against THAT centroid; the ADC
    expression dispatches on the row's cluster id with a literal CASE —
    still pure Catalyst, nprobe·m lookups worst case per row, evaluated
    only over probed partitions.
    """

    def __init__(
        self,
        centroids: list[list[float]],
        codebooks: list[list[list[float]]],
        encoded: DataFrame,  # (id_col, cluster, codes)
        id_col: str,
        dim: int,
    ):
        self.centroids = centroids
        self.codebooks = codebooks
        self._encoded = encoded
        self.id_col = id_col
        self.dim = dim
        self.m = len(codebooks)
        self.k = len(codebooks[0])

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        n_clusters: int = 16,
        m: int = 8,
        k: int = 16,
        seed: int = 42,
        max_iter: int = 10,
        fit_sample: int = 100_000,
    ) -> "IvfPqIndex":
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("cannot fit IVF-PQ on an empty table")
        dim = int(first["d"])
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m

        feats = df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_vec"),
        ).withColumn("_features", array_to_vector("_vec"))
        n = feats.count()
        train = bounded_train_sample(feats, n, fit_sample, seed)

        coarse = KMeans(
            k=n_clusters, seed=seed, featuresCol="_features",
            predictionCol="cluster", maxIter=max_iter, initMode="random",
        ).fit(train)
        centroids = [[float(x) for x in c] for c in coarse.clusterCenters()]

        # residual = vec − centroid[cluster], via a literal centroid table
        cent_lit = F.array(
            *[F.array(*[F.lit(x) for x in c]) for c in centroids]
        )
        def with_residual(d: DataFrame) -> DataFrame:
            cent = F.element_at(cent_lit, F.col("cluster") + 1)
            d = d.withColumn(
                "_res", F.zip_with("_vec", cent, lambda a, b: a - b)
            )
            for j in range(m):
                d = d.withColumn(
                    f"_sub{j}",
                    array_to_vector(F.slice("_res", j * dsub + 1, dsub)),
                )
            return d

        train_res = with_residual(coarse.transform(train)).localCheckpoint(
            eager=True
        )

        def _fit_subspace(j: int):
            return KMeans(
                k=k, seed=seed + 1 + j, featuresCol=f"_sub{j}",
                predictionCol=f"_code{j}", maxIter=max_iter, initMode="random",
            ).fit(train_res)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
            models = list(pool.map(_fit_subspace, range(m)))
        codebooks = [
            [[float(x) for x in c] for c in mdl.clusterCenters()] for mdl in models
        ]

        encoded = with_residual(coarse.transform(feats))
        for mdl in models:
            encoded = mdl.transform(encoded)
        encoded = encoded.select(
            id_col,
            "cluster",
            F.array(*[f"_code{j}" for j in range(m)]).alias("codes"),
        ).localCheckpoint(eager=True)
        return cls(centroids, codebooks, encoded, id_col, dim)

    def encoded_df(self) -> DataFrame:
        return self._encoded

    def save(self, path: str) -> None:
        """Codes Parquet-partitioned BY CLUSTER — a probe of nprobe
        clusters is a partition-pruned scan of nprobe/n_clusters of the
        (already 16-32× compressed) index."""
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "id_col": self.id_col,
                    "dim": self.dim,
                    "centroids": self.centroids,
                    "codebooks": self.codebooks,
                },
                f,
            )
        self._encoded.write.mode("overwrite").partitionBy("cluster").parquet(
            os.path.join(path, "codes")
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfPqIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        encoded = spark.read.parquet(os.path.join(path, "codes"))
        return cls(
            meta["centroids"], meta["codebooks"], encoded, meta["id_col"],
            meta["dim"],
        )

    def _probe(self, query: list[float], nprobe: int) -> list[int]:
        dists = sorted(
            (sum((c - q) ** 2 for c, q in zip(cent, query)), cid)
            for cid, cent in enumerate(self.centroids)
        )
        return [cid for _, cid in dists[:nprobe]]

    def search(
        self,
        query: list[float],
        k: int,
        nprobe: int = 4,
        base_df: DataFrame | None = None,
        vec_col: str = "vec",
        rerank: int = 0,
        dist_col: str = "dist_sq",
    ) -> DataFrame:
        if len(query) != self.dim:
            raise ValueError(f"query dim {len(query)} != index dim {self.dim}")
        query = [float(x) for x in query]
        probe = self._probe(query, nprobe)
        dsub = self.dim // self.m

        # per-cluster ADC: LUT built from the query residual vs that
        # cluster's centroid; dispatch on the row's cluster id
        adc = F.lit(None).cast("double")
        for cid in probe:
            res = [q - c for q, c in zip(query, self.centroids[cid])]
            terms = []
            for j in range(self.m):
                r_sub = res[j * dsub : (j + 1) * dsub]
                lut = [
                    sum((float(c) - r) ** 2 for c, r in zip(center, r_sub))
                    for center in self.codebooks[j]
                ]
                terms.append(
                    F.element_at(
                        F.array(*[F.lit(v) for v in lut]),
                        F.element_at(F.col("codes"), j + 1) + 1,
                    )
                )
            cluster_adc = terms[0]
            for t in terms[1:]:
                cluster_adc = cluster_adc + t
            adc = F.when(F.col("cluster") == cid, cluster_adc).otherwise(adc)

        cand = (
            self._encoded.filter(F.col("cluster").isin(probe))
            .select(self.id_col, adc.alias(dist_col))
            .orderBy(F.col(dist_col).asc_nulls_last())
            .limit(k * rerank if rerank > 0 else k)
        )
        if rerank <= 0:
            return cand
        if base_df is None:
            raise ValueError("rerank requires the full-precision base_df")
        ids = [r[self.id_col] for r in cand.select(self.id_col).collect()]
        return knn_ops.knn(
            base_df.filter(F.col(self.id_col).isin(ids)), query, k,
            id_col=self.id_col, vec_col=vec_col, dist_col=dist_col,
        )
