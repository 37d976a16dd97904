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
- fit    = per-subspace KMeans codebooks trained driver-side in numpy
           over a bounded sample (operators/fitting.py rationale), then
           ONE codegen'd projection encodes every row to its m-byte code
           (nearest_centroid_expr per subspace — no MLlib model UDFs in
           the full-table pass).
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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import knn as knn_ops
from custom_vector_database_spark.operators.fitting import (
    ARROW_ASSIGN_FROM,
    _centroid_matrix,
    array_literal_sql,
    centroids_literal_sql,
    collect_sample_matrix,
    kmeans_fit_np,
    nearest_centroid_expr,
    nearest_centroid_sql,
    nprobe_clusters_col,
    nprobe_clusters_sql,
)

__all__ = ["PqIndex", "IvfPqIndex", "quantization_error_report"]


class PqIndex:
    """Per-subspace KMeans codebooks + the m-byte-code table."""

    def __init__(
        self,
        codebooks: list[list[list[float]]],  # [m][k][dsub]
        encoded: DataFrame,  # (id_col, codes array<int>)
        id_col: str,
        dim: int,
        model_id: str | None = None,
    ):
        self.codebooks = codebooks
        self._encoded = encoded
        self.id_col = id_col
        self.dim = dim
        self.m = len(codebooks)
        self.k = len(codebooks[0])
        self.model_id = model_id  # embedding-model pin (layout.check_model_id)

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
        model_id: str | None = None,
    ) -> "PqIndex":
        """Train m subspace codebooks (k centroids each) driver-side on a
        bounded sample (ONE sampling pass collects the matrix), then
        encode the full table in a single codegen'd projection — m
        nearest-centroid expressions over array slices, no shuffle, no
        Python, no per-iteration jobs."""
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("cannot fit PQ on an empty table")
        dim = int(first["d"])
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m

        feats = df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_vec")
        )
        n = feats.count()
        x = collect_sample_matrix(feats, "_vec", n, fit_sample, seed)
        codebooks = [
            kmeans_fit_np(x[:, j * dsub : (j + 1) * dsub], k, seed + j, max_iter)
            for j in range(m)
        ]
        if k >= ARROW_ASSIGN_FROM:
            # big subspace codebooks (k=256 is the standard PQ byte-code
            # config): the interpreted fold costs dim×k element-ops/row —
            # encode through the fused Arrow path instead (flat PQ ≡
            # IVF-PQ with one zero centroid, residual = the raw vector)
            enc = _fused_encode_col([[0.0] * dim], codebooks, dim)
            encoded = feats.select(
                F.col(id_col), enc(F.col("_vec")).alias("_enc")
            ).select(
                F.col(id_col), F.col("_enc.codes").alias("codes")
            ).localCheckpoint(eager=True)  # eager measured faster than
            # lazy here (the A/B note in IvfIndex.fit)
            return cls(codebooks, encoded, id_col, dim, model_id=model_id)
        codes = F.expr(
            "array("
            + ",".join(
                nearest_centroid_sql(f"slice(_vec, {j * dsub + 1}, {dsub})", codebooks[j])
                for j in range(m)
            )
            + ")"
        )
        encoded = feats.select(id_col, codes.alias("codes")).localCheckpoint(
            eager=True  # eager measured faster (IvfIndex.fit A/B note)
        )
        return cls(codebooks, encoded, id_col, dim, model_id=model_id)

    def encoded_df(self) -> DataFrame:
        return self._encoded

    def _staleness_feats(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Flat PQ quantizes raw vectors — the report's residual IS the
        vector (quantization_error_report protocol)."""
        _refuse_report_vectors(df, vec_col, self.dim)
        return df.select(
            F.col(vec_col).cast("array<double>").alias("_res")
        )

    def _staleness_error_expr(self) -> Column:
        return _pq_error_expr("_res", self.codebooks, self.dim)

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "codebooks.json"), "w") as f:
            json.dump(
                {"id_col": self.id_col, "dim": self.dim,
                 "model_id": self.model_id, "codebooks": self.codebooks},
                f,
            )
        self._encoded.write.mode("overwrite").parquet(os.path.join(path, "codes"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PqIndex":
        with open(os.path.join(path, "codebooks.json")) as f:
            meta = json.load(f)
        encoded = spark.read.parquet(os.path.join(path, "codes"))
        return cls(meta["codebooks"], encoded, meta["id_col"], meta["dim"],
                   model_id=meta.get("model_id"))  # absent = legacy, unpinned

    # -- search -------------------------------------------------------------
    def _adc_expr(self, query: list[float]) -> Column:
        """Asymmetric distance: Σ_j LUT_j[code_j], with the per-subspace
        LUTs (query-to-centroid squared distances) inlined as literal
        arrays — m element_at lookups + adds per row, fully codegen'd
        (emitted as one SQL string: the m-term tower through the Python
        Column API would cost m×k py4j round-trips)."""
        dsub = self.dim // self.m
        terms: list[str] = []
        for j in range(self.m):
            q_sub = query[j * dsub : (j + 1) * dsub]
            lut = [
                sum((float(c) - float(q)) ** 2 for c, q in zip(center, q_sub))
                for center in self.codebooks[j]
            ]
            # codes are 0-based KMeans cluster ids; element_at is 1-based
            terms.append(
                f"element_at({array_literal_sql(lut)}, "
                f"element_at(codes, {j + 1}) + 1)"
            )
        return F.expr(" + ".join(terms))

    def search(
        self,
        query: list[float],
        k: int,
        base_df: DataFrame | None = None,
        vec_col: str = "vec",
        rerank: int = 0,
        dist_col: str = "dist_sq",
        model_id: str | None = None,
    ) -> DataFrame:
        """ADC top-k over the code table. With ``rerank`` > 0 and the
        full-precision ``base_df``, the ADC top ``k·rerank`` candidate ids
        are re-scored exactly — the candidate fetch is an IN(ids) predicate
        pushed into the base scan, so the full vectors of only k·rerank
        rows are ever read."""
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
            in_literals,
        )

        check_model_id(self.model_id, model_id, "this PQ codebook")
        if len(query) != self.dim:
            raise ValueError(f"query dim {len(query)} != index dim {self.dim}")
        query = [float(x) for x in query]
        adc = (
            self._encoded.select(
                self.id_col, self._adc_expr(query).alias(dist_col)
            )
            .orderBy(F.col(dist_col).asc_nulls_last(), F.col(self.id_col).asc())
            .limit(k * rerank if rerank > 0 else k)
        )
        if rerank <= 0:
            return adc
        if base_df is None:
            raise ValueError("rerank requires the full-precision base_df")
        cand_ids = [r[self.id_col] for r in adc.select(self.id_col).collect()]
        candidates = base_df.filter(in_literals(self.id_col, cand_ids))
        return knn_ops.knn(
            candidates, query, k,
            id_col=self.id_col, vec_col=vec_col, dist_col=dist_col,
        )


def _fused_encode_col(
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
):
    """The Arrow-batched IVF-PQ encode: ONE pandas_udf emitting
    struct<cluster:int, codes:array<int>> per row — one (batch × k)
    matmul for the coarse assign, then m small (batch × k_sub) matmuls
    over the residual sub-slices for the codes. All batch-local numpy;
    nothing driver-side. Same semantics as the codegen route:
    first-minimum tie rule everywhere, NULL/wrong-dim/non-finite rows →
    NULL cluster + NULL codes (the fit/upsert guards refuse those rows
    up front anyway — fitting.nearest_centroid_col convention)."""
    from pyspark.sql.functions import pandas_udf

    cents, c2 = _centroid_matrix(centroids)
    m = len(codebooks)
    dsub = dim // m
    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    books2 = [(b * b).sum(axis=1) for b in books]

    from custom_vector_database_spark.operators.fitting import stack_valid

    @pandas_udf("struct<cluster:int, codes:array<int>>")
    def _enc(v: pd.Series) -> pd.DataFrame:
        vals, good, x = stack_valid(v, dim)
        n = len(vals)
        cluster: list = [None] * n
        codes: list = [None] * n
        if good:
            d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) + c2
            am = d2.argmin(axis=1)
            ok = np.isfinite(d2).all(axis=1)
            res = x - cents[am]
            sub = np.empty((len(good), m), dtype=np.int64)
            for j in range(m):
                r = res[:, j * dsub : (j + 1) * dsub]
                dj = (
                    (r * r).sum(axis=1, keepdims=True)
                    - 2.0 * (r @ books[j].T)
                    + books2[j]
                )
                sub[:, j] = dj.argmin(axis=1)
            for t, i in enumerate(good):
                if ok[t]:
                    cluster[i] = int(am[t])
                    codes[i] = [int(c) for c in sub[t]]
        return pd.DataFrame(
            {"cluster": pd.Series(cluster, dtype="Int32"), "codes": codes}
        )

    return _enc


def _residual_vs_centroid_col(centroids: list[list[float]]):
    """Arrow-batched residual (vec − centroid[cluster]) — replaces the
    element_at(<k×dim literal table>, cluster+1) lookup whose SQL text
    alone is megabytes at auto-sized k (parse cost, not eval cost —
    PLANS.md round-3 note). Pure numpy fancy-indexing per batch; NULL
    vec/cluster or wrong dim → NULL residual (the SQL zip_with's
    contract)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    dim = cents.shape[1]
    k = cents.shape[0]

    @pandas_udf("array<double>")
    def _res(v: pd.Series, c: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        cls = c.to_numpy()
        out: list = [None] * len(vals)
        good = [
            i for i, (e, ci) in enumerate(zip(vals, cls))
            if e is not None and len(e) == dim
            # pd.isna, not `is not None`: a NULL cluster arrives as NaN
            # through the nullable-int -> float64 pandas conversion, and
            # int(NaN) would fail the whole Arrow batch (ADVICE r13)
            and not pd.isna(ci) and 0 <= int(ci) < k
        ]
        if good:
            x = np.stack([np.asarray(vals[i], dtype=np.float64) for i in good])
            idx = np.asarray([int(cls[i]) for i in good], dtype=np.int64)
            r = x - cents[idx]
            for t, i in enumerate(good):
                out[i] = r[t]
        return pd.Series(out)

    return _res


def _query_luts_col(
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
):
    """Arrow-batched per-(query, probed-cluster) ADC LUTs: residual vs
    THAT cluster's centroid, then per-subspace squared distances to
    every codebook center — array<array<double>> of m k-length LUTs,
    exactly what search_many's SQL fold emits, as m small numpy
    broadcasts per batch. Used past ARROW_ASSIGN_FROM where the coarse
    literal table (k×dim doubles of SQL text) and the interpreted
    per-row fold both stop being affordable. The rows here are the
    EXPLODED QUERY side (n_q × nprobe, broadcast-bounded), never the
    corpus."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    kc = cents.shape[0]
    m = len(codebooks)
    dsub = dim // m
    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @pandas_udf("array<array<double>>")
    def _luts(v: pd.Series, c: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        cls = c.to_numpy()
        out: list = [None] * len(vals)
        good = [
            i for i, (e, ci) in enumerate(zip(vals, cls))
            if e is not None and len(e) == dim
            # NaN-safe for the same reason as _residual_vs_centroid_col
            and not pd.isna(ci) and 0 <= int(ci) < kc
        ]
        if good:
            x = np.stack([np.asarray(vals[i], dtype=np.float64) for i in good])
            idx = np.asarray([int(cls[i]) for i in good], dtype=np.int64)
            res = x - cents[idx]
            # (m, batch, k_sub): ||book_c - res_sub||² per subspace
            per_sub = []
            for j in range(m):
                r = res[:, j * dsub : (j + 1) * dsub]  # (batch, dsub)
                d = r[:, None, :] - books[j][None, :, :]  # (batch, k, dsub)
                per_sub.append((d * d).sum(axis=2))
            for t, i in enumerate(good):
                out[i] = [per_sub[j][t].tolist() for j in range(m)]
        return pd.Series(out)

    return _luts


def _ivfpq_encode(
    feats: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    dim: int,
    carry_cols: list[str] | None = None,
    arrow_from: int = ARROW_ASSIGN_FROM,
) -> DataFrame:
    """Cluster assign + residual + m subspace codes as ONE projection —
    the encode pass shared by fit (full table) and upsert (delta only).
    Below ``arrow_from`` centroids/subspace-centers it is the proven
    whole-stage-codegen expression over literal centroid tables; at or
    above, a single Arrow-batched pandas_udf (_fused_encode_col) does
    the same math as numpy matmuls — the interpreted HOF fold costs ~7M
    element-ops/core-s, which at an auto-sized k≈4000 would be ~40
    core-minutes per 2M-row encode (measured r12; fitting.py rationale).
    Expects a ``_vec`` array<double> column next to ``id_col``;
    ``carry_cols`` pass through into the code layout (filter attributes
    for filtered search)."""
    m = len(codebooks)
    dsub = dim // m
    carry = [F.col(c) for c in (carry_cols or [])]
    if max(len(centroids), len(codebooks[0])) >= arrow_from:
        enc = _fused_encode_col(centroids, codebooks, dim)
        return feats.select(
            F.col(id_col), enc(F.col("_vec")).alias("_enc"), *carry
        ).select(
            F.col(id_col),
            F.col("_enc.cluster").alias("cluster"),
            F.col("_enc.codes").alias("codes"),
            *carry,
        )
    out = feats.withColumn(
        "cluster", nearest_centroid_expr("_vec", centroids)
    ).withColumn(
        "_res",
        F.expr(
            f"zip_with(_vec, element_at({centroids_literal_sql(centroids)}, "
            f"cluster + 1), (a, b) -> a - b)"
        ),
    )
    codes = F.expr(
        "array("
        + ",".join(
            nearest_centroid_sql(f"slice(_res, {j * dsub + 1}, {dsub})", codebooks[j])
            for j in range(m)
        )
        + ")"
    )
    return out.select(id_col, "cluster", codes.alias("codes"), *carry)


from custom_vector_database_spark.operators.calibrate import (
    AutoNprobeMixin,
)
from custom_vector_database_spark.operators.tombstones import (
    TombstoneDeleteMixin,
)


class IvfPqIndex(TombstoneDeleteMixin, AutoNprobeMixin):
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
        metric: str = "l2_sq",
        max_norm: float | None = None,
        carry_cols: list[str] | None = None,
        model_id: str | None = None,
    ):
        if metric not in ("l2_sq", "cosine", "dot"):
            raise ValueError(
                f"unknown metric {metric!r}; expected 'l2_sq', 'cosine' or 'dot'"
            )
        self.centroids = centroids
        self.codebooks = codebooks
        self._encoded = encoded
        self.id_col = id_col
        self.dim = dim  # the ENCODED dim (raw + 1 on a dot index)
        self.metric = metric
        self.max_norm = max_norm  # the MIPS M-sphere radius (dot only)
        self.carry_cols = list(carry_cols or [])  # filter attributes stored
        # IN the code layout so filtered searches read them off the scan
        self.m = len(codebooks)
        self.k = len(codebooks[0])
        self.model_id = model_id  # embedding-model pin (layout.check_model_id)
        self.calibration: dict | None = None  # nprobe pin (operators/calibrate)
        self._path: str | None = None  # set by save()/load(); upsert needs it

    def _check_model(self, supplied: str | None) -> None:
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
        )

        check_model_id(self.model_id, supplied, "this IVF-PQ layout")

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        n_clusters: int | str = 16,
        m: int = 8,
        k: int = 16,
        seed: int = 42,
        max_iter: int = 10,
        fit_sample: int = 100_000,
        metric: str = "l2_sq",
        carry_cols: list[str] | None = None,
        model_id: str | None = None,
        target_rows_per_cluster: int = 512,
    ) -> "IvfPqIndex":
        """``metric="cosine"`` is normalize-at-build (the IvfIndex
        pattern): vectors unit-normalize INSIDE the same cast projection,
        queries normalize at search time, and reported ``cos_dist`` =
        ADC-L2²/2 (≡ 1 − cosine on unit vectors); reranks re-score with
        TRUE cosine distance against the raw base table.

        ``metric="dot"`` is the augmented-dimension MIPS→NN reduction
        (the IvfIndex pattern, operators/ivf.py module docstring): store
        [x, √(M²−‖x‖²)], search with [q, 0]; ascending augmented ADC-L2
        is descending inner product, and reported ``score`` = ⟨x,q⟩ is
        recovered arithmetically. The caller's m must divide dim+1 (the
        encoded dim); reranks re-score with TRUE inner products.

        ``n_clusters="auto"`` sizes the COARSE quantizer from the corpus
        row count (fitting.auto_n_clusters over
        ``target_rows_per_cluster``; the IvfIndex.fit rationale) — the
        subspace codebooks (m, k) are dimension knobs and stay
        explicit."""
        if metric not in ("l2_sq", "cosine", "dot"):
            raise ValueError(
                f"unknown metric {metric!r}; expected 'l2_sq', 'cosine' or 'dot'"
            )
        from custom_vector_database_spark.operators.ivf import (
            _augment_expr,
            _norm2_sql,
            _unit_normalize_expr,
        )

        # ONE stats pass serves the row count, the NULL/dim guard (a NULL
        # or wrong-length vector would encode to NULL codes under a NULL
        # cluster partition no probe ever scans — the silent loss
        # _check_input_dims catches on the delta path, previously missing
        # at build), and — dot only — the MIPS M-sphere radius.
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(vec_col).isNull().cast("long")).alias("n_null"),
            F.min(F.size(F.col(vec_col))).alias("dmin"),
            F.max(F.size(F.col(vec_col))).alias("dmax"),
        ]
        if metric == "dot":
            aggs.append(
                F.max(F.expr(f"sqrt({_norm2_sql(f'`{vec_col}`')})")).alias("mx")
            )
        stats = df.agg(*aggs).first()
        n = int(stats["n"])
        if n == 0:
            raise ValueError("cannot fit IVF-PQ on an empty table")
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

        max_norm = None
        if metric == "cosine":
            src = _unit_normalize_expr(f"`{vec_col}`")
        elif metric == "dot":
            max_norm = float(stats["mx"])
            src = _augment_expr(f"`{vec_col}`", max_norm * max_norm)
            dim += 1  # the encoded space carries the augmented coordinate
        else:
            src = F.col(vec_col)
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m

        carry_cols = list(carry_cols or [])
        bad = {id_col, vec_col, "cluster", "codes"} & set(carry_cols)
        if bad:
            raise ValueError(f"carry_cols collide with index columns: {bad}")
        feats = df.select(
            F.col(id_col),
            src.cast("array<double>").alias("_vec"),
            *[F.col(c) for c in carry_cols],
        )
        # n came from the stats pass above (select() preserves row count)
        # ONE sampling pass feeds both the coarse quantizer and (via
        # numpy-side assignment + residuals) all m subspace codebooks
        x = collect_sample_matrix(feats, "_vec", n, fit_sample, seed)
        centroids = kmeans_fit_np(x, n_clusters, seed, max_iter)
        cents = np.asarray(centroids, dtype=np.float64)
        # chunked assign: the full (sample × k) float64 distance block
        # is 3.1 GB at the auto-k maximum (fitting.assign_nearest_np)
        from custom_vector_database_spark.operators.fitting import (
            assign_nearest_np,
        )

        res_x = x - cents[assign_nearest_np(x, cents)]
        codebooks = [
            kmeans_fit_np(
                res_x[:, j * dsub : (j + 1) * dsub], k, seed + 1 + j, max_iter
            )
            for j in range(m)
        ]

        # full-table pass: _ivfpq_encode — one codegen'd projection
        encoded = _ivfpq_encode(
            feats, centroids, codebooks, id_col, dim, carry_cols=carry_cols
        ).localCheckpoint(eager=True)  # eager measured faster than lazy
        # here (the A/B note in IvfIndex.fit)
        return cls(
            centroids, codebooks, encoded, id_col, dim, metric=metric,
            max_norm=max_norm, carry_cols=carry_cols, model_id=model_id,
        )

    def _raw_layout(self) -> DataFrame:
        return self._encoded

    def encoded_df(self) -> DataFrame:
        """The LIVE code view: the saved layout minus tombstoned rows."""
        return self._live(self._encoded)

    def save(self, path: str) -> None:
        """Codes Parquet-partitioned BY CLUSTER — a probe of nprobe
        clusters is a partition-pruned scan of nprobe/n_clusters of the
        (already 16-32× compressed) index. A save is a full rewrite:
        tombstoned rows are physically dropped, so no sidecar follows."""
        os.makedirs(path, exist_ok=True)
        meta = {
            "id_col": self.id_col,
            "dim": self.dim,
            "metric": self.metric,
            "max_norm": self.max_norm,
            "carry_cols": self.carry_cols,
            "model_id": self.model_id,
            "centroids": self.centroids,
            "codebooks": self.codebooks,
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
        from custom_vector_database_spark.operators.layout import (
            clear_tombstones,
        )

        clear_tombstones(path)  # any stale sidecar at the target is obsolete
        if self._tombstones is not None:
            # re-point the handle at what was just written BEFORE dropping
            # the tombstone view (same hazard and same conditional as
            # IvfIndex.save: a clean save keeps the path-independent
            # in-memory frame so the written dir stays movable)
            self._encoded = self._encoded.sparkSession.read.parquet(
                os.path.join(path, "codes")
            )
            self._tombstones = None
        self._path = path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfPqIndex":
        from custom_vector_database_spark.operators.layout import (
            recover_partitioned_swap,
        )

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        # heal a crash mid-compact swap before touching the layout
        recover_partitioned_swap(os.path.join(path, "codes"))
        encoded = spark.read.parquet(os.path.join(path, "codes"))
        idx = cls(
            meta["centroids"], meta["codebooks"], encoded, meta["id_col"],
            meta["dim"], metric=meta.get("metric", "l2_sq"),
            max_norm=meta.get("max_norm"),
            carry_cols=meta.get("carry_cols"),
            model_id=meta.get("model_id"),  # absent = legacy, loads unpinned
        )
        idx.calibration = meta.get("calibration")  # nprobe pin, if earned
        idx._path = path
        idx._load_tombstones(spark)
        return idx

    def upsert(self, delta: DataFrame, vec_col: str = "vec",
               model_id: str | None = None) -> int:
        """Append a delta batch to the SAVED code layout, encoding ONLY the
        new rows with the saved centroids AND codebooks (_ivfpq_encode —
        the same single projection as fit's full-table pass, over the
        delta alone). The quantizers are NOT refit; codebook refresh stays
        the explicit rebuild verb, mirroring IvfIndex.upsert. Existing
        part files are never touched — Parquet append only adds files
        under the delta's cluster directories. Returns rows appended; the
        in-memory code view is refreshed to include them."""
        if self._path is None:
            raise ValueError(
                "upsert requires a saved index (call save() or load() first)"
            )
        self._check_model(model_id)
        self._check_input_dims(delta, vec_col, "delta")
        src = self._metric_src_expr(vec_col)
        feats = delta.select(
            F.col(self.id_col),
            src.cast("array<double>").alias("_vec"),
            *[F.col(c) for c in self.carry_cols],
        )
        encoded = _ivfpq_encode(
            feats, self.centroids, self.codebooks, self.id_col, self.dim,
            carry_cols=self.carry_cols,
        ).localCheckpoint(eager=False)  # one encode pass feeds count
        # AND write (lazy: the full-scan count materializes it)
        n = encoded.count()
        self._refuse_tombstoned_delta(encoded.select(self.id_col))
        codes_path = os.path.join(self._path, "codes")
        encoded.write.mode("append").partitionBy("cluster").parquet(codes_path)
        self._encoded = delta.sparkSession.read.parquet(codes_path)
        return int(n)

    def _metric_src_expr(self, vec_col: str):
        """The metric-specific raw->stored vector transform (cosine
        normalize-at-build / dot sphere-augment / l2 identity) — ONE
        definition shared by upsert's delta encode and the staleness
        report, so the report measures exactly what an upsert would
        commit."""
        if self.metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _unit_normalize_expr,
            )

            return _unit_normalize_expr(f"`{vec_col}`")
        if self.metric == "dot":
            # saved M; over-M delta rows clamp to the sphere (ivf.upsert
            # contract — a rebuild refreshes M)
            from custom_vector_database_spark.operators.ivf import (
                _augment_expr,
            )

            m2 = float(self.max_norm) * float(self.max_norm)
            return _augment_expr(f"`{vec_col}`", m2)
        return F.col(vec_col)

    def _staleness_feats(self, df: DataFrame, vec_col: str) -> DataFrame:
        """(_vec, cluster, _res) for the staleness report — the encode
        pass's own cluster assignment + residual, current quantizers."""
        self._check_input_dims(df, vec_col, "report input")
        # _check_input_dims covers NULL/size (incl. the dot-metric
        # caller dim); NULL COMPONENTS additionally poison the error
        # aggregate (review finding r9)
        _refuse_report_vectors(df, vec_col, None)
        feats = df.select(
            self._metric_src_expr(vec_col).cast("array<double>").alias("_vec")
        )
        if len(self.centroids) >= ARROW_ASSIGN_FROM:
            # auto-sized big-k layouts: assign + residual through the
            # Arrow path (the fold/literal-parse rationale at
            # _ivfpq_encode; the report must price a rebuild, not cost
            # one)
            from custom_vector_database_spark.operators.fitting import (
                nearest_centroid_col,
            )

            res = _residual_vs_centroid_col(self.centroids)
            return feats.withColumn(
                "cluster", nearest_centroid_col("_vec", self.centroids)
            ).withColumn("_res", res(F.col("_vec"), F.col("cluster")))
        return feats.withColumn(
            "cluster", nearest_centroid_expr("_vec", self.centroids)
        ).withColumn(
            "_res",
            F.expr(
                f"zip_with(_vec, element_at("
                f"{centroids_literal_sql(self.centroids)}, cluster + 1), "
                f"(a, b) -> a - b)"
            ),
        )

    def _staleness_error_expr(self) -> Column:
        return _pq_error_expr("_res", self.codebooks, self.dim)

    def compact(self, files_per_cluster: int = 1) -> dict:
        """Compact the saved code layout (layout.compact_partitioned) —
        upsert appends fragment the cluster partitions exactly as on the
        full-precision index, and the codes being 32× smaller makes the
        per-file fixed costs proportionally WORSE. Same contract as
        IvfIndex.compact. Returns {files_before, files_after, n_rows}."""
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
        """Operational snapshot: config + code-layout health (the
        IvfIndex.describe contract on the compressed layout; bytes per
        row ≈ m, vs 4·dim full-precision — the compression the layout
        exists to buy)."""
        counts = {
            r["cluster"]: r["n"]
            for r in self.encoded_df().groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_rows = sum(counts.values())
        mean = n_rows / max(len(counts), 1)
        out = {
            "kind": "ivfpq",
            "metric": self.metric,
            "n_rows": int(n_rows),
            "n_clusters": len(self.centroids),
            # caller-facing dim (what search/upsert vectors must have) —
            # one less than the stored/encoded dim on a dot index, the
            # same contract as IvfIndex.describe
            "dim": self.dim - 1 if self.metric == "dot" else self.dim,
            "stored_dim": self.dim,
            "m": self.m,
            "k": self.k,
            "carry_cols": list(self.carry_cols),
            "nonempty_clusters": len(counts),
            "max_cluster_rows": max(counts.values(), default=0),
            "cluster_skew": round(max(counts.values(), default=0) / mean, 3)
            if n_rows
            else 0.0,
            "compression_x": round(4.0 * self.dim / self.m, 1),
            "n_tombstones": self._tombstone_count(),
            "saved": self._path is not None,
        }
        if self._path is not None:
            codes_path = os.path.join(self._path, "codes")
            out["n_files"] = sum(
                1
                for dp, _, fs in os.walk(codes_path)
                for f in fs
                if f.endswith(".parquet")
            )
        return out

    def _check_input_dims(self, df: DataFrame, vec_col: str, what: str) -> int:
        """Hard-error on wrong-length vectors BEFORE encoding/probing —
        zip_with against the centroids pads mismatches with NULL, filing
        rows under a NULL cluster partition no probe ever scans (silent
        loss), or ranking a bad query by NULL distances. One cheap count
        over the (small) input side."""
        # NULL-safe: size(NULL) is NULL under ANSI mode, so `size != dim`
        # would wave NULL vectors straight through this guard. Callers
        # supply RAW vectors — one less than the encoded dim on a dot
        # index (the augmented coordinate is added internally). ONE
        # aggregate also returns the row count, so the batch guards
        # don't pay a second scan.
        want = self.dim - 1 if self.metric == "dot" else self.dim
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
                f"dim {want}"
            )
        return int(stats["n"])

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
        dist_col: str | None = None,
        model_id: str | None = None,
    ) -> DataFrame:
        from custom_vector_database_spark.operators.layout import (
            in_literals,
        )

        self._check_model(model_id)
        nprobe = self._resolve_nprobe(nprobe)
        want = self.dim - 1 if self.metric == "dot" else self.dim
        if len(query) != want:
            raise ValueError(f"query dim {len(query)} != index dim {want}")
        qn2 = 0.0
        if self.metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _normalize_query,
            )

            query = _normalize_query(query)
            dist_col = dist_col or "cos_dist"
        elif self.metric == "dot":
            import math as _math

            query = [float(x) for x in query]
            qn2 = _math.fsum(x * x for x in query)
            query = query + [0.0]  # zero-augmented (MIPS -> NN reduction)
            dist_col = dist_col or "score"
        else:
            dist_col = dist_col or "dist_sq"
        query = [float(x) for x in query]
        probe = self._probe(query, nprobe)
        dsub = self.dim // self.m

        # per-cluster ADC: LUT built from the query residual vs that
        # cluster's centroid; dispatch on the row's cluster id with one
        # SQL CASE (nprobe × m element_at terms, single expr round-trip)
        branches = []
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
                    f"element_at({array_literal_sql(lut)}, "
                    f"element_at(codes, {j + 1}) + 1)"
                )
            branches.append(f"WHEN {cid} THEN {' + '.join(terms)}")
        adc = F.expr(
            "CASE cluster "
            + " ".join(branches)
            + " ELSE CAST(NULL AS DOUBLE) END"
        )

        nearest_first = True
        if self.metric == "cosine":
            adc = adc / 2.0  # ADC-L2²/2 ≡ 1 − cosine on unit vectors
        elif self.metric == "dot":
            # ‖x'−q'‖² ≈ M² + ‖q‖² − 2⟨x,q⟩ ⇒ score recovered from the
            # ADC distance; ascending ADC IS descending score
            m2 = float(self.max_norm) * float(self.max_norm)
            adc = (F.lit(m2 + qn2) - adc) / 2.0
            nearest_first = False
        order = (
            F.col(dist_col).asc_nulls_last()
            if nearest_first
            else F.col(dist_col).desc_nulls_last()
        )
        cand = (
            self._live(self._encoded.filter(F.col("cluster").isin(probe)))
            .select(self.id_col, adc.alias(dist_col))
            .orderBy(order, F.col(self.id_col).asc())
            .limit(k * rerank if rerank > 0 else k)
        )
        if rerank <= 0:
            return cand
        if base_df is None:
            raise ValueError("rerank requires the full-precision base_df")
        ids = [r[self.id_col] for r in cand.select(self.id_col).collect()]
        if self.metric == "dot":
            # TRUE inner products over the RAW base vectors (drop the
            # augmented zero; knn's dot metric ranks by −⟨x,q⟩ ascending)
            hits = knn_ops.knn(
                base_df.filter(in_literals(self.id_col, ids)), query[:-1], k,
                id_col=self.id_col, vec_col=vec_col, dist_col="_nd",
                metric="dot", round_to=None,
            )
            return hits.select(
                self.id_col, F.round(-F.col("_nd"), 6).alias(dist_col)
            )
        # cosine/L2 reranks re-score with the TRUE metric over the RAW
        # base vectors (the normalized query keeps cosine exact)
        return knn_ops.knn(
            base_df.filter(in_literals(self.id_col, ids)), query, k,
            id_col=self.id_col, vec_col=vec_col, dist_col=dist_col,
            metric=self.metric,
        )

    def search_many(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 4,
        query_id: str = "qid",
        query_vec: str = "qvec",
        base_df: DataFrame | None = None,
        base_vec: str = "vec",
        rerank: int = 0,
        dist_col: str | None = None,
        max_query_rows: int | None = 100_000,
        filter_map: dict[str, str] | None = None,
        max_broadcast_bytes: int | None = 256 << 20,
        model_id: str | None = None,
    ) -> DataFrame:
        """Batch ADC search: the k approximate nearest rows for EVERY row
        of a query table, answered from the compressed cluster-partitioned
        code layout in ONE job — ivf.search_many's shape on 32× fewer
        bytes, the retrieval plan for corpora whose vectors don't fit the
        I/O budget.

        The single-query path builds its LUTs driver-side as literals;
        that cannot scale to a query TABLE. Here each (query, probed
        cluster) pair computes its own m LUT arrays as ONE codegen
        projection on the (tiny, exploded) query side — residual vs that
        cluster's centroid, then per-subspace distances to every codebook
        center: nprobe × m × k doubles per query riding the broadcast.
        The probed code partitions then pay exactly m element_at lookups
        + adds per (row, query) — true ADC, amortized identically to the
        driver-side LUT, but per-query and fully distributed.

        With ``rerank`` > 0 the ADC top ``k*rerank`` per query are joined
        back to ``base_df`` for exact re-scoring — fully distributed (an
        id-equi-join of the bounded candidate set, never a driver-side id
        collect, unlike the single-query convenience path). Returns
        (query_id, id_col, dist_col) best-first per query, id tie-break.
        """
        from pyspark.sql import Window

        self._check_model(model_id)
        nprobe = self._resolve_nprobe(nprobe)
        for qc in (query_id, query_vec):
            if qc in self._encoded.columns:
                raise ValueError(
                    f"query column {qc!r} collides with a layout column — "
                    "alias it on the query side first"
                )
        filter_map = dict(filter_map or {})
        for dcol, qcol in filter_map.items():
            if dcol not in self._encoded.columns:
                raise ValueError(
                    f"filter column {dcol!r} is not in the saved layout — "
                    f"build the index with fit(carry_cols=[{dcol!r}])"
                )
            if qcol in self._encoded.columns:
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
            # the broadcast ships n_q × nprobe exploded rows, each carrying
            # its per-(query, cluster) LUTs: m arrays × k doubles — the
            # dominant term (1 KiB/row at m=8, k=16), invisible to a
            # row-count guard (the round-6 sf1 probe's lesson: at the
            # 100k-row guard this side would be ~1 GiB)
            per_row = self.m * self.k * 8 + 48
            # the explode caps at the cluster count - an exhaustive
            # nprobe >= n_clusters must not be refused for rows the
            # broadcast will never carry
            est = n_q * min(nprobe, len(self.centroids)) * per_row
            if est > max_broadcast_bytes:
                raise ValueError(
                    f"estimated broadcast {est >> 20} MiB (= {n_q} queries × "
                    f"{min(nprobe, len(self.centroids))} probes × ~{per_row} B of LUTs/row) > "
                    f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB; "
                    "split the query table or lower nprobe"
                )
        dist_col = dist_col or {
            "cosine": "cos_dist", "dot": "score"
        }.get(self.metric, "dist_sq")
        if self.metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _unit_normalize_expr,
            )

            queries = queries.withColumn(
                query_vec, _unit_normalize_expr(f"`{query_vec}`")
            )
        elif self.metric == "dot":
            # zero-augment + per-query ‖q‖² (rides the tiny query side);
            # raw queries are preserved for the exact-inner-product rerank
            from custom_vector_database_spark.operators.ivf import _norm2_sql

            raw_queries = queries
            queries = queries.select(
                F.col(query_id),
                F.expr(
                    f"CAST(concat(`{query_vec}`, array(CAST(0.0 AS FLOAT))) "
                    f"AS ARRAY<FLOAT>)"
                ).alias(query_vec),
                F.expr(_norm2_sql(f"`{query_vec}`")).alias("_qn2"),
                *qfilter_cols,
            )
        dsub = self.dim // self.m
        qv_d = f"CAST(`{query_vec}` AS ARRAY<DOUBLE>)"
        extra_q = [F.col("_qn2")] if self.metric == "dot" else []
        extra_q += qfilter_cols
        if max(len(self.centroids), self.k) >= ARROW_ASSIGN_FROM:
            # auto-sized big-k layouts: the probe shortlist rides the
            # Arrow matmul (fitting.nprobe_clusters_col) and the
            # per-(query, cluster) LUTs come from one Arrow UDF — the
            # coarse-centroid SQL literal alone is megabytes of text at
            # k≈4000 and the per-row fold is interpreted (~7M
            # element-ops/core-s). Query side only; the probed CODE
            # partitions still pay exactly m codegen element_at + adds
            # per (row, query), unchanged.
            probes = nprobe_clusters_col(qv_d, self.centroids, nprobe)
            luts_col = _query_luts_col(self.centroids, self.codebooks, self.dim)
            exploded = (
                queries.select(
                    F.col(query_id),
                    F.col(query_vec),
                    *extra_q,
                    F.explode(probes).alias("cluster"),
                )
                .select(
                    F.col(query_id),
                    F.col(query_vec),
                    *extra_q,
                    F.col("cluster"),
                    luts_col(F.expr(qv_d), F.col("cluster")).alias("_luts"),
                )
                .localCheckpoint(eager=False)  # computed once: feeds
                # the probed-cluster listing AND the join below (lazy:
                # the listing's collect materializes it)
            )
        else:
            probes = F.expr(nprobe_clusters_sql(qv_d, self.centroids, nprobe))
            res_sql = (
                f"zip_with({qv_d}, element_at("
                f"{centroids_literal_sql(self.centroids)}, cluster + 1), "
                f"(a, b) -> a - b)"
            )
            luts = ",".join(
                f"transform({centroids_literal_sql(self.codebooks[j])}, c -> "
                f"aggregate(zip_with(c, slice(_res, {j * dsub + 1}, {dsub}), "
                f"(a, b) -> (a - b) * (a - b)), 0.0D, (s, d) -> s + d))"
                for j in range(self.m)
            )
            exploded = (
                queries.select(
                    F.col(query_id),
                    F.col(query_vec),
                    *extra_q,
                    F.explode(probes).alias("cluster"),
                )
                .withColumn("_res", F.expr(res_sql))
                .select(
                    F.col(query_id),
                    F.col(query_vec),
                    *extra_q,
                    F.col("cluster"),
                    F.expr(f"array({luts})").alias("_luts"),
                )
                .localCheckpoint(eager=False)  # computed once: feeds
                # the probed-cluster listing AND the join below (lazy:
                # the listing's collect materializes it)
            )
        probed = sorted(
            r["cluster"] for r in exploded.select("cluster").distinct().collect()
        )
        adc = " + ".join(
            f"element_at(element_at(_luts, {j + 1}), "
            f"element_at(codes, {j + 1}) + 1)"
            for j in range(self.m)
        )
        nearest_first = True
        dist_expr = F.expr(adc)
        if self.metric == "cosine":
            dist_expr = dist_expr / 2.0  # ADC-L2²/2 ≡ 1 − cosine on unit
        elif self.metric == "dot":
            # score ⟨x,q⟩ recovered from the ADC distance; per-query ‖q‖²
            # rides the broadcast side
            m2 = float(self.max_norm) * float(self.max_norm)
            dist_expr = (F.lit(m2) + F.col("_qn2") - dist_expr) / 2.0
            nearest_first = False
        joined = self._live(
            self._encoded.filter(F.col("cluster").isin(probed))
        ).join(F.broadcast(exploded.drop(query_vec)), "cluster")
        for dcol, qcol in filter_map.items():
            joined = joined.filter(F.col(dcol) == F.col(qcol))
        scored = joined.select(
            F.col(query_id), F.col(self.id_col), dist_expr.alias(dist_col)
        )
        order = (
            F.col(dist_col).asc_nulls_last()
            if nearest_first
            else F.col(dist_col).desc_nulls_last()
        )
        w = Window.partitionBy(query_id).orderBy(order, F.col(self.id_col).asc())
        n_cand = k * rerank if rerank > 0 else k
        cand = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_cand)
            .drop("_rn")
        )
        if rerank <= 0:
            return cand
        if base_df is None:
            raise ValueError("rerank requires the full-precision base_df")
        if self.metric == "cosine":
            # TRUE cosine distance vs the raw base vectors (query side is
            # already unit-normalized, so 1 − dot/‖x‖ is exact)
            from custom_vector_database_spark.functions.vector import (
                cosine_similarity,
            )

            exact_dist = F.lit(1.0) - cosine_similarity(
                F.col(base_vec), F.col(query_vec)
            )
        elif self.metric == "dot":
            # TRUE inner products vs the raw base vectors and RAW queries
            from custom_vector_database_spark.functions.vector import (
                dot_product,
            )

            queries = raw_queries
            exact_dist = dot_product(F.col(base_vec), F.col(query_vec))
        else:
            exact_dist = knn_ops.l2_squared(F.col(base_vec), F.col(query_vec))
        exact = (
            cand.select(query_id, self.id_col)
            .join(base_df.select(self.id_col, base_vec), self.id_col)
            .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
            .select(
                F.col(query_id),
                F.col(self.id_col),
                F.round(exact_dist, 6).alias(dist_col),
            )
        )
        return (
            exact.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )


# ---------------------------------------------------------------------------
# Codebook staleness (round 9): the when-to-rebuild metric for saved
# quantized layouts. Upserted deltas encode with the BUILD-time centroids
# and codebooks (the explicit-rebuild contract, reference main.cpp:34);
# as the data distribution drifts away from the training sample, those
# rows' quantization error grows and ADC distances degrade silently.
# This report prices the rebuild: reconstruction error of a recent slice
# vs the build-time distribution, as exact micro-integer sums (the
# embedding_drift convention — BIGINT-exact, order-free).
# ---------------------------------------------------------------------------
def _refuse_report_vectors(
    df: DataFrame, vec_col: str, dim: int | None
) -> None:
    """Refuse staleness-report inputs whose reconstruction error would
    evaluate to NULL — NULL vectors, wrong-dim vectors (``dim`` given),
    or vectors with NULL COMPONENTS: F.sum silently skips NULL errors
    while F.count still counts the row, understating the mean with no
    error (review finding r9 — the same hole the streaming sidecar's
    _refuse_bad_vectors closes)."""
    vec = F.col(vec_col)
    bad = vec.isNull() | F.exists(vec, lambda x: x.isNull())
    if dim is not None:
        bad = bad | (F.size(vec) != dim)
    if df.filter(bad).limit(1).count():
        raise ValueError(
            f"report input has NULL, wrong-dimension, or NULL-component "
            f"{vec_col!r} — a NULL reconstruction error would silently "
            "dilute the staleness mean; filter or impute upstream"
        )


def _min_sq_dist_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """SQL for the squared L2 distance from ``vec_sql`` to its NEAREST
    centroid — array_min over the literal distance table; exactly the
    error the encode pass commits to when it picks that centroid."""
    from custom_vector_database_spark.operators.fitting import (
        squared_distances_sql,
    )

    return f"array_min({squared_distances_sql(vec_sql, centroids)})"


def _pq_error_expr(
    res_sql: str, codebooks: list[list[list[float]]], dim: int
) -> Column:
    """Total PQ reconstruction error of a residual: Σ_j min_c ||res_j −
    c||² — the per-subspace nearest-centroid distances the saved codes
    commit to, summed. One codegen expression over literal codebooks."""
    m = len(codebooks)
    dsub = dim // m
    terms = [
        _min_sq_dist_sql(f"slice({res_sql}, {j * dsub + 1}, {dsub})",
                         codebooks[j])
        for j in range(m)
    ]
    return F.expr(" + ".join(terms))


def quantization_error_report(
    idx,
    build_df: DataFrame,
    recent_df: DataFrame,
    vec_col: str = "vec",
    ratio_threshold: float = 2.0,
    model_id: str | None = None,
) -> DataFrame:
    """One-row staleness report for ANY fitted layout implementing the
    two-method protocol (_staleness_feats + _staleness_error_expr):
    PqIndex / IvfPqIndex (residual quantization error), IvfIndex /
    IvfBqIndex (coarse-centroid distortion), MaxSimIndex (token-IVF
    unit-space distortion). Per-row reconstruction error of
    ``recent_df`` (rows upserted after
    build) vs ``build_df`` (the build-time corpus or a sample of it),
    both encoded with the CURRENT saved quantizers in one codegen
    projection each — no codes are read; the report measures what the
    encode pass would commit to today.

    Columns: (n_build, n_recent, build_err_micro_sum,
    recent_err_micro_sum, mean_build_err_micro, mean_recent_err_micro,
    err_ratio, stale). Sums are exact BIGINTs of floor(1e6·err) —
    order-free, engine-exact; err_ratio = round(recent_mean/build_mean,
    6); stale = err_ratio > ratio_threshold (the rebuild signal: recent
    rows quantize ratio× worse than the data the codebooks were fit
    on). Empty recent_df reports ratio 0.0, never stale.

    Threshold calibration: PQ/IVF-PQ residual distortion swings hard
    under drift (defaults fine); COARSE quantizers on the unit sphere
    (cosine IvfIndex, MaxSimIndex's token IVF) have high, saturating
    baseline distortion — a few dozen centroids leave every unit
    vector roughly equidistant, so even a large directional drift
    moves the ratio only ~1.2-1.4×. Threshold those layouts lower
    (~1.15-1.25), ideally against a recorded fresh-slice baseline.

    Scale shape: two narrow projections + two scalar aggregates;
    nothing driver-side, no join — each side is one pass over its own
    vectors."""

    # staleness inputs are embedding-keyed too: comparing a NEW model's
    # vectors against codebooks fit on an OLD model's would report a huge
    # (but meaningless) ratio — or worse, a plausible one. Same opt-in
    # refusal as upsert/search (layout.check_model_id).
    from custom_vector_database_spark.operators.layout import check_model_id

    check_model_id(
        getattr(idx, "model_id", None), model_id,
        f"this {type(idx).__name__} layout",
    )

    # an empty baseline is undecidable, not "perfectly quantizing": the
    # ratio would compare against the 1-micro floor and spuriously trip
    # stale on ANY recent slice (review finding r9) — refuse loudly
    if build_df.limit(1).count() == 0:
        raise ValueError(
            "empty build_df baseline: the staleness ratio needs the "
            "build-time error distribution to compare against — pass "
            "the build corpus (or a sample of it)"
        )

    def errs(df: DataFrame) -> DataFrame:
        feats = idx._staleness_feats(df, vec_col)
        err = idx._staleness_error_expr()
        return feats.select(
            F.floor(err * F.lit(1e6)).cast("long").alias("err_micro")
        )

    b = errs(build_df).agg(
        F.count(F.lit(1)).alias("n_build"),
        F.coalesce(F.sum("err_micro"), F.lit(0)).alias("build_err_micro_sum"),
    )
    r = errs(recent_df).agg(
        F.count(F.lit(1)).alias("n_recent"),
        F.coalesce(F.sum("err_micro"), F.lit(0)).alias("recent_err_micro_sum"),
    )
    out = b.crossJoin(r)
    mean_b = F.when(
        F.col("n_build") > 0,
        F.floor(F.col("build_err_micro_sum") / F.col("n_build")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    mean_r = F.when(
        F.col("n_recent") > 0,
        F.floor(F.col("recent_err_micro_sum") / F.col("n_recent")).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))
    out = out.select(
        "n_build",
        "n_recent",
        "build_err_micro_sum",
        "recent_err_micro_sum",
        mean_b.alias("mean_build_err_micro"),
        mean_r.alias("mean_recent_err_micro"),
    )
    # the denominator floors at 1 micro, NOT at "build mean must be
    # positive": a perfectly-quantizing build corpus (every per-row err
    # floors to 0) with a drifted recent slice must report a HUGE ratio
    # and trip, not silently suppress the rebuild signal (review finding
    # r9 — only an EMPTY recent slice legitimately reports 0.0/fresh)
    ratio = F.when(
        F.col("n_recent") > 0,
        F.round(
            F.col("mean_recent_err_micro").cast("double")
            / F.greatest(
                F.col("mean_build_err_micro"), F.lit(1)
            ).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.select(
        "*",
        ratio.alias("err_ratio"),
        (ratio > F.lit(float(ratio_threshold))).alias("stale"),
    )
