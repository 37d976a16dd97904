"""Approximate nearest neighbor via MLlib LSH — the reference's HNSW role.

The reference builds an in-memory HNSW graph on every load
(/root/reference/src/vectordb.cpp:82-118, lib/hnsw/hnsw.h) — a single-node
pointer structure that cannot shard. The Spark-native replacement is
BucketedRandomProjectionLSH (euclidean family — same L2 metric the reference
wires at hnsw.h:41):

- rebuild  = fit the LSH model + materialize the hashed table (Parquet) —
  an embarrassingly parallel map, no shuffle;
- search   = hash the query, prune to matching buckets, exact-distance the
  survivors (MLlib's approxNearestNeighbors);
- table-vs-table similarity = approxSimilarityJoin, a bucket-co-partitioned
  join instead of the quadratic cross product — the 100 TB path.

Like the reference's graph (test.cpp:116-118), the persisted index is STALE
by design until the next explicit rebuild.

Accuracy contract (SURVEY §4.3): approximate results are tested by recall
against the exact k-NN operator, never by hash-equality with an oracle.
"""

from __future__ import annotations

import json
import os

from pyspark.ml.feature import BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel
from pyspark.ml.functions import array_to_vector
from pyspark.ml.linalg import Vectors
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["LshIndex", "approx_similarity_join"]


class LshIndex:
    """A fitted LSH model + materialized hashed table (the 'rebuilt index')."""

    def __init__(self, model: BucketedRandomProjectionLSHModel, hashed: DataFrame,
                 id_col: str, vec_col: str, model_id: str | None = None):
        self.model = model
        self._hashed = hashed
        self.id_col = id_col
        self.vec_col = vec_col
        self.model_id = model_id  # embedding-model pin (layout.check_model_id)
        self._path = None  # set by save/load; maintenance_plan's default

    # -- build (O6) --------------------------------------------------------
    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        num_hash_tables: int = 4,
        bucket_length: float | None = None,
        model_id: str | None = None,
    ) -> "LshIndex":
        feats = df.select(
            F.col(id_col), F.col(vec_col),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )
        if bucket_length is None:
            # Heuristic: the typical vector norm is the natural distance
            # scale; sampling keeps this O(1) regardless of table size.
            sample = feats.select(
                F.sqrt(
                    F.aggregate(
                        F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    )
                ).alias("norm")
            ).limit(1000)
            mean_norm = sample.agg(F.avg("norm")).first()[0] or 1.0
            bucket_length = max(float(mean_norm), 1e-6)
        lsh = BucketedRandomProjectionLSH(
            inputCol="features",
            outputCol="hashes",
            numHashTables=num_hash_tables,
            bucketLength=bucket_length,
            seed=42,
        )
        model = lsh.fit(feats)
        # The fitted-and-hashed table IS the rebuilt index (reference
        # semantics: rebuild materializes, vectordb.cpp:82-118). fit() is
        # an API boundary the DataFrame escapes through, so the snapshot
        # must be taken HERE (ADVICE r14: a lazy checkpoint would defer
        # the snapshot to the first search — source mutations between
        # build() and first use would silently leak into the index, and
        # build-time data errors would surface at query time).
        hashed = model.transform(feats).localCheckpoint(eager=True)
        return cls(model, hashed, id_col, vec_col, model_id=model_id)

    # -- persistence: the index is a real artifact, unlike the reference's
    # never-persisted graph (vectordb.h:51 indexFilePath is dead code) -------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.model.write().overwrite().save(os.path.join(path, "model"))
        self._hashed.drop("features", "hashes").write.mode("overwrite").parquet(
            os.path.join(path, "rows")
        )
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"id_col": self.id_col, "vec_col": self.vec_col,
                       "model_id": self.model_id}, f)
        self._path = path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LshIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        model = BucketedRandomProjectionLSHModel.load(os.path.join(path, "model"))
        rows = spark.read.parquet(os.path.join(path, "rows"))
        feats = rows.withColumn(
            "features", array_to_vector(F.col(meta["vec_col"]).cast("array<double>"))
        )
        hashed = model.transform(feats)
        idx = cls(model, hashed, meta["id_col"], meta["vec_col"],
                  model_id=meta.get("model_id"))  # absent = legacy, unpinned
        idx._path = path
        return idx

    def hashed_df(self) -> DataFrame:
        return self._hashed

    # -- staleness protocol (operators/pq.quantization_error_report) -------
    def _staleness_feats(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Staleness-report input: the raw vector as array<double>. The
        LSH layout joins the two-method protocol every other saved
        layout implements (r10 verdict: it was the ONE saved layout the
        autopilot could not price — ``bucketLength`` is data-derived
        and drifts exactly like a coarse quantizer)."""
        from custom_vector_database_spark.operators.pq import (
            _refuse_report_vectors,
        )

        rvs = self.model._call_java("randUnitVectors")
        _refuse_report_vectors(df, vec_col, len(rvs[0]))
        return df.select(F.col(vec_col).cast("array<double>").alias("_vec"))

    def _staleness_error_expr(self):
        """Per-row LSH drift error: mean over hash tables of the SQUARED
        BUCKET ID the row hashes to — floor(proj·w_t / bucketLength)²,
        exactly the bucket assignment approxNearestNeighbors prunes by.

        Why this is the right distortion: ``bucketLength`` is calibrated
        at fit time to the corpus's distance scale (LshIndex.fit sizes
        it to the mean vector norm), so in-distribution rows land in
        bucket ids of O(1) magnitude. A shifted or rescaled recent
        distribution pushes projections outward in bucket units —
        recent rows then occupy buckets far from the populated build
        range, candidate pruning returns thin-to-empty shortlists, and
        recall silently degrades; the squared-bucket-id mean grows
        quadratically with exactly that displacement. Pure Catalyst
        over literal projection vectors (one zip_with+aggregate dot per
        table), floor-exact integers after the floor — engine-exact
        like every other layout's error expression.

        Calibration note (the unit-sphere note's sibling): the build
        baseline is the mean squared bucket id of the build corpus
        (~O(1) by bucketLength calibration); an additive drift of +d on
        every component moves each projection by d·Σw_i, so ratio
        thresholds ~2 trip on shifts comparable to the vector norm.
        INWARD drift (a shrinking distribution) lowers the ratio below
        1 and never trips — that failure mode concentrates rows into
        fewer buckets (a probe-cost problem, not a recall hole) and is
        visible as bucket-occupancy skew instead."""
        bl = float(self.model.getBucketLength())
        rvs = self.model._call_java("randUnitVectors")
        terms = []
        for w in rvs:
            lit = (
                "array("
                + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in w)
                + ")"
            )
            dot = (
                f"aggregate(zip_with(_vec, {lit}, (a, b) -> a * b), "
                "0.0D, (s, x) -> s + x)"
            )
            terms.append(
                f"pow(floor({dot} / CAST({bl!r} AS DOUBLE)), 2.0D)"
            )
        return F.expr(f"({' + '.join(terms)}) / {len(terms)}.0D")

    # -- search (O7 approx) ---------------------------------------------------
    def search(self, query: list[float], k: int, dist_col: str = "dist_sq",
               model_id: str | None = None) -> DataFrame:
        """Bucket-pruned k-NN; returns (id, dist_sq) nearest-first —
        squared L2 to match the reference's API-level metric
        (vectordb.cpp:154; the CLI sqrt()s for display only)."""
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
        )

        check_model_id(self.model_id, model_id, "this LSH layout")
        res = self.model.approxNearestNeighbors(
            self._hashed, Vectors.dense([float(x) for x in query]), k, distCol="_dist"
        )
        return (
            res.select(
                F.col(self.id_col),
                F.round(F.col("_dist") * F.col("_dist"), 6).alias(dist_col),
            )
            .orderBy(F.col(dist_col).asc(), F.col(self.id_col).asc())
        )


def approx_similarity_join(
    index_a: LshIndex,
    index_b: LshIndex,
    threshold: float,
    dist_col: str = "dist",
) -> DataFrame:
    """Table-vs-table similarity join (ABSENT in the reference — it only has
    1-query-vs-table search, SURVEY §2.2). LSH buckets co-partition the two
    sides so the join never materializes the cross product.

    The two indexes' embedding-model pins must agree: joining vectors
    from two DECLARED-different models compares incompatible spaces, so
    every distance in the result would be silently wrong — the same
    refusal every single-index entry point makes (layout.check_model_id;
    r10 second-review finding: this was the one search surface outside
    the pin contract). Either side unpinned passes (the opt-in rule).

    ONE hash family governs the join: bucket ids are only comparable
    between frames hashed by the SAME fitted model (bucket_length is
    data-derived and the random projections are model-specific), so
    when the two indexes carry different model objects the right side's
    materialized hashes are DROPPED and approxSimilarityJoin re-hashes
    its features under the left model — two independently fitted
    indexes would otherwise equi-join bucket ids from different
    quantizations and silently miss nearly every true near pair (r10
    third-review finding)."""
    from custom_vector_database_spark.operators.layout import check_model_id

    check_model_id(
        index_a.model_id, index_b.model_id,
        "the left LSH layout of this similarity join",
    )
    b_df = index_b.hashed_df()
    # Same fitted family iff same object OR same MLlib uid — uids are
    # minted once per estimator construction and preserved by save/load,
    # so two handles loaded from the SAME saved index keep their
    # materialized hashes (object identity alone forced a full re-hash
    # of the right side on the exact large-scale path this join exists
    # for; r10 ADVICE). Independently fitted models always differ in uid.
    if index_b.model.uid != index_a.model.uid:
        # re-hash under the LEFT index's family: approxSimilarityJoin
        # transforms any input missing the hash output column
        b_df = b_df.drop(index_a.model.getOutputCol())
    joined = index_a.model.approxSimilarityJoin(
        index_a.hashed_df(), b_df, threshold, distCol=dist_col
    )
    return joined.select(
        F.col(f"datasetA.{index_a.id_col}").alias("id_a"),
        F.col(f"datasetB.{index_b.id_col}").alias("id_b"),
        F.round(F.col(dist_col), 6).alias(dist_col),
    )
