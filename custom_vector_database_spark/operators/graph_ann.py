"""Graph-ANN search — the reference's actual query path, distributed.

The reference answers every k-NN query by WALKING its proximity graph:
greedy descent through the upper layers to a good entry point, then a
bounded best-first beam over layer 0 (/root/reference/lib/hnsw/
hnsw.h:104-132 searchKnn, :203-248 searchLayer). Round 12 built the
graph (operators/knn_graph.py); this module makes it ANSWER QUERIES —
the capability class the reference actually ships — and gives it the
saved-layout contract every other index family has (persist/load,
model-id pin, staleness protocol, recall calibration with a pinned
knob).

Spark-first decomposition of searchKnn:

- **Entry (the upper-layer descent's role)**: HNSW's log-layer greedy
  walk exists to find a good starting node cheaply. The distributed
  analogue is the engine's existing coarse quantizer: at fit time a
  sample-bounded KMeans (operators/fitting.py) assigns every node a
  cluster and records ONE entry node per cluster (the node nearest the
  centroid). At search time each query's ``entry_probes`` nearest
  centroids (one codegen/Arrow projection — fitting.nprobe_clusters_col)
  seed the beam with those clusters' entry nodes. Cost: O(k_c × dim)
  per query, the IVF shortlist price.
- **Beam (searchLayer's role)**: bounded synchronous rounds of
  best-first expansion, ALL queries at once. Each round takes every
  query's ``beam_width`` best not-yet-expanded visited nodes (one
  window), joins them to the saved edge list (equi-join on the node
  id), anti-joins away nodes the query already visited, scores the new
  (query, node) pairs (equi-join to the vector table + broadcast join
  to the bounded query side), and folds them into the visited set.
  ``rounds`` is a hard bound, never a convergence spin — the
  per-query visited set is ≤ entries + rounds × beam_width × degree
  rows by construction.

Physical shape at 100 TB: every join is an equi-join (cluster id, node
id, query id); vectors ride exactly one join per round (the scoring
join against the node table — partition-prunable by id bucketing);
edge triples and (qid, node, dist) triples carry everything else; each
round ends in a localCheckpoint so lineage stays flat. The query side
is broadcast-bounded (max_query_rows, the knn_join discipline).

Accuracy contract (SURVEY §4.3): recall vs the exact k-NN join, never
hash-equality — ``calibrate_beam`` measures recall@k over a doubling
beam_width schedule and pins the smallest one meeting the caller's
target into the saved meta (the calibrate_nprobe pattern), and the
registered ``knn_graph_search`` row returns the exact top-k plus a
measured-recall boolean (the ann_lsh_search convention).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.fitting import (
    collect_sample_matrix,
    kmeans_fit_np,
    nearest_centroid_col,
    nprobe_clusters_col,
    resolve_n_clusters,
)
from custom_vector_database_spark.operators.fitting import (
    rowwise_l2_sq_col,
)
from custom_vector_database_spark.operators.knn import l2_squared
from custom_vector_database_spark.operators.tombstones import (
    TombstoneDeleteMixin,
)

__all__ = ["KnnGraphIndex", "calibrate_beam"]


class KnnGraphIndex(TombstoneDeleteMixin):
    """A saved k-NN graph + its vectors + the entry quantizer — the
    persisted, queryable form of operators/knn_graph.knn_graph (which
    returns edges only). Layout on disk:

        <path>/meta.json   centroids, entry table, config, optional pins
        <path>/edges       (src, dst, dist) parquet
        <path>/nodes       (id, vec) parquet — metric-transformed
                           (cosine stores unit vectors, the ivf.py
                           normalize-at-build convention)
        <path>/backlinks   (src, dst, dist) parquet — OPTIONAL upsert
                           sidecar: reverse links INTO the delta (the
                           HNSW bidirectional-insert analogue,
                           hnsw.h:91-97), appended per upsert and
                           folded into edges (with degree pruning) at
                           the next save/compact
    """

    def __init__(
        self,
        edges: DataFrame,
        nodes: DataFrame,
        centroids: list[list[float]],
        entries: list[list],  # [cluster, entry_id] pairs
        id_col: str,
        dim: int,
        metric: str = "l2_sq",
        degree: int = 10,
        model_id: str | None = None,
        carry_cols: list[str] | None = None,
    ):
        if metric not in ("l2_sq", "cosine"):
            raise ValueError(
                f"unknown metric {metric!r}; expected 'l2_sq' or 'cosine'"
            )
        self.edges = edges
        self.nodes = nodes
        self.centroids = centroids
        self.entries = entries
        self.id_col = id_col
        self.dim = dim
        self.metric = metric
        self.degree = degree
        self.model_id = model_id
        self.carry_cols = list(carry_cols or [])  # filter attributes
        # stored IN the node table so filtered searches read them off
        # the scoring join (the IvfIndex carry_cols convention)
        self.calibration: dict | None = None  # beam pin (calibrate_beam)
        self._path: str | None = None
        # reverse links INTO upserted nodes (same schema as edges),
        # None until an upsert appends some or load() finds the sidecar
        self.backlinks: DataFrame | None = None

    def _walk_edges(self) -> DataFrame:
        """(_node, dst) adjacency the beam expands over: the main edge
        table UNION the upsert backlink sidecar — without the
        backlinks, a heavily-upserted region is reachable only via
        entry seeding and other delta nodes (in-edge recall drift, the
        r13 verdict's missing #1)."""
        e = self.edges.select(F.col("src").alias("_node"), F.col("dst"))
        if self.backlinks is not None:
            e = e.unionByName(
                self.backlinks.select(
                    F.col("src").alias("_node"), F.col("dst")
                )
            )
        return e

    def _raw_layout(self) -> DataFrame:
        """Tombstone protocol (TombstoneDeleteMixin): deletes key on
        NODE ids; the node table is the full stored frame."""
        return self.nodes

    @staticmethod
    def _entries_for(nodes: DataFrame, centroids, id_col: str):
        """One entry node per non-empty cluster: the member nearest
        that centroid (assign projection + broadcast centroid join +
        one window; bounded ≤ n_clusters collect). Shared by fit and
        compact (compact must re-pick entries from the LIVE nodes — a
        physically dropped entry node would otherwise leave dead
        seeds)."""
        spark = nodes.sparkSession
        cent_df = spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
            "cluster int, _cent array<double>",
        )
        assigned = nodes.withColumn(
            "cluster",
            nearest_centroid_col("CAST(`vec` AS ARRAY<DOUBLE>)", centroids),
        ).join(F.broadcast(cent_df), "cluster")
        w = Window.partitionBy("cluster").orderBy(
            l2_squared(F.col("vec"), F.col("_cent")).asc(),
            F.col(id_col).asc(),
        )
        return [
            [int(r["cluster"]), r[id_col]]
            for r in assigned.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("cluster", id_col)
            .collect()
        ]

    # -- fit ------------------------------------------------------------
    @classmethod
    def fit(
        cls,
        df: DataFrame,
        degree: int = 10,
        id_col: str = "id",
        vec_col: str = "vec",
        metric: str = "l2_sq",
        iterations: int = 2,
        n_clusters: int | str = "auto",
        target_rows_per_cluster: int = 256,
        probe_clusters: int = 3,
        random_partners: int = 3,
        seed: int = 42,
        max_iter: int = 10,
        fit_sample: int = 100_000,
        model_id: str | None = None,
        carry_cols: list[str] | None = None,
    ) -> "KnnGraphIndex":
        """Build the degree-NN graph (operators/knn_graph.knn_graph —
        multi-probe IVF init + bounded NN-Descent, linear in n), fit the
        ENTRY quantizer on the same bounded-sample discipline, and pick
        one entry node per cluster: the node nearest that centroid
        (HNSW's enter-point role, hnsw.h:104-110 — a central node, so
        the first beam round starts inside the right neighborhood).
        Everything distributed except the sample-bounded driver fits."""
        from custom_vector_database_spark.operators.knn_graph import (
            knn_graph,
        )

        carry_cols = list(carry_cols or [])
        bad = {
            id_col, vec_col, "vec", "cluster", "src", "dst", "_node",
            # beam/entry/upsert internals + both dist names + the
            # default query column names (r13 second-review finding):
            # a colliding carry column passes fit but explodes later
            # as AMBIGUOUS_REFERENCE or a silently clobbered attribute
            "_cent", "_expanded", "_rk", "_f", "_uq", "_uv",
            "dist_sq", "cos_dist", "qid", "qvec",
        } & set(carry_cols)
        if bad:
            raise ValueError(f"carry_cols collide with index columns: {bad}")
        dist_col = "cos_dist" if metric == "cosine" else "dist_sq"
        edges = knn_graph(
            df,
            k=degree,
            id_col=id_col,
            vec_col=vec_col,
            metric=metric,
            iterations=iterations,
            n_clusters=n_clusters,
            target_rows_per_cluster=target_rows_per_cluster,
            probe_clusters=probe_clusters,
            random_partners=random_partners,
            seed=seed,
            max_iter=max_iter,
            fit_sample=fit_sample,
        ).localCheckpoint(eager=True)

        carry = [F.col(c) for c in carry_cols]
        nodes = df.select(F.col(id_col), F.col(vec_col).alias("vec"), *carry)
        if metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _unit_normalize_expr,
            )

            nodes = nodes.select(
                id_col, _unit_normalize_expr("`vec`").alias("vec"), *carry
            )
        nodes = nodes.localCheckpoint(eager=True)
        # ONE action answers the row count and the dim probe (previously
        # a count job plus a first job over the same checkpoint)
        nstats = nodes.agg(
            F.count(F.lit(1)).alias("n"), F.first("vec").alias("v0")
        ).first()
        n = int(nstats["n"])
        dim = len(nstats["v0"])

        kc = resolve_n_clusters(
            n_clusters, n, target_rows_per_cluster, fit_sample
        )
        x = collect_sample_matrix(nodes, "vec", n, fit_sample, seed)
        centroids = kmeans_fit_np(x, kc, seed, max_iter)

        # entry per cluster = the member nearest its centroid (shared
        # helper — never a literal-table fold)
        entries = cls._entries_for(nodes, centroids, id_col)
        idx = cls(
            edges, nodes, centroids, entries, id_col, dim,
            metric=metric, degree=degree, model_id=model_id,
            carry_cols=carry_cols,
        )
        idx._dist_col = dist_col
        return idx

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        if self._tombstones is not None and self._tombstone_count():
            # the write below physically drops tombstoned nodes — a
            # dropped ENTRY node would leave dead seeds in the meta
            # (score()'s inner node join silently eats them), so the
            # entries are re-picked from the live set first (r13
            # second-review finding; compact() inherits this via its
            # save call)
            self.entries = self._entries_for(
                self._live(self.nodes), self.centroids, self.id_col
            )
        meta = {
            "id_col": self.id_col,
            "dim": self.dim,
            "metric": self.metric,
            "degree": self.degree,
            "model_id": self.model_id,
            "carry_cols": self.carry_cols,
            "centroids": self.centroids,
            "entries": self.entries,
        }
        if self.calibration is not None:
            meta["calibration"] = self.calibration
        from custom_vector_database_spark.operators.layout import (
            meta_write_lease,
        )

        with meta_write_lease(path, "save"):
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
        # a save PHYSICALLY DROPS tombstoned nodes and every edge
        # touching them (either endpoint) — a full rewrite needs no
        # sidecar to follow it (the IvfPqIndex.save contract)
        edges_w, nodes_w = self.edges, self.nodes
        if self.backlinks is not None:
            # fold the upsert backlink sidecar into the main edge table
            # with degree pruning — the HNSW M_max prune (hnsw.h:94-97)
            # applied at rewrite time: per src keep the `degree` closest
            # (dist asc, dst tie-break), so a backlink genuinely closer
            # than a stale NN-Descent edge displaces it
            dcol = self.edges.columns[2]
            wf = Window.partitionBy("src").orderBy(
                F.col(dcol).asc_nulls_last(), F.col("dst").asc()
            )
            edges_w = (
                edges_w.unionByName(self.backlinks)
                .dropDuplicates(["src", "dst"])
                .withColumn("_rk", F.row_number().over(wf))
                .filter(F.col("_rk") <= self.degree)
                .drop("_rk")
            )
            # materialize the fold BEFORE the overwrite below: a
            # same-path save would otherwise overwrite the parquet dirs
            # the lazy fold still reads from
            edges_w = edges_w.localCheckpoint(eager=True)
        if self._tombstones is not None:
            t = self._tombstones
            nodes_w = nodes_w.join(t, self.id_col, "left_anti")
            edges_w = edges_w.join(
                t.withColumnRenamed(self.id_col, "src"), "src", "left_anti"
            ).join(
                t.withColumnRenamed(self.id_col, "dst"), "dst", "left_anti"
            )
        edges_w.write.mode("overwrite").parquet(os.path.join(path, "edges"))
        nodes_w.write.mode("overwrite").parquet(os.path.join(path, "nodes"))
        from custom_vector_database_spark.operators.layout import (
            clear_tombstones,
        )

        clear_tombstones(path)  # any stale sidecar at the target is obsolete
        bl_dir = os.path.join(path, "backlinks")
        if os.path.isdir(bl_dir):
            # the fold above subsumed any backlink sidecar at the target
            import shutil

            shutil.rmtree(bl_dir)
        if self._tombstones is not None or self.backlinks is not None:
            # re-point the handle at what was just written BEFORE
            # dropping the tombstone/backlink views; a clean save keeps
            # the path-independent in-memory frames so the written dir
            # stays movable (install_dir_swap renames it)
            spark = self.edges.sparkSession
            self.edges = spark.read.parquet(os.path.join(path, "edges"))
            self.nodes = spark.read.parquet(os.path.join(path, "nodes"))
            self._tombstones = None
            self.backlinks = None
        self._path = path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "KnnGraphIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        idx = cls(
            spark.read.parquet(os.path.join(path, "edges")),
            spark.read.parquet(os.path.join(path, "nodes")),
            meta["centroids"],
            meta["entries"],
            meta["id_col"],
            meta["dim"],
            metric=meta.get("metric", "l2_sq"),
            degree=meta.get("degree", 10),
            model_id=meta.get("model_id"),
            carry_cols=meta.get("carry_cols"),
        )
        idx.calibration = meta.get("calibration")
        idx._path = path
        bl = os.path.join(path, "backlinks")
        if os.path.isdir(bl):
            # schema pinned from edges: an all-replayed upsert can leave
            # the dir with no part files, which an inferred read refuses
            idx.backlinks = spark.read.schema(idx.edges.schema).parquet(bl)
        idx._load_tombstones(spark)
        return idx

    # -- staleness (quantization_error_report protocol) --------------------
    def _staleness_feats(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Entry-quantizer distortion (the IvfIndex convention): as data
        drifts from the centroids' training sample, the seeding gets
        worse and beam recall degrades with it — the rebuild signal."""
        from custom_vector_database_spark.operators.pq import (
            _refuse_report_vectors,
        )

        _refuse_report_vectors(df, vec_col, self.dim)
        src = F.col(vec_col)
        if self.metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _unit_normalize_expr,
            )

            src = _unit_normalize_expr(f"`{vec_col}`")
        return df.select(src.cast("array<double>").alias("_vec"))

    def _staleness_error_expr(self) -> F.Column:
        from custom_vector_database_spark.operators.pq import (
            _min_sq_dist_sql,
        )

        return F.expr(_min_sq_dist_sql("_vec", self.centroids))

    # -- search -------------------------------------------------------------
    def _resolve_beam(self, beam_width, rounds, entry_probes):
        """Resolve the THREE search knobs together. ``beam_width="auto"``
        reads the pinned recall calibration (calibrate_beam
        persist=True) — and because the pinned recall was MEASURED at
        the calibration's rounds/entry_probes, those are restored too
        for any knob the caller left at None (an explicit value always
        wins; restoring only beam_width would silently deliver a lower
        recall than the pin promises — r13 review finding). Without
        "auto", None knobs take the documented defaults (3, 2)."""
        if beam_width == "auto":
            if not self.calibration or "beam_width" not in self.calibration:
                raise ValueError(
                    'beam_width="auto" needs a pinned calibration — run '
                    "calibrate_beam(..., persist=True) on the saved "
                    "layout first"
                )
            pin = self.calibration
            return (
                int(pin["beam_width"]),
                int(pin.get("rounds", 3)) if rounds is None else int(rounds),
                int(pin.get("entry_probes", 2))
                if entry_probes is None
                else int(entry_probes),
            )
        return (
            int(beam_width),
            3 if rounds is None else int(rounds),
            2 if entry_probes is None else int(entry_probes),
        )

    def search_many(
        self,
        queries: DataFrame,
        k: int,
        beam_width: int | str = "auto",
        rounds: int | None = None,
        entry_probes: int | None = None,
        query_id: str = "qid",
        query_vec: str = "qvec",
        dist_col: str | None = None,
        max_query_rows: int | None = 100_000,
        filter_map: dict[str, str] | None = None,
        model_id: str | None = None,
    ) -> DataFrame:
        """Beam-search the saved graph for every query row at once —
        the distributed searchKnn (hnsw.h:104-132). Returns (query_id,
        id_col, dist_col) best-first per query, id tie-break, ≤ k rows
        per query. ``rounds`` bounds the expansion; ``beam_width`` is
        the recall knob calibrate_beam pins (with ``beam_width="auto"``
        the pinned rounds/entry_probes are restored too unless passed
        explicitly; plain-int beam leaves None knobs at 3/2).

        ``filter_map`` maps a node attribute column (stored via
        fit(carry_cols=...)) to a query-side column: the beam WALKS the
        graph unrestricted (restricting the walk itself would sever
        connectivity through non-matching nodes — the standard
        filtered-graph-ANN discipline) and the per-query top-k is taken
        over MATCHING nodes only, so each query gets up to k
        attribute-matching neighbors."""
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
        )

        check_model_id(self.model_id, model_id, "this k-NN-graph layout")
        beam_width, rounds, entry_probes = self._resolve_beam(
            beam_width, rounds, entry_probes
        )
        if beam_width <= 0 or rounds < 0 or k <= 0 or entry_probes <= 0:
            raise ValueError(
                f"k={k}, beam_width={beam_width}, rounds={rounds}, "
                f"entry_probes={entry_probes} must be positive (rounds may "
                "be 0: entry scoring only) — entry_probes=0 would emit an "
                "empty shortlist and silently drop every query"
            )
        dist_col = dist_col or (
            "cos_dist" if self.metric == "cosine" else "dist_sq"
        )
        reserved = {
            self.id_col, "vec", "src", "dst", "cluster",
            "_node", "_expanded", "_rk", "_f", dist_col,
            *self.carry_cols,
        }
        filter_map = dict(filter_map or {})
        if len(set(filter_map.values())) != len(filter_map):
            raise ValueError(
                "filter_map maps two node columns to the same query "
                "column — the duplicated column would be selected twice "
                "into the broadcast side"
            )
        for dcol, qcol in filter_map.items():
            if dcol not in self.carry_cols:
                raise ValueError(
                    f"filter column {dcol!r} is not in the saved node "
                    f"table — build the index with fit(carry_cols="
                    f"[{dcol!r}])"
                )
            if qcol in reserved or qcol == dcol or qcol in (
                query_id, query_vec,
            ):
                raise ValueError(
                    f"query filter column {qcol!r} collides with a "
                    "layout or query column — alias it on the query "
                    "side first"
                )
        for qc in (query_id, query_vec):
            if qc in reserved or qc in filter_map:
                raise ValueError(
                    f"query column {qc!r} collides with a layout or "
                    "beam-internal column — alias it on the query side "
                    "first"
                )
        # ONE bounded pass guards dims, element finiteness, qid
        # uniqueness, and the broadcast row count. Non-finite/NULL
        # ELEMENTS must refuse here: nprobe_clusters_col masks such
        # rows to a NULL shortlist, explode drops them, and the query
        # would silently vanish from the output (r13 review finding).
        qv = F.col(query_vec)
        bad = (
            qv.isNull()
            | (F.size(qv) != self.dim)
            | F.exists(
                qv,
                lambda x: x.isNull()
                | F.isnan(x.cast("double"))
                | (F.abs(x.cast("double")) == float("inf")),
            )
        )
        stats = queries.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(query_id)).alias("n_q"),
            F.sum(bad.cast("long")).alias("n_bad"),
        ).first()
        if stats["n_bad"]:
            raise ValueError(
                f"{stats['n_bad']} query vector(s) are NULL, have a "
                f"dim other than {self.dim}, or contain NULL/non-finite "
                "elements — such a query cannot rank and would silently "
                "return no rows; filter or impute upstream"
            )
        if int(stats["n_q"]) != int(stats["n"]):
            raise ValueError(
                f"duplicate {query_id!r} values in the query table "
                f"({stats['n']} rows, {stats['n_q']} distinct ids): the "
                "per-query top-k would count the same node once per "
                "duplicate — dedup the query ids upstream"
            )
        if max_query_rows is not None and int(stats["n"]) > max_query_rows:
            raise ValueError(
                f"queries has {stats['n']} rows > "
                f"max_query_rows={max_query_rows}; the beam broadcasts "
                "the query side — split it and search_many per split"
            )
        if self.metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _unit_normalize_expr,
            )

            queries = queries.withColumn(
                query_vec, _unit_normalize_expr(f"`{query_vec}`")
            )
        qfilter_cols = [F.col(c) for c in filter_map.values()]
        # lazy checkpoints throughout the beam: lineage (and the Catalyst
        # plan) is cut exactly as before, but materialization happens in
        # the CALLER's first action over the result — one job runs the
        # whole bounded chain instead of one job per round, and the
        # persisted partitions are reused across rounds just the same
        qside = queries.select(
            query_id, query_vec, *qfilter_cols
        ).localCheckpoint(eager=False)
        spark = qside.sparkSession
        # candidate scoring rides the Arrow row-wise kernel — per round
        # the beam scores ≤ queries × beam × degree fresh pairs, the
        # search's dominant compute at scale (knn_graph pair_dist note)
        pair_dist = F.round(
            rowwise_l2_sq_col(F.col("vec"), F.col(query_vec))
            / (2.0 if self.metric == "cosine" else 1.0),
            6,
        )

        fcols = sorted(filter_map)  # node attrs carried through visited

        def score(cand: DataFrame) -> DataFrame:
            """(qid, node) → + dist (+ filter attrs): equi-join to the
            node table, then broadcast-join the bounded query side."""
            return (
                cand.join(
                    self.nodes.withColumnRenamed(self.id_col, "_node"),
                    "_node",
                )
                .join(F.broadcast(qside.select(query_id, query_vec)),
                      query_id)
                .select(
                    F.col(query_id),
                    F.col("_node"),
                    pair_dist.alias(dist_col),
                    *[F.col(c) for c in fcols],
                )
            )

        # seed: entry nodes of each query's entry_probes nearest
        # ENTRY-BEARING clusters. The ranking runs over the entry
        # clusters' centroids only (positional ids into self.entries),
        # never the full centroid table: a memberless cluster (possible
        # at big auto-sized k, or from minibatch centers no point ever
        # picked) has no entry node, and ranking it would inner-join
        # away the seed — a query whose nearest clusters were all
        # memberless silently returned zero rows (r13 review finding).
        # Every query now gets ≥ 1 seed by construction (fit guarantees
        # ≥ 1 non-empty cluster).
        entry_cents = [self.centroids[int(c)] for c, _ in self.entries]
        entry_df = spark.createDataFrame(
            [(i, e) for i, (_c, e) in enumerate(self.entries)],
            f"cluster int, _node {dict(self.nodes.dtypes)[self.id_col]}",
        )
        probes = nprobe_clusters_col(
            f"CAST(`{query_vec}` AS ARRAY<DOUBLE>)",
            entry_cents,
            min(int(entry_probes), len(entry_cents)),
        )
        seeds = (
            qside.select(query_id, F.explode(probes).alias("cluster"))
            .join(F.broadcast(entry_df), "cluster")
            .select(query_id, "_node")
            .distinct()
        )
        visited = score(seeds).withColumn(
            "_expanded", F.lit(False)
        ).localCheckpoint(eager=False)

        w = Window.partitionBy(query_id).orderBy(
            F.col(dist_col).asc_nulls_last(), F.col("_node").asc()
        )
        for _ in range(int(rounds)):
            frontier = (
                visited.filter(~F.col("_expanded"))
                .withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= beam_width)
                .select(query_id, "_node")
            )
            nbrs = (
                frontier.join(
                    self._walk_edges(),
                    "_node",
                )
                .select(query_id, F.col("dst").alias("_node"))
                .distinct()
            )
            fresh = nbrs.join(
                visited.select(query_id, "_node"),
                [query_id, "_node"],
                "left_anti",
            )
            scored = score(fresh).withColumn("_expanded", F.lit(False))
            marked = visited.join(
                frontier.withColumn("_f", F.lit(True)),
                [query_id, "_node"],
                "left_outer",
            ).select(
                query_id,
                "_node",
                dist_col,
                *fcols,
                (
                    F.col("_expanded")
                    | F.coalesce(F.col("_f"), F.lit(False))
                ).alias("_expanded"),
            )
            visited = marked.unionByName(scored).localCheckpoint(eager=False)

        out = visited
        if self._tombstones is not None:
            # deleted nodes stay usable for ROUTING (their vectors are
            # physically present until save/compact drops them — the
            # filtered-search walk-unrestricted discipline) but must
            # never be EMITTED; one bounded broadcast anti-join
            out = out.join(
                self._tombstones.withColumnRenamed(self.id_col, "_node"),
                "_node",
                "left_anti",
            )
        if filter_map:
            # emit-time filtering: join the per-query filter values back
            # (broadcast, bounded) and keep matching nodes only — the
            # walk above was unrestricted, so connectivity through
            # non-matching nodes is preserved
            out = out.join(
                F.broadcast(
                    qside.select(query_id, *qfilter_cols)
                ),
                query_id,
            )
            for dcol, qcol in filter_map.items():
                out = out.filter(F.col(dcol) == F.col(qcol))
        return (
            out.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select(
                F.col(query_id),
                F.col("_node").alias(self.id_col),
                F.col(dist_col),
            )
        )

    def search(
        self,
        query: list[float],
        k: int,
        beam_width: int | str = "auto",
        rounds: int | None = None,
        entry_probes: int | None = None,
        dist_col: str | None = None,
        model_id: str | None = None,
    ) -> DataFrame:
        """Single-query convenience: a 1-row query table through
        search_many (the same distributed plan — never a driver loop)."""
        if len(query) != self.dim:
            raise ValueError(
                f"query dim {len(query)} != index dim {self.dim}"
            )
        spark = self.nodes.sparkSession
        qdf = spark.createDataFrame(
            [(0, [float(x) for x in query])],
            "qid int, qvec array<double>",
        )
        return self.search_many(
            qdf, k, beam_width=beam_width, rounds=rounds,
            entry_probes=entry_probes, dist_col=dist_col,
            model_id=model_id,
        ).drop("qid")

    def upsert(
        self,
        delta: DataFrame,
        vec_col: str = "vec",
        beam_width: int | str = 24,
        rounds: int = 3,
        entry_probes: int = 2,
        model_id: str | None = None,
    ) -> int:
        """Append a delta of NEW nodes to the SAVED graph layout — the
        HNSW insert (hnsw.h:60-103: search for the new point's
        neighbors, link it in), distributed: every delta node
        beam-searches its ``degree`` nearest existing nodes in ONE
        batch (search_many over the delta as the query table), and
        those become its out-edges. The REVERSE links (HNSW links the
        new point INTO existing nodes' lists, hnsw.h:91-97) land in a
        backlink SIDECAR instead of rewriting pre-existing edge files:
        per-batch degree-pruned (the M_max prune), unioned by the beam
        at frontier expansion (_walk_edges), folded into the main edge
        table with global degree pruning at the next save/compact — so
        upserted regions stay reachable through their existing
        neighbors, not only via entry seeding and other delta nodes.
        Residual drift (entry-quantizer distortion, per-src backlink
        accumulation across many batches) is what the staleness report
        prices. Duplicate ids against the saved node
        table refuse (the tombstone-family ghost-row rationale).
        Deltas are bounded at 100k rows per call (the delta is the
        broadcast query side of search_many) — split larger deltas and
        call upsert per batch. Returns rows appended."""
        if self._path is None:
            raise ValueError(
                "upsert requires a saved index (call save() or load() "
                "first)"
            )
        from custom_vector_database_spark.operators.layout import (
            check_model_id,
        )

        check_model_id(self.model_id, model_id, "this k-NN-graph layout")
        spark = self.nodes.sparkSession
        carry = [F.col(c) for c in self.carry_cols]  # the saved node
        # schema includes the filter attributes; a delta missing one
        # fails loudly at this select, never as a half-schema append
        new_nodes = delta.select(
            F.col(self.id_col), F.col(vec_col).alias("vec"), *carry
        )
        if self.metric == "cosine":
            from custom_vector_database_spark.operators.ivf import (
                _unit_normalize_expr,
            )

            new_nodes = new_nodes.select(
                self.id_col, _unit_normalize_expr("`vec`").alias("vec"),
                *carry,
            )
        # lazy checkpoint: lineage is cut now, materialization rides the
        # guard agg below — one job instead of a dedicated checkpoint job
        # (the guards and the search both reuse the cached partitions)
        new_nodes = new_nodes.localCheckpoint(eager=False)
        # ONE action answers row count AND intra-delta duplication (the
        # per-id group counts fold to n = sum, max-dup = max) instead of
        # a count job plus a groupBy-limit job
        gstats = (
            new_nodes.groupBy(self.id_col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.sum("_c").alias("n"), F.max("_c").alias("mx"))
            .first()
        )
        # an empty delta folds to NULL aggregates (zero groups) — restore
        # the pre-merge no-op contract (ADVICE r14): streaming sinks can
        # legitimately hand this path an empty micro-batch
        n = int(gstats["n"] or 0)
        if n == 0:
            return 0
        # the delta rides search_many as its query table, which bounds
        # the broadcast side at 100k rows — surface the UPSERT remedy
        # (split the delta; each batch is an independent append with the
        # same crash-replay healing) instead of the search-oriented one
        # (ADVICE r13)
        if n > 100_000:
            raise ValueError(
                f"upsert delta has {n} rows > the 100k per-batch bound "
                "(the delta is search_many's broadcast query side): "
                "split the delta and call upsert() per batch — batches "
                "are independent appends and later batches link to "
                "earlier ones"
            )
        if int(gstats["mx"]) > 1:
            raise ValueError(
                f"duplicate {self.id_col!r} within the upsert delta: two "
                "vectors under one node id is undecidable — dedup ids "
                "upstream"
            )
        # ONE action answers BOTH id-collision guards (tombstoned ids and
        # live saved ids): union the two bounded semi-joins and count per
        # kind; the error-message example id is looked up only on the
        # failure path
        new_ids = new_nodes.select(self.id_col)
        checks = new_ids.join(
            self._live(self.nodes.select(self.id_col)),
            self.id_col, "left_semi",
        ).select(F.lit("live").alias("_w"))
        if self._tombstones is not None:
            checks = checks.unionByName(
                self._tombstones.join(new_ids, self.id_col, "left_semi")
                .select(F.lit("tomb").alias("_w"))
            )
        hit = {
            r["_w"]: int(r["_c"])
            for r in checks.groupBy("_w").agg(
                F.count(F.lit(1)).alias("_c")
            ).collect()
        }
        if hit.get("tomb"):
            raise ValueError(
                f"{hit['tomb']} delta id(s) are tombstoned on this index; "
                "run compact() first to physically clear deletions, then "
                "upsert (ids are otherwise append-only, matching the "
                "reference's monotonic id contract)"
            )
        if hit.get("live"):
            dup = new_nodes.join(
                self._live(self.nodes.select(self.id_col)),
                self.id_col, "left_semi",
            )
            raise ValueError(
                f"delta reuses id(s) already in the saved graph (e.g. "
                f"{dup.first()[self.id_col]!r}): an id collision would "
                "leave two vectors under one node — rebuild instead"
            )
        queries = new_nodes.select(
            F.col(self.id_col).alias("_uq"), F.col("vec").alias("_uv")
        )
        dist_col = self.edges.columns[2]
        edges_old = self.search_many(
            queries, k=self.degree, beam_width=beam_width, rounds=rounds,
            entry_probes=entry_probes, query_id="_uq", query_vec="_uv",
            model_id=model_id,
        ).select(
            F.col("_uq").alias("src"),
            F.col(self.id_col).alias("dst"),
            F.col(dist_col),
        )
        # intra-delta edges: a batch insert would otherwise miss
        # neighbors that arrived in the SAME delta (HNSW inserts
        # sequentially, so later inserts see earlier ones) — one exact
        # batch-bounded k-NN join within the delta restores that,
        # then the best ``degree`` per source win across both pools
        from custom_vector_database_spark.operators import knn as knn_ops

        intra = knn_ops.knn_join(
            new_nodes, queries, k=self.degree,
            data_id=self.id_col, data_vec="vec",
            query_id="_uq", query_vec="_uv",
            metric="cosine" if self.metric == "cosine" else "l2_sq",
            dist_col=dist_col,
            predicate=F.col(self.id_col) != F.col("_uq"),
        ).select(
            F.col("_uq").alias("src"),
            F.col(self.id_col).alias("dst"),
            F.col(dist_col),
        )
        w = Window.partitionBy("src").orderBy(
            F.col(dist_col).asc_nulls_last(), F.col("dst").asc()
        )
        edges_new = (
            edges_old.unionByName(intra)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= self.degree)
            .drop("_rk")
        )
        # Crash-replay exactness without a claims protocol (r13 review
        # finding): edges append FIRST, nodes LAST. A crash between the
        # two leaves orphan edges (srcs absent from the node table) —
        # harmless to searches (score()'s inner node join drops them,
        # and nothing reaches them: no edge points TO a delta node yet
        # and the entry table predates the delta) — and the RETRY
        # recomputes the identical edges (the beam never visits the
        # orphans, so the graph it sees is unchanged) and anti-joins
        # away the rows that already landed, re-appending exactly the
        # missing ones. A retry after BOTH appends landed hits the
        # duplicate-id refusal above — the upsert already completed.
        # the FULL recomputed set feeds the backlink derivation below —
        # a crash mid-edges-append must not under-append backlinks for
        # rows that landed pre-crash (replay derives backlinks from the
        # full set and anti-joins what's stored, per table)
        # lazy: the first append below materializes it; the backlink
        # derivation and later appends reuse the persisted partitions
        edges_full = edges_new.localCheckpoint(eager=False)
        edges_missing = edges_full.join(
            self.edges.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        # reverse links INTO the delta (hnsw.h:91-97: the new point is
        # linked into existing nodes' neighbor lists, pruned at M_max):
        # kept in a SIDECAR the beam unions at expansion (_walk_edges),
        # folded into the main edge table with degree pruning at the
        # next save/compact — pre-existing edge files are never
        # rewritten here. Per batch, each src keeps its `degree`
        # closest reverse links (the M_max prune); accumulation across
        # MANY upserts is unbounded per src until the fold — documented,
        # and exactly what the staleness signals price.
        wb = Window.partitionBy("src").orderBy(
            F.col(dist_col).asc_nulls_last(), F.col("dst").asc()
        )
        back = (
            edges_full.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col(dist_col),
            )
            .withColumn("_rk", F.row_number().over(wb))
            .filter(F.col("_rk") <= self.degree)
            .drop("_rk")
            .join(self.edges.select("src", "dst"), ["src", "dst"],
                  "left_anti")
        )
        if self.backlinks is not None:
            back = back.join(
                self.backlinks.select("src", "dst"), ["src", "dst"],
                "left_anti",
            )
        # append order: edges -> backlinks -> nodes. A crash between
        # any two leaves rows that are invisible to searches (backlink
        # dsts absent from the node table drop at the scoring join) and
        # the replay recomputes identical sets and re-appends exactly
        # the missing rows of each table.
        edges_missing.write.mode("append").parquet(
            os.path.join(self._path, "edges")
        )
        back.write.mode("append").parquet(
            os.path.join(self._path, "backlinks")
        )
        new_nodes.write.mode("append").parquet(
            os.path.join(self._path, "nodes")
        )
        schema = self.edges.schema
        self.edges = spark.read.parquet(os.path.join(self._path, "edges"))
        self.nodes = spark.read.parquet(os.path.join(self._path, "nodes"))
        self.backlinks = spark.read.schema(schema).parquet(
            os.path.join(self._path, "backlinks")
        )
        return int(n)

    def compact(self) -> dict:
        """Physically drop tombstoned nodes (and every edge touching
        them) from the SAVED layout via the shared crash-safe
        whole-directory swap, re-picking entry nodes from the LIVE node
        set first (a dropped entry would otherwise leave dead seeds).
        Nodes that pointed at deleted neighbors keep < degree out-edges
        until the next rebuild — documented, and exactly what the
        staleness/occupancy signals price. Returns
        {n_tombstones_dropped, n_nodes, n_edges}."""
        if self._path is None:
            raise ValueError(
                "compact requires a saved index (call save() or load() "
                "first)"
            )
        from custom_vector_database_spark.operators.layout import (
            install_dir_swap,
        )

        path = self._path
        spark = self.nodes.sparkSession
        n_t = self._tombstone_count()
        install_dir_swap(path, self.save)  # save() drops tombstoned
        # rows, re-picks live entries, and clears the sidecar
        self._path = path
        self.edges = spark.read.parquet(os.path.join(path, "edges"))
        self.nodes = spark.read.parquet(os.path.join(path, "nodes"))
        self._tombstones = None
        self.backlinks = None  # save() folded the sidecar into edges
        return {
            "n_tombstones_dropped": int(n_t),
            "n_nodes": int(self.nodes.count()),
            "n_edges": int(self.edges.count()),
        }

    def describe(self) -> dict:
        n_nodes = self.nodes.count()
        n_tomb = self._tombstone_count()
        n_live = (
            n_nodes if not n_tomb else self._live(self.nodes).count()
        )
        return {
            "kind": "knn_graph",
            "metric": self.metric,
            "n_nodes": int(n_nodes),
            "n_live_nodes": int(n_live),
            "degree": self.degree,
            "dim": self.dim,
            "n_clusters": len(self.centroids),
            "n_entries": len(self.entries),
            "n_tombstones": int(n_tomb),
            "n_backlinks": (
                0 if self.backlinks is None else int(self.backlinks.count())
            ),
            "calibrated": self.calibration is not None,
            "saved": self._path is not None,
        }


def calibrate_beam(
    idx: KnnGraphIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    target_recall: float = 0.9,
    query_id: str = "qid",
    query_vec: str = "qvec",
    max_queries: int = 256,
    rounds: int = 3,
    entry_probes: int = 2,
    full_sweep: bool = False,
    persist: bool = False,
    model_id: str | None = None,
) -> dict:
    """calibrate_nprobe's pattern for the graph layout: exact ground
    truth once (broadcast k-NN join over the node table), then a
    doubling ``beam_width`` sweep (k, 2k, 4k, … ≤ n_nodes) measuring
    mean recall@k of the beam search; pick the smallest width meeting
    ``target_recall`` and optionally pin it into the saved meta (atomic
    read-modify-replace under the layout's sibling lock). Returns
    {"k", "target_recall", "n_queries", "steps": [{"beam_width",
    "recall"}, …], "beam_width", "recall", "met", "rounds",
    "entry_probes"}."""
    from custom_vector_database_spark.operators import knn as knn_ops
    from custom_vector_database_spark.operators.calibrate import (
        _id_sets,
        _recall_at_k,
    )
    from custom_vector_database_spark.operators.layout import (
        check_model_id,
    )

    check_model_id(idx.model_id, model_id, "this k-NN-graph layout")
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(
            f"target_recall must be in (0, 1], got {target_recall}"
        )
    n_q = queries.count()
    if n_q == 0:
        raise ValueError("empty query bag — nothing to calibrate on")
    if n_q > max_queries:
        raise ValueError(
            f"query bag has {n_q} rows > max_queries={max_queries}; "
            "calibration broadcasts the bag into every sweep step — "
            "sample it down"
        )
    if idx.metric == "cosine":
        from custom_vector_database_spark.operators.ivf import (
            _unit_normalize_expr,
        )

        queries = queries.withColumn(
            query_vec, _unit_normalize_expr(f"`{query_vec}`")
        )
    queries = queries.localCheckpoint(eager=True)
    # ground truth: the LIVE node table (tombstoned rows can never be
    # returned by the beam, so judging against them would deflate the
    # measured recall — the calibrate_nprobe _live lesson); it stores
    # the metric-transformed vectors (cosine already unit), so plain L2
    # ranking is the right order for both metrics
    exact = _id_sets(
        knn_ops.knn_join(
            idx._live(idx.nodes), queries, k,
            data_id=idx.id_col, data_vec="vec",
            query_id=query_id, query_vec=query_vec,
        )
        .select(query_id, idx.id_col)
        .collect(),  # bounded: k × |bag|
        query_id, idx.id_col,
    )
    n_nodes = idx._live(idx.nodes).count()
    widths: list[int] = []
    bw = max(1, int(k))
    while bw < n_nodes:
        widths.append(bw)
        bw *= 2
    widths.append(min(int(n_nodes), bw))

    steps = []
    chosen = None
    chosen_recall = None
    for bw in widths:
        got = _id_sets(
            idx.search_many(
                queries, k, beam_width=bw, rounds=rounds,
                entry_probes=entry_probes, query_id=query_id,
                query_vec=query_vec, model_id=model_id,
            )
            .select(query_id, idx.id_col)
            .collect(),
            query_id, idx.id_col,
        )
        rec = _recall_at_k(exact, got)
        steps.append({"beam_width": bw, "recall": round(rec, 6)})
        if rec >= target_recall and chosen is None:
            chosen, chosen_recall = bw, rec
            if not full_sweep:
                break
    report = {
        "k": int(k),
        "target_recall": float(target_recall),
        "n_queries": int(n_q),
        "rounds": int(rounds),
        "entry_probes": int(entry_probes),
        "steps": steps,
        "beam_width": chosen,
        "recall": round(chosen_recall, 6) if chosen_recall is not None else None,
        "met": chosen is not None,
    }
    if persist:
        if chosen is None:
            raise ValueError(
                "even the full-width beam missed the recall target — "
                "refusing to pin a knob that cannot deliver the "
                "contract; raise rounds/entry_probes or rebuild"
            )
        if idx._path is None:
            raise ValueError(
                "persist=True needs a saved layout (save() or load() "
                "first)"
            )
        from custom_vector_database_spark.operators.layout import (
            meta_write_lease,
        )

        meta_path = os.path.join(idx._path, "meta.json")
        pin = {
            "beam_width": int(chosen),
            "rounds": int(rounds),
            "entry_probes": int(entry_probes),
            "k": int(k),
            "target_recall": float(target_recall),
            "recall": round(float(chosen_recall), 6),
        }
        with meta_write_lease(idx._path, "calibrate"):
            with open(meta_path) as f:
                meta = json.load(f)
            meta["calibration"] = pin
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, meta_path)
        idx.calibration = pin
    return report
