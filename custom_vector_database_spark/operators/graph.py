"""Iterative graph operators: connected components for transitive dedup.

Pair-based dedup (minhash_dedup_pairs / ngram_jaccard_pairs) emits EDGES;
a duplicate *cluster* is the transitive closure over them — A~B and B~C
must collapse A, B, C together even when A and C never matched directly.
The reference has nothing iterative at all (every command is one batch
pass, /root/reference/src/main.cpp:66-70); this is the standard
hash-to-min label propagation used for web-scale dedup:

  label(v) ← min(label(v), min over neighbors' labels)   until fixpoint

Each round is ONE join + ONE min-aggregation: the undirected edge set is
augmented with identity edges (v, v) once, so the self-label and the
neighbor labels flow through the same join and the per-round "keep my own
label" left-join disappears (one fewer shuffle and stage per round —
fixed per-round cost is what dominates on small graphs, and shuffle count
is what dominates at scale). The label sum is a monotonically decreasing
convergence witness — one cheap scalar agg per round, no row-by-row diff.
Rounds needed = graph diameter; dedup similarity graphs are dense clumps
with tiny diameters (2-4 rounds), which is why plain hash-min is the
default here.

``accelerate=True`` adds pointer jumping (shortcutting) each round:
label(v) ← label(label(v)) — the label graph's paths halve every round, so
convergence drops to O(log diameter) at the cost of one extra self-join
shuffle per round. That is the variant for adversarial chain-shaped
graphs (the same O(log n) bound as the large-star/small-star contraction
of Kiveris et al., "Connected Components in MapReduce", with simpler
primitives); tests/test_pipeline_ops.py proves a 120-node path converges
in ≤10 accelerated rounds where plain hash-min needs 119.

Because clumpy dedup graphs converge in 2-4 plain rounds while paying for
pointer jumping doubles every round's shuffle bill, the default is
ESCALATION rather than a static choice: run plain hash-min, and flip
pointer jumping on automatically once ``escalate_after`` rounds have not
converged — the signature of a long-chain graph. The worst case then
stays O(escalate_after + log diameter) rounds while the common case never
pays the extra self-join. Default 4: measured on the sf0.1 similarity
graph (9-round plain diameter), escalating at 4 beat both plain (3.5 s)
and always-jumping (2.7 s) at 2.4 s — clumpy graphs still converge
before ever escalating.

Thread-safety note: the iteration temporarily overrides the session-global
``spark.sql.shuffle.partitions`` and ``spark.sql.adaptive.enabled`` (both
restored in a finally). Queries running CONCURRENTLY on the same
SparkSession during the loop would plan their shuffles under those
overrides — run this operator serially within a session, or on its own
session, when that matters.

``localCheckpoint`` truncates the lineage each round: without it the plan
doubles per iteration and Catalyst re-analysis dominates after ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank", "triangle_count"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    accelerate: bool = False,
    escalate_after: int = 4,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``, where
    cluster_id = the minimum node id reachable through the edge set.

    ``accelerate=True`` forces pointer jumping from round one; the default
    runs plain hash-min and escalates to pointer jumping only after
    ``escalate_after`` non-converged rounds (set ``escalate_after`` >=
    ``max_iter`` to never escalate).

    Isolated nodes (no edges) are the caller's concern — a full dedup
    assigns them their own id via a left join of the corpus onto this
    result (see queries/text_queries.dedup_connected_components).
    """
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # identity edges (v, v): the self-label rides the SAME join/groupBy as
    # neighbor labels, eliminating the per-round keep-own-label left join
    nodes = edges.select(F.col(src).alias("a")).union(
        edges.select(F.col(dst).alias("a"))
    )
    und = und.union(nodes.select("a", F.col("a").alias("b")))
    und = und.distinct().localCheckpoint(eager=True)

    # Size the iteration's shuffles from the data, not the session: every
    # round is a join + agg over the (node, label) set, and a small edge
    # set under the session's full shuffle.partitions pays ~full task
    # overhead per round for near-empty partitions (measured 3.0 s → 1.9 s
    # at 600 edges / 32 partitions). A 100 TB edge set keeps the session
    # setting untouched.
    spark = und.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    n_edges = und.count()
    iter_parts = min(int(old_parts), max(1, n_edges // 50_000 + 1))

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]

    # AQE re-plans every shuffle stage; inside the loop the partition
    # count is already sized from the data above, so the re-planning is
    # pure per-round latency (measured ~13% of loop wall time) — off for
    # the iteration, restored after.
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(iter_parts))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        labels = _cc_iterate(
            und, labels, prev_sum, max_iter, accelerate, escalate_after
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def _cc_iterate(und, labels, prev_sum, max_iter, accelerate, escalate_after):
    jumping = accelerate
    for rnd in range(max_iter):
        # a graph still unconverged after escalate_after rounds has a long
        # chain — switch pointer jumping on for the remaining rounds
        if not jumping and rnd >= escalate_after:
            jumping = True
        # identity edges are in `und`, so min(label over joined edges)
        # already includes the node's own label — one join + one agg
        labels = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("label"))
        )
        if jumping:
            # pointer jumping: follow the label chain one hop —
            # label(label(v)) ≤ label(v) always, so least() is just safety
            x, y = labels.alias("x"), labels.alias("y")
            labels = x.join(
                y, F.col("x.label") == F.col("y.node"), "left"
            ).select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.label"),
                    F.coalesce(F.col("y.label"), F.col("x.label")),
                ).alias("label"),
            )
        labels = labels.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pointer jumping escalation included) - raise max_iter; "
            "diameter exceeds 2^(max_iter - escalate_after)"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank over the UNDIRECTED graph of ``edges`` in exact integer
    arithmetic — document centrality over a similarity graph (which docs
    sit at the center of a near-duplicate cluster / topical hub).

    All mass is integer in ``scale`` units and every step is integer
    division, so a fixed ``iters`` run is bit-reproducible in any engine
    (the registered query's DuckDB oracle unrolls the same iterations):

        r_0(v)    = scale div n
        r_{t+1}(v)= (100-d)·scale div (100·n)
                    + Σ_{u→v} d·r_t(u) div (100·deg(u))

    Truncation loses ≤1 unit per term per round — irrelevant at
    scale=1e12 and identical on both engines. Shape: degree table built
    once; each iteration is ONE equi-join (edges ⋈ ranks) + ONE
    aggregation, exactly the connected-components round cost; iters is
    FIXED (no convergence action per round). Returns (node, rank) with
    rank in scale units.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    spark = edges.sparkSession
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    und = und.join(deg, "a").localCheckpoint(eager=True)
    nodes = und.select(F.col("a").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node long, rank long")
    base = (100 - damping_pct) * scale // (100 * n)
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    # same iteration-loop treatment as connected_components: size the
    # per-round shuffles from the edge count and turn AQE's per-stage
    # re-planning off for the loop (restored after) — small graphs
    # otherwise pay near-empty-partition task overhead and re-plan
    # latency on every one of the fixed rounds. See the thread-safety
    # note in connected_components: conf overrides are session-global.
    n_edges = und.count()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    iter_parts = min(int(old_parts), max(1, n_edges // 50_000 + 1))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(iter_parts))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for _ in range(iters):
            contrib = und.join(ranks, und["a"] == ranks["node"]).select(
                F.col("b"),
                F.expr(f"{damping_pct} * rank div (100 * deg)").alias("c"),
            )
            ranks = (
                contrib.groupBy(F.col("b").alias("node"))
                .agg((F.lit(base) + F.sum("c")).cast("long").alias("rank"))
                .localCheckpoint(eager=True)
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    return ranks


def triangle_count(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list
    (``src < dst`` canonical pairs, deduplicated here defensively) —
    the local clustering signal that separates tight duplicate cliques
    from chains in a near-dup graph, and the classic two-join
    distributed graph kernel.

    Shape: edges are oriented from the lower-(degree, id) endpoint to
    the higher one (the degree-ordering of Cohen / node-iterator++), so
    a node's wedge fan-out is its HIGHER-ORDERED-neighbor count — at
    most O(sqrt(m)) for any node on any graph — bounding total wedges at
    O(m^1.5) even when a hub concentrates the degree mass. Id-only
    orientation (the round-6 shape) left a low-id hub generating deg²
    wedges: 56.6 s on the sf1 hub probe vs the same order as the other
    graph rows after this change (PLANS.md). Each triangle is counted
    exactly once (its corners have a unique (degree, id) order); per-node
    counts are orientation-invariant, so the registered oracle is
    unchanged. Cost: one extra degree aggregate + two broadcast-or-
    shuffle joins of the edge list against the (node, degree) table —
    linear work that buys the m^1.5 wedge bound. Returns
    (node, n_triangles) for every node in at least one triangle.
    """
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))  # also drops self-loops
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("__da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("__db")), "b")
    )
    # struct comparison is lexicographic: (deg, id) totally orders the
    # endpoints because ids are distinct within an edge
    ka = F.struct(F.col("__da").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("__db").alias("d"), F.col("b").alias("i"))
    o = ed.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ka < kb, kb).otherwise(ka).alias("__kv"),
    )
    # wedges fan out only toward HIGHER-ordered neighbors; the closing
    # edge (v1 -> v2) is oriented the same way, so one semi-join closes
    wedges = o.alias("e1").join(
        o.alias("e2"),
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.__kv") < F.col("e2.__kv")),
    ).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
        F.col("e2.v").alias("c"),
    )
    tris = wedges.alias("w").join(
        o.alias("e3"),
        (F.col("w.b") == F.col("e3.u")) & (F.col("w.c") == F.col("e3.v")),
        "left_semi",
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
