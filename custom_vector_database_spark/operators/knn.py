"""Exact k-nearest-neighbor operators (the reference's `search`, O7).

Reference semantics (/root/reference/src/vectordb.cpp:120-156): given one
query vector and k, return the k nearest rows as (id, squared-L2) pairs,
nearest first. The reference answers from an HNSW graph (approximate); here
the *exact* scan is the primary operator because at Spark scale it is:

  parquet scan (column-pruned to id+vec) → codegen'd distance expression
  → TakeOrderedAndProject (heap-based top-k, no global sort shuffle)

which is a single pass over the data with a tiny (k-row) result collected
per partition and merged on the driver — the plan you want at 100 TB.
The approximate path lives in operators/ann.py (MLlib LSH).

`knn_join` generalizes to a query *table* (absent in the reference — it only
supports 1 query per process, main.cpp:95-118): broadcast the small query
side, cross-join, per-query top-k via a window. The query side is assumed
small (it's broadcast); for table-vs-table similarity at scale use
ann.approx_similarity_join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from custom_vector_database_spark.functions.vector import (
    cosine_similarity,
    l2_squared,
)

__all__ = ["knn", "knn_join", "matryoshka_search", "mmr_select"]

_METRICS = {"l2_sq", "cosine", "dot"}


def _distance(metric: str, vec_col: Column, query_col: Column) -> Column:
    if metric == "l2_sq":
        return l2_squared(vec_col, query_col)
    if metric == "cosine":
        # distance = 1 - cosine similarity (smaller = nearer)
        return F.lit(1.0) - cosine_similarity(vec_col, query_col)
    if metric == "dot":
        # maximum-inner-product search as a distance: negate so that
        # ascending order = highest dot product (MIPS ranking)
        from custom_vector_database_spark.functions.vector import dot_product

        return -dot_product(vec_col, query_col)
    raise ValueError(f"unknown metric {metric!r}; expected one of {_METRICS}")


def knn(
    df: DataFrame,
    query: list[float] | DataFrame,
    k: int,
    id_col: str = "id",
    vec_col: str = "vec",
    metric: str = "l2_sq",
    predicate: Column | None = None,
    dist_col: str = "dist_sq",
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k nearest rows to a single query vector.

    ``query`` is either a Python list (broadcast as a literal — never a
    collected table) or a 1-row DataFrame with column ``q`` (stays fully
    distributed via broadcast cross-join, useful when the query vector
    itself comes from the table). ``predicate`` pre-filters rows (filtered
    ANN, an extension the reference lacks — its search is unfilterable,
    SURVEY §2.2); the filter sits before the distance expression so
    Catalyst pushes it into the scan.

    Returns (id_col, dist_col) nearest-first with id tie-break.
    """
    if predicate is not None:
        df = df.filter(predicate)
    if isinstance(query, DataFrame):
        out = df.crossJoin(F.broadcast(query))
        qcol = F.col("q")
    else:
        out = df
        qcol = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    dist = _distance(metric, F.col(vec_col), qcol)
    if round_to is not None:
        dist = F.round(dist, round_to)
    # asc_nulls_last: a NULL distance (length-mismatched vec — zip_with pads
    # with null — or zero-norm vector under cosine) must never outrank real
    # neighbors; also matches DuckDB's ORDER BY default (NULLS LAST).
    return (
        out.select(F.col(id_col), dist.alias(dist_col))
        .orderBy(F.col(dist_col).asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    data_id: str = "id",
    data_vec: str = "vec",
    query_id: str = "qid",
    query_vec: str = "qvec",
    metric: str = "l2_sq",
    dist_col: str = "dist_sq",
    round_to: int | None = 6,
    max_query_rows: int | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """For every row of ``queries``, the k nearest rows of ``data``.

    ``predicate`` is a per-PAIR condition evaluated on the joined row
    (e.g. ``col("_lbl") == col("qlabel")`` for per-query attribute
    filtering); it sits before the window, so filtered-out pairs never
    rank. With a predicate, both sides keep all their columns for the
    condition to reference — Catalyst still prunes unused ones.

    Physical shape: broadcast(queries) ⨯ data → windowed row_number ≤ k.
    Scales as O(|data| · |queries|) distance evaluations spread across all
    executors with NO shuffle of ``data`` (the window partitions by qid,
    shuffling only (qid, id, dist) triples, never vectors).

    The query side is BROADCAST — it must fit in executor memory. Pass
    ``max_query_rows`` to enforce that assumption with an explicit count
    (one cheap job) instead of an executor OOM; for query sets too large to
    broadcast, use ann.approx_similarity_join instead.

    Under the cosine metric both sides' norms are computed once before the
    join, so the per-pair work is a single dot-product fold.
    """
    if max_query_rows is not None:
        n_q = queries.count()
        if n_q > max_query_rows:
            raise ValueError(
                f"queries has {n_q} rows > max_query_rows={max_query_rows}; "
                "a broadcast this large risks executor OOM - use "
                "ann.approx_similarity_join for table-vs-table search"
            )
    from custom_vector_database_spark.functions.vector import dot_product, l2_norm

    qside = queries if predicate is not None else queries.select(
        F.col(query_id), F.col(query_vec)
    )
    dside = data if predicate is not None else data.select(
        F.col(data_id), F.col(data_vec)
    )
    if metric == "cosine":
        q = qside.withColumn("_qn", l2_norm(query_vec))
        d = dside.withColumn("_dn", l2_norm(data_vec))
        joined = d.crossJoin(F.broadcast(q))
        denom = F.col("_dn") * F.col("_qn")
        dist = F.lit(1.0) - F.when(
            denom != 0.0, dot_product(F.col(data_vec), F.col(query_vec)) / denom
        )
    else:
        joined = dside.crossJoin(F.broadcast(qside))
        dist = _distance(metric, F.col(data_vec), F.col(query_vec))
    if predicate is not None:
        joined = joined.filter(predicate)
    if round_to is not None:
        dist = F.round(dist, round_to)
    scored = joined.select(F.col(query_id), F.col(data_id), dist.alias(dist_col))
    w = Window.partitionBy(query_id).orderBy(
        F.col(dist_col).asc_nulls_last(), F.col(data_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def matryoshka_search(
    df: DataFrame,
    query: list[float] | DataFrame,
    k: int,
    prefix_dims: int = 16,
    candidates: int = 50,
    id_col: str = "id",
    vec_col: str = "vec",
    round_to: int | None = 6,
) -> DataFrame:
    """Two-stage exact search over nested (matryoshka) embeddings: rank by
    the squared-L2 of the FIRST ``prefix_dims`` components, keep the top
    ``candidates`` rows, rerank those exactly over the full vector.

    MRL-trained embeddings (Kusupati et al. 2022, public) concentrate
    information in the prefix, so the stage-1 scan reads/folds
    prefix_dims/dim of the arithmetic (with a column-chunked storage
    layout, proportionally less I/O too) and the full-precision fold runs
    on only ``candidates`` rows. Unlike LSH/IVF/PQ this needs NO index or
    fit — the progressive-precision path for freshly-written data.

    Physical shape: scan → prefix fold → TakeOrderedAndProject(candidates)
    carrying the vector (the sq8_search rerank shape — no second scan) →
    full fold on candidates → top-k. Both stages are deterministic
    (fixed-order folds, id tie-breaks), so the whole search — candidate
    cut included — is exactly oracle-checkable, unlike any hash-seeded
    ANN. Returns (id, dist_prefix, dist_sq) nearest-first by full
    distance.
    """
    if not (0 < prefix_dims):
        raise ValueError("prefix_dims must be positive")
    if candidates < k:
        raise ValueError("candidates must be >= k")
    if isinstance(query, DataFrame):
        staged = df.crossJoin(F.broadcast(query))
        qcol = F.col("q")
    else:
        staged = df
        qcol = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    d_pre = l2_squared(
        F.slice(F.col(vec_col), 1, prefix_dims), F.slice(qcol, 1, prefix_dims)
    )
    if round_to is not None:
        d_pre = F.round(d_pre, round_to)
    cand = (
        staged.select(
            F.col(id_col), F.col(vec_col), qcol.alias("_q"), d_pre.alias("dist_prefix")
        )
        .orderBy(F.col("dist_prefix").asc_nulls_last(), F.col(id_col).asc())
        .limit(candidates)
    )
    d_full = l2_squared(F.col(vec_col), F.col("_q"))
    if round_to is not None:
        d_full = F.round(d_full, round_to)
    return (
        cand.select(F.col(id_col), "dist_prefix", d_full.alias("dist_sq"))
        .orderBy(F.col("dist_sq").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def mmr_select(
    df: DataFrame,
    query: list[float] | DataFrame,
    k: int = 5,
    candidates: int = 20,
    lam: float = 0.5,
    id_col: str = "id",
    vec_col: str = "vec",
) -> list[tuple[int, int, float]]:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998, public):
    select ``k`` results balancing relevance to the query against
    diversity among the selected set —
    score(d) = λ·sim(d, q) − (1−λ)·max_{s∈S} sim(d, s), greedy.

    Two-stage shape (the PQ-codebook argument): stage 1 is DISTRIBUTED —
    top-``candidates`` by relevance via TakeOrderedAndProject carrying
    the vector, then a bounded candidates² similarity join, all folds
    the proven fixed-order Catalyst expressions rounded to 6. Stage 2 —
    the greedy loop — runs driver-side over the collected
    O(candidates²) ROUNDED similarity matrix: k sequential argmaxes
    over ≤ candidates scalars are driver math by nature, and operating
    on the engine-rounded values with id tie-breaks makes the selection
    bit-reproducible in any engine (the mmr_diverse_search oracle
    unrolls the same k steps in SQL).

    sim = −squared-L2 (monotone in similarity). Returns
    [(rank, id, relevance)] — a bounded Python list, not a DataFrame
    (callers wrap via createDataFrame; nothing unbounded reaches the
    driver).
    """
    if not (0 < k <= candidates):
        raise ValueError("need 0 < k <= candidates")
    if isinstance(query, DataFrame):
        staged = df.crossJoin(F.broadcast(query))
        qcol = F.col("q")
    else:
        staged = df
        qcol = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    # 0.0 - x rather than unary negation: -round(0.0) is IEEE -0.0, whose
    # string form would differ between engines in the output column
    rel = F.round(F.lit(0.0) - l2_squared(F.col(vec_col), qcol), 6)
    # a NULL relevance (null vector / null element / dim mismatch — the
    # zip_with fold yields NULL for all of these) would reach the driver
    # as rel=None and crash the greedy arithmetic with a bare TypeError;
    # drop such rows from candidacy, matching the asc_nulls_last
    # never-outrank-real-neighbors convention in knn()
    cand = (
        staged.select(F.col(id_col), F.col(vec_col), rel.alias("rel"))
        .filter(F.col("rel").isNotNull())
        .orderBy(F.col("rel").desc_nulls_last(), F.col(id_col).asc())
        .limit(candidates)
        .localCheckpoint(eager=True)  # one scan; feeds the pair join twice
    )
    a, b = cand.alias("a"), cand.alias("b")
    pair_sim = F.round(
        F.lit(0.0) - l2_squared(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
    )
    sims_rows = (
        a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("ia"),
            F.col(f"b.{id_col}").alias("ib"),
            pair_sim.alias("sim"),
        )
        .collect()
    )
    rels = {r[0]: r[1] for r in cand.select(id_col, "rel").collect()}
    sim = {(r["ia"], r["ib"]): r["sim"] for r in sims_rows}
    selected: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    while len(selected) < k and len(chosen) < len(rels):
        best = None
        for d in sorted(rels):  # id order = deterministic tie-break
            if d in chosen:
                continue
            penalty = max((sim[(d, s)] for s in chosen), default=0.0)
            score = lam * rels[d] - (1 - lam) * penalty if chosen else rels[d]
            if best is None or score > best[0]:
                best = (score, d)
        chosen.append(best[1])
        selected.append((len(selected) + 1, best[1], rels[best[1]]))
    return selected
