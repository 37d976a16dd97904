"""Binary quantization (BQ) — 1-bit-per-dimension sign codes with Hamming
shortlisting: the most aggressive member of the compressed-search family
(PQ/IVF-PQ/SQ8, operators/pq.py, sq.py). 32× less candidate-scan I/O than
float32 (64 dims -> one int64 word) and the cheapest possible per-pair
distance — one XOR + popcount per word, both single CPU instructions that
Spark's codegen emits directly (`bit_count(a ^ b)`).

Scheme: code bit i = (x_i > 0). Hamming distance between codes is a
monotone proxy for angular distance (sign-random-projection LSH with the
identity projection — Charikar's SimHash bound applied to the raw axes),
so the search is shortlist-by-Hamming then exact rerank:

  quantize -> integer Hamming -> top-(k*rerank) by (hamming, id) -> exact L2

Everything before the rerank is integer arithmetic with a strict total
order (id tie-break — Hamming ties are dense at 64 bits), so, like SQ8
and unlike PQ's float ADC, the ENTIRE search is deterministic and
hash-checkable against a DuckDB oracle, not just recall-bounded.

Scale shape:
- encode is ONE codegen projection (no fit at all — BQ is data-independent,
  so there is nothing to sample, broadcast, or save beyond the codes);
- the candidate scan reads ceil(d/64) longs per row and ends in
  TakeOrderedAndProject (per-partition heaps); the heap rows carry the
  float vector so rerank needs no second scan — only k*rerank survivors'
  vectors leave their executors. With a separately stored codes table
  (the real 100 TB layout: 8 bytes per 64 dims per row), the k*rerank ids
  broadcast-join back to the float table instead, as PqIndex.search does.

Reference parity: the reference searches float32 only (hnsw.h:45-52);
quantized search is part of the promised billion-scale surface
(SURVEY.md §2.2).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from custom_vector_database_spark.functions.vector import l2_squared

__all__ = ["bq_pack", "bq_pack_python", "bq_hamming", "bq_search", "bq_search_many"]


def bq_pack(vec: Column, dim: int) -> Column:
    """array<float> -> array<long> sign codes, 64 dims per word, first
    element of each 64-slice in the HIGH bit (shiftleft-or fold); a dim
    not divisible by 64 packs its final short slice into the low bits of
    the last word — same layout as bq_pack_python. Bit rule: set iff
    x > 0 (zeros and negatives clear — exact float comparison, so the
    code is engine-reproducible).

    A NULL vector or one whose length differs from ``dim`` packs to
    NULL (not to a misaligned short fold, whose artificially small
    Hamming distances could evict true neighbors from a shortlist) —
    downstream asc_nulls_last orderings then rank such rows strictly
    after every real match."""
    n_words = max(1, math.ceil(dim / 64))
    packed = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda w: F.aggregate(
            F.slice(vec, w * 64 + 1, 64),
            F.lit(0).cast("long"),
            # bitwise shift/or never overflow-checks (unlike ANSI `*2 + b`)
            lambda acc, x: F.shiftleft(acc, 1).bitwiseOR(
                F.when(x > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            ),
        ),
    )
    return F.when(F.size(vec) == dim, packed)


def bq_pack_python(vec: list[float]) -> list[int]:
    """Driver-side twin of bq_pack for query literals — same layout, same
    bit rule, wrapped to signed int64 so the literal round-trips Spark's
    long type. NaN sets the bit: SQL comparison semantics order NaN
    above every number (Spark and DuckDB both evaluate NaN > 0 as true,
    verified empirically), while Python's IEEE `nan > 0` is false —
    without the explicit isnan branch a NaN query element would pack
    differently here than either engine packs it."""
    words: list[int] = []
    for start in range(0, len(vec), 64):
        acc = 0
        for x in vec[start : start + 64]:
            acc = (acc << 1) | (1 if (x > 0 or math.isnan(x)) else 0)
        if acc >= 1 << 63:
            acc -= 1 << 64
        words.append(acc)
    return words or [0]


def bq_hamming(a: Column, b: Column) -> Column:
    """Total Hamming distance between two code-word arrays: one
    XOR + popcount per word, summed (bounded by dim — no overflow)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def bq_search(
    df: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 3,
) -> DataFrame:
    """Top-k by exact L2 over BQ-preselected candidates.

    Candidate set = top k*rerank by (Hamming code distance, id) — a strict
    total order, so the set is deterministic; output = exact
    (id, dist_sq) over that set, nearest-first, id tie-break.
    """
    dim = len(query)
    qwords = F.array(*[F.lit(int(w)).cast("long") for w in bq_pack_python(query)])
    qlit = F.array(*[F.lit(float(x)) for x in query])
    coded = df.select(
        F.col(id_col),
        F.col(vec_col),
        bq_hamming(bq_pack(F.col(vec_col), dim), qwords).alias("hamming"),
    )
    # asc_nulls_last: a NULL hamming (NULL vector -> NULL code words)
    # must never enter candidacy — default asc ordering is NULLS FIRST
    cands = coded.orderBy(
        F.col("hamming").asc_nulls_last(), F.col(id_col).asc()
    ).limit(k * rerank)
    return (
        cands.select(
            F.col(id_col),
            F.round(l2_squared(F.col(vec_col), qlit), 6).alias("dist_sq"),
        )
        .orderBy(F.col("dist_sq").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def bq_search_many(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qvec",
    rerank: int = 3,
    max_query_rows: int | None = 100_000,
    max_broadcast_bytes: int | None = 256 << 20,
) -> DataFrame:
    """Batch BQ retrieval: the k nearest data rows for EVERY query row,
    via the Hamming shortlist — the bulk path where the candidate scan
    costs one XOR+popcount per (pair, 64 dims) instead of a 64-term
    float fold (the same scan-cost argument as IVF-PQ's ADC batch path,
    on even smaller codes and with no index to build or probe).

    Physical shape: data packs ONCE per scan (one codegen projection,
    shared by every query); queries pack on the broadcast side. Then
    broadcast(queries) ⨯ data → per-qid top-(k·rerank) window over BARE
    (qid, id, hamming) triples — vectors never ride the ranking shuffle —
    and the n_q·k·rerank survivors broadcast-join BACK to the data table
    for the exact rerank (the same join-back shape as PqIndex.search).
    Both stages keep the strict total order, so batch output ==
    per-query bq_search and the whole thing is hash-checkable. The
    query side must broadcast — ``max_query_rows`` guards that (the
    payload per row is dim floats + ceil(dim/64) longs: ~300 B at
    dim 64, so the default guard caps the broadcast at ~30 MiB)."""
    from pyspark.sql import Window

    for qc in (query_id, query_vec):
        # the rerank stage joins the query frame back onto the data
        # table, so a query column named like the data side's id/vec
        # surfaces as an ambiguous-column AnalysisException deep in the
        # plan — fail fast with the remedy instead (mirrors
        # IvfBqIndex.search_many's guard)
        if qc in (id_col, vec_col):
            raise ValueError(
                f"query column {qc!r} collides with the data table's "
                f"({id_col!r}, {vec_col!r}) columns - alias it on the "
                "query side first"
            )
    # ONE query-side aggregate serves the row-count guard, the
    # NULL/ragged validation, and the dim inference
    stats = queries.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(query_vec).isNull().cast("long")).alias("n_null"),
        F.min(F.size(F.col(query_vec))).alias("d_min"),
        F.max(F.size(F.col(query_vec))).alias("d_max"),
    ).first()
    n_q = int(stats["n"])
    if n_q == 0:
        return queries.select(
            F.col(query_id),
            F.lit(None).cast(dict(data.dtypes)[id_col]).alias(id_col),
            F.lit(0.0).alias("dist_sq"),
        ).limit(0)
    if stats["n_null"] or stats["d_min"] != stats["d_max"]:
        raise ValueError(
            f"{stats['n_null']} query vector(s) are NULL and dims span "
            f"[{stats['d_min']}, {stats['d_max']}] - bq_search_many needs "
            "non-NULL queries of one dimension"
        )
    if max_query_rows is not None and n_q > max_query_rows:
        raise ValueError(
            f"queries has {n_q} rows > max_query_rows={max_query_rows}; "
            "a broadcast this large risks executor OOM - split the "
            "query table and bq_search_many per split"
        )
    dim = int(stats["d_min"])
    if max_broadcast_bytes is not None:
        # the rerank broadcast carries the FULL float query vectors (the
        # code-word side is negligible); row count alone under-estimates
        # it - the same byte guard as the index batch paths
        from pyspark.sql import types as T

        elem_t = queries.schema[query_vec].dataType.elementType
        elem_b = 8 if isinstance(elem_t, T.DoubleType) else 4
        per_row = dim * elem_b + max(1, math.ceil(dim / 64)) * 8 + 32
        est = n_q * per_row
        if est > max_broadcast_bytes:
            raise ValueError(
                f"estimated broadcast {est >> 20} MiB (= {n_q} queries × "
                f"~{per_row} B of vector+code words/row) > "
                f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB; "
                "split the query table and bq_search_many per split"
            )
    qwords = queries.select(
        F.col(query_id), bq_pack(F.col(query_vec), dim).alias("__qwords")
    )
    dwords = data.select(
        F.col(id_col), bq_pack(F.col(vec_col), dim).alias("__dwords")
    )
    triples = F.broadcast(qwords).crossJoin(dwords).select(
        query_id,
        id_col,
        bq_hamming(F.col("__dwords"), F.col("__qwords")).alias("hamming"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("hamming").asc_nulls_last(), F.col(id_col).asc()
    )
    cands = (
        triples.withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= k * rerank)
        .select(query_id, id_col)
    )
    # survivors (n_q * k * rerank ids) broadcast back into the float
    # table; the query vectors ride the (small) query-side broadcast
    rejoined = (
        data.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(cands), id_col)
        .join(
            F.broadcast(queries.select(F.col(query_id), F.col(query_vec))),
            query_id,
        )
    )
    wr = Window.partitionBy(query_id).orderBy(
        F.col("dist_sq").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        rejoined.select(
            query_id,
            id_col,
            F.round(l2_squared(F.col(vec_col), F.col(query_vec)), 6).alias(
                "dist_sq"
            ),
        )
        .withColumn("__rk", F.row_number().over(wr))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
