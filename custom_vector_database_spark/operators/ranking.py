"""BM25 full-text ranking over a document table — the retrieval-side verb of
an LLM-data pipeline (quality-weighted corpus search, hard-negative mining).

Shape (all shuffles are keyed aggregations with map-side combine; every
join is a broadcast of something O(|terms|) or O(1)):

1. tokenize → explode → ``groupBy(doc_id, token)`` count   (term frequency)
2. from (1): ``groupBy(token)`` count                      (document freq)
3. doc lengths + one-row corpus stats (N, avgdl)           (broadcast)
4. score per (doc, term) via the BM25 formula; per-doc total is a
   *fixed-order* sum of per-term conditional aggregates so the float fold
   order is identical in Spark and the DuckDB oracle.

At 100 TB: (1) shuffles (doc_id, token) pairs for the query terms only —
the explode is filtered to the term set before the shuffle — and (2)-(3)
are tiny; nothing materializes an inverted index unless you persist (1).

Reference parity: ABSENT in the reference (SURVEY.md §2.2 — text retrieval
is part of the promised pipeline surface, not vectordb.cpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import text as tx


def bm25(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against `terms`; returns (id, score) for docs
    matching ≥1 term. idf = ln((N - df + 0.5)/(df + 0.5) + 1) (Lucene form,
    always positive).

    The posting-list localCheckpoint lives until the returned DataFrame is
    garbage-collected — callers scoring many queries in one session should
    consume the result promptly rather than accumulating references.
    """
    if not terms:
        raise ValueError("bm25 requires at least one query term")
    scored = term_scores(docs, terms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    return _fixed_order_sum(scored, [id_col], "token", terms)


def _fixed_order_sum(df, group_cols, cond_col, keys, value_col="s"):
    """Deterministic per-group total of ``value_col``: one conditional
    aggregate per key, added left-to-right — bit-identical to the
    oracles' identical expression regardless of partial-agg order. The
    ONE definition of the determinism-critical fold, shared by bm25
    (keys = query terms) and bm25_batch (keys = term positions)."""
    sums = [
        F.sum(F.when(F.col(cond_col) == k, F.col(value_col)).otherwise(0.0)).alias(
            f"s{i}"
        )
        for i, k in enumerate(keys)
    ]
    agg = df.groupBy(*group_cols).agg(*sums)
    total = F.lit(0.0)
    for i in range(len(keys)):
        total = total + F.col(f"s{i}")
    return agg.select(*[F.col(c) for c in group_cols], total.alias("score"))


def term_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Per-(doc, term) BM25 contributions ``(id, token, s)`` for every doc
    matching ≥1 of ``terms`` — the shared scoring core of single-query
    bm25() and multi-query bm25_batch().

    ONE tokenize pass over the corpus: doc length + the matched-term
    sublist come out of the same projection, materialized once
    (localCheckpoint) so the tf / dfreq / corpus-stats branches don't
    re-tokenize. What persists is only (id, dl, matched terms) — the
    "posting list" — not the token stream.
    """
    arr = tx.tokenize(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(arr).alias("dl"),
        F.filter(arr, lambda t: t.isin(terms)).alias("matched"),
    ).localCheckpoint(eager=True)
    tf = (
        base.select(id_col, "dl", F.explode("matched").alias("token"))
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )


def bm25_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "qid",
    terms_col: str = "terms",
    k1: float = 1.5,
    b: float = 0.75,
    max_terms: int = 8,
    max_queries: int | None = 100_000,
) -> DataFrame:
    """Top-``k`` BM25 results for EVERY row of a query table — the
    set-oriented retrieval generalization (what knn_join is to knn): one
    posting-list pass answers the whole query batch, the shape of
    RAG-corpus retrieval and hard-negative mining.

    ``queries``: (qid, terms array<string>), ≤ ``max_terms`` terms each
    (validated — the per-position fixed-order sum below needs a static
    width). Plan: term scores computed ONCE over the union of all query
    terms → broadcast join against the exploded (qid, position, token)
    query side → per-(qid, doc) score as max_terms POSITION-conditional
    sums added left-to-right (the single-query determinism trick,
    generalized) → per-qid top-k window. Only (qid, doc, score) scalars
    shuffle. IDF is corpus-global, shared across queries.

    Returns (qid, id, score, rk) with score rounded to 6 — the ranking
    key on both engines — nearest-rank-first per qid.

    The query table is collected once (``max_queries`` enforces the
    broadcast-small assumption with an explicit error, the knn_join
    max_query_rows convention) and that collected set is the SINGLE
    source for both the term union and the exploded query side — a
    non-deterministic query plan cannot diverge between the two.
    """
    q_rows = queries.select(query_id, terms_col).collect()
    if max_queries is not None and len(q_rows) > max_queries:
        raise ValueError(
            f"queries has {len(q_rows)} rows > max_queries={max_queries}; "
            "a driver collect/broadcast this large risks OOM"
        )
    for r in q_rows:
        if not r[1]:
            raise ValueError(
                f"query {r[0]!r} has no terms (single-query bm25 raises too)"
            )
        if len(r[1]) > max_terms:
            raise ValueError(f"query {r[0]!r} exceeds max_terms={max_terms}")
    if len({r[0] for r in q_rows}) != len(q_rows):
        # two rows sharing a qid would have their terms merged per position
        # by the fixed-order sum — silently blending two queries into one
        # ranking group
        raise ValueError("duplicate qid rows in the query table")
    all_terms = sorted({t for r in q_rows for t in r[1]})
    scored = term_scores(docs, all_terms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    spark = docs.sparkSession
    qx = spark.createDataFrame(
        [(r[0], ti, t) for r in q_rows for ti, t in enumerate(r[1])],
        f"{query_id} int, ti int, token string",
    )
    j = scored.join(F.broadcast(qx), "token")
    agg = _fixed_order_sum(j, [query_id, id_col], "ti", list(range(max_terms)))
    ranked = agg.select(
        F.col(query_id), F.col(id_col), F.round("score", 6).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(id_col).asc())
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: float = 60.0,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack & Clarke, SIGIR'09):
    score(d) = Σ_i 1/(k + rank_i(d)), a doc absent from a list contributes 0.

    Each input must be a (id_col, rank_col) DataFrame that is ALREADY a
    bounded top-N slice — fusion joins are over those slices only, so cost
    is O(N·lists), independent of corpus size; the expensive ranking passes
    stay in the upstream operators (BM25 postings / pruned ANN scans).
    Contributions add left-to-right over the input list order — a fixed-order
    sum, bit-identical to an oracle spelling the same chain, regardless of
    join parallelism.

    Returns (id_col, rank_0..rank_{n-1}, rrf_score) sorted best-first with
    id tie-break; rank_i is NULL where list i did not contain the doc.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    if k <= 0:
        raise ValueError("rrf k must be positive")
    fused = None
    for i, r in enumerate(rankings):
        slim = r.select(F.col(id_col), F.col(rank_col).alias(f"rank_{i}"))
        fused = slim if fused is None else fused.join(slim, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}")), F.lit(0.0)
        )
    out = fused.withColumn("rrf_score", F.round(score, 6)).orderBy(
        F.desc("rrf_score"), F.col(id_col).asc()
    )
    return out.limit(topk) if topk is not None else out


def _guard_maxsim_query_side(
    query_tokens: DataFrame,
    doc_side_cols: set[str],
    query_side_cols: list[str],
    qvec_col: str,
    max_query_tokens: int | None,
    max_broadcast_bytes: int | None,
    explode_factor: int = 1,
    payload_bytes_per_token: int | None = None,
) -> None:
    """Shared fail-fast guards for the MaxSim family's broadcast query
    bag. (1) Column collision: a query column named like a token-table
    column (both sides called 'embedding', say) hits an ambiguous-column
    AnalysisException deep in the crossJoin plan — reject up front with
    a rename remedy (the bq_search_many convention). (2) Broadcast size:
    the bag ships to every executor; guard on the BYTE arithmetic
    (rows × dim × element width), not row count alone — the
    ivf.search_many lesson — with ONE aggregate over the (small) query
    side, before any token-table job runs."""
    clash = [c for c in query_side_cols if c in doc_side_cols]
    if clash:
        raise ValueError(
            f"query column(s) {clash!r} collide with token-table columns "
            f"{sorted(doc_side_cols)!r} — alias the query side first"
        )
    if max_query_tokens is None and max_broadcast_bytes is None:
        return
    stats = query_tokens.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size(F.col(qvec_col))).alias("d"),
    ).first()
    n_q, dim = int(stats["n"]), int(stats["d"] or 0)
    if max_query_tokens is not None and n_q > max_query_tokens:
        raise ValueError(
            f"query bag has {n_q} token vectors > "
            f"max_query_tokens={max_query_tokens}; split the bag or raise "
            "the bound explicitly"
        )
    if max_broadcast_bytes is not None:
        from pyspark.sql import types as T

        elem_t = query_tokens.schema[qvec_col].dataType.elementType
        elem_b = 8 if isinstance(elem_t, T.DoubleType) else 4
        # explode_factor > 1 when the broadcast ships the EXPLODED side
        # (MaxSimIndex stage 1: one row per token per probed cluster) —
        # row count alone under-estimates it by nprobe×, the
        # ivf.search_many lesson. payload_bytes_per_token overrides the
        # float-vector width when what actually ships is smaller (the
        # quantized path broadcasts ceil(dim/64)-long sign codes, ~32×
        # less than floats — pricing them at float width would refuse
        # batches that broadcast fine).
        per_tok = (
            payload_bytes_per_token
            if payload_bytes_per_token is not None
            else dim * elem_b
        )
        est = n_q * explode_factor * (per_tok + 24)
        if est > max_broadcast_bytes:
            factor = (
                f" × {explode_factor} probes/token" if explode_factor > 1 else ""
            )
            what = (
                f"~{per_tok} B/token payload"
                if payload_bytes_per_token is not None
                else f"{dim} dims × {elem_b} B"
            )
            raise ValueError(
                f"estimated query-bag broadcast {est >> 20} MiB (= {n_q} "
                f"token vectors{factor} × {what}) > "
                f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB; "
                "split the query bag (or lower nprobe) — an unbounded "
                "broadcast OOMs executors silently"
            )


def maxsim_scores(
    tokens: DataFrame,
    query_tokens: DataFrame,
    doc_col: str = "doc",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    max_query_tokens: int | None = 100_000,
    max_broadcast_bytes: int | None = 256 << 20,
) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim scoring: documents carry
    MULTIPLE token vectors, the query is a bag of token vectors, and
    score(doc) = Σ_q max_t cos(q, t) — the multi-vector relevance model
    a single-vector k-NN cannot express. Returns (doc_col, score, n_q),
    unordered (callers top-k as they see fit).

    Scale shape: the query bag broadcasts (bounded); ONE scan of the
    token table fans out |Q|-fold into a map-side-combined (doc, qid)
    MAX, then a tiny per-doc SUM — vectors never pass the aggregate
    boundary, only (doc, qid, cos) scalars shuffle. Per-(doc, q) maxes
    round to 6 decimals BEFORE the sum so the final fold is over a
    1e-6 grid and fold order cannot change the result (hash-exact
    oracles). Zero-norm vectors carry NULL cosine and drop out of
    MAX/SUM/COUNT; n_q counts the query tokens that matched any token
    of the document.

    Guards (fail fast, before any token-table job): qid/qvec column
    names must not collide with doc/vec names, and the query bag must
    fit ``max_query_tokens`` rows / ``max_broadcast_bytes`` estimated
    bytes (rows × dim × element width) — the one broadcast in the repo
    previously without a limit (VERDICT r7)."""
    from custom_vector_database_spark.functions.vector import dot_product, l2_norm

    _guard_maxsim_query_side(
        query_tokens, {doc_col, vec_col}, [qid_col, qvec_col],
        qvec_col, max_query_tokens, max_broadcast_bytes,
    )
    toks = tokens.select(
        F.col(doc_col), F.col(vec_col), l2_norm(vec_col).alias("__nrm")
    )
    qtoks = query_tokens.select(
        F.col(qid_col), F.col(qvec_col), l2_norm(qvec_col).alias("__qn")
    )
    denom = F.col("__nrm") * F.col("__qn")
    cos = F.round(
        F.when(denom != 0.0, dot_product(F.col(vec_col), F.col(qvec_col)) / denom),
        6,
    )
    per_q = (
        toks.crossJoin(F.broadcast(qtoks))
        .select(doc_col, qid_col, cos.alias("__cos"))
        .groupBy(doc_col, qid_col)
        .agg(F.max("__cos").alias("__mx"))
    )
    return per_q.groupBy(doc_col).agg(
        F.round(F.sum("__mx"), 6).alias("score"),
        F.count("__mx").alias("n_q"),
    )


def maxsim_scores_many(
    tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
    doc_col: str = "doc",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qtok_col: str = "qtid",
    qvec_col: str = "qvec",
    max_query_tokens: int | None = 100_000,
    max_broadcast_bytes: int | None = 256 << 20,
) -> DataFrame:
    """Batch MaxSim: top-``k`` late-interaction results for EVERY query
    of a query TABLE in ONE token-table scan — the family's production
    verb (RAG retrieval and hard-negative mining are batch workloads;
    the reference answers one query per process, main.cpp:95-118), the
    shape bm25_batch / ivf.search_many give their families.

    ``query_tokens``: (qid_col, qtok_col, qvec_col) — one row per query
    TOKEN, ``qtok_col`` distinguishing tokens within a query (the
    single-query form's qid plays that role; here qid groups a whole
    bag). score(doc, query) = Σ_{qt ∈ query} max_t cos(qt, t), exactly
    maxsim_scores per query.

    Physical plan: the whole token bag broadcasts ONCE (byte-guarded —
    total tokens across all queries × dim × element width); one scan of
    the token table fans out into a map-side-combined (doc, qid, qtid)
    MAX, a per-(doc, qid) fixed-grid SUM (maxes rounded to 1e-6 before
    the sum, so the fold is order-independent and hash-exact against a
    SQL oracle), then a per-qid top-k window over (qid, doc, score)
    scalars — vectors never pass the aggregate boundary, and cost is
    ∝ |tokens| × |all query tokens| once, not per query.

    Returns (qid_col, doc_col, score, n_q, rk) with rk = 1..k best-first
    per qid (score desc, doc asc tie-break — the bm25_batch contract).
    """
    from custom_vector_database_spark.functions.vector import dot_product, l2_norm

    _guard_maxsim_query_side(
        query_tokens, {doc_col, vec_col},
        [qid_col, qtok_col, qvec_col], qvec_col,
        max_query_tokens, max_broadcast_bytes,
    )
    toks = tokens.select(
        F.col(doc_col), F.col(vec_col), l2_norm(vec_col).alias("__nrm")
    )
    qtoks = query_tokens.select(
        F.col(qid_col), F.col(qtok_col), F.col(qvec_col),
        l2_norm(qvec_col).alias("__qn"),
    )
    denom = F.col("__nrm") * F.col("__qn")
    cos = F.round(
        F.when(denom != 0.0, dot_product(F.col(vec_col), F.col(qvec_col)) / denom),
        6,
    )
    per_qt = (
        toks.crossJoin(F.broadcast(qtoks))
        .select(doc_col, qid_col, qtok_col, cos.alias("__cos"))
        .groupBy(doc_col, qid_col, qtok_col)
        .agg(F.max("__cos").alias("__mx"))
    )
    scored = per_qt.groupBy(qid_col, doc_col).agg(
        F.round(F.sum("__mx"), 6).alias("score"),
        F.count("__mx").alias("n_q"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("score"), F.col(doc_col).asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
