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

from pyspark.sql import DataFrame
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
    # Fixed-order per-term sum: one conditional aggregate per term, added
    # left-to-right — bit-identical to the oracle's identical expression.
    per_term = [
        F.sum(F.when(F.col("token") == t, F.col("s")).otherwise(0.0)).alias(f"s{i}")
        for i, t in enumerate(terms)
    ]
    agg = scored.groupBy(id_col).agg(*per_term)
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.col(f"s{i}")
    return agg.select(F.col(id_col), total.alias("score"))


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
    """
    q_rows = queries.select(query_id, terms_col).collect()  # bounded query side
    all_terms = sorted({t for r in q_rows for t in (r[1] or [])})
    if not all_terms:
        raise ValueError("bm25_batch requires at least one query term")
    if any(len(r[1] or []) > max_terms for r in q_rows):
        raise ValueError(f"a query exceeds max_terms={max_terms}")
    scored = term_scores(docs, all_terms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    qx = queries.select(
        F.col(query_id), F.posexplode(terms_col).alias("ti", "token")
    )
    j = scored.join(F.broadcast(qx), "token")
    per_pos = [
        F.sum(F.when(F.col("ti") == i, F.col("s")).otherwise(0.0)).alias(f"s{i}")
        for i in range(max_terms)
    ]
    agg = j.groupBy(query_id, id_col).agg(*per_pos)
    total = F.lit(0.0)
    for i in range(max_terms):
        total = total + F.col(f"s{i}")
    ranked = agg.select(
        F.col(query_id), F.col(id_col), F.round(total, 6).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(id_col).asc())
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
