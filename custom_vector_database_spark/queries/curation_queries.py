"""Corpus-curation queries (operators/curation.py): domain-mixture
resampling, token-budget sequence packing, cross-document boilerplate
detection, and embedding outlier audit — the post-filtering verbs of an
LLM training-data pipeline, all exactly oracle-checked (no guarantee
booleans needed: every operator here is deterministic integer/md5/fixed-
fold arithmetic by construction).

Tokenization and fold order mirror the text_queries oracles; budget
arithmetic is integer (div/floor) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import curation as cu
from custom_vector_database_spark.queries_registry import load, load_spread, register

_DUCK_TOKS = "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x != '')"
_DUCK_SH5 = (
    "CASE WHEN len({t}) >= 5 THEN list_distinct(list_transform("
    "range(1, len({t}) - 3), i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2]"
    " || ' ' || {t}[i+3] || ' ' || {t}[i+4])) ELSE [] END"
)

# ---------------------------------------------------------------------------
# Domain-mixture resampling: "4 parts en, 2 fr, 2 de, 1 es, 1 zh" — the
# data-mixture step. Quota arithmetic is pure integer division; row
# selection is md5-rank within stratum — both engines select the SAME rows.
# ---------------------------------------------------------------------------
_MIX_WEIGHTS = {"en": 4, "fr": 2, "de": 2, "es": 1, "zh": 1}
_MIX_W = sum(_MIX_WEIGHTS.values())
_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_WEIGHTS.items())


@register(
    "mixture_resample_docs",
    f"""
    WITH wts(lang, w) AS (VALUES {_MIX_VALUES}),
    present AS (
      SELECT d.lang, COUNT(*) AS cnt
      FROM documents d JOIN wts w ON d.lang = w.lang
      GROUP BY d.lang),
    counts AS (
      -- LEFT join from the weight table, mirroring the operator: a
      -- weighted stratum with zero rows counts 0 -> N = 0 (exact
      -- proportions unsatisfiable -> empty selection)
      SELECT w.lang, w.w, COALESCE(p.cnt, 0) AS cnt
      FROM wts w LEFT JOIN present p ON w.lang = p.lang),
    n AS (SELECT MIN(cnt * {_MIX_W} // w) AS n_total FROM counts),
    takes AS (SELECT lang, (w * n_total) // {_MIX_W} AS take
              FROM counts CROSS JOIN n),
    ranked AS (
      SELECT d.lang, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY d.lang
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
      FROM documents d JOIN wts USING (lang)),
    sel AS (SELECT r.* FROM ranked r
            JOIN takes t ON r.lang = t.lang AND r.rk <= t.take)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM sel GROUP BY lang ORDER BY lang
    """,
)
def q_mixture_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    sel = cu.mixture_resample(
        docs, stratum_col="lang", key_col="doc_id", weights=_MIX_WEIGHTS
    )
    return (
        sel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing (concat-and-chunk, budget 256): per-lang
# shards, documents in doc_id order; a doc belongs to the sequence where it
# starts. One running-sum window per shard — embarrassingly parallel across
# shards, the way production tokenizer pipelines pack.
# ---------------------------------------------------------------------------
_PACK_BUDGET = 256


@register(
    "pack_sequences_docs",
    f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_TOKS.format(c="text")}) AS n_tokens
      FROM documents),
    c AS (
      SELECT lang, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS tokens_before
      FROM t)
    SELECT lang, CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM c GROUP BY lang, seq_id ORDER BY lang, seq_id
    """,
)
def q_pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    packed = cu.pack_sequences(
        docs, shard_col="lang", order_col="doc_id", budget=_PACK_BUDGET
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate: a 5-gram in >= 3 distinct docs is template
# text. Complements repetition_ratio (intra-doc) and the dedup family
# (whole-doc): this is the shared-snippet rule.
#
# Round 12: the row also carries the CDC near-dup certification (cdc_ok
# — the driver-visibility play for r11's flagship codec-free payload
# member, r11 verdict item 4): a bounded 3-payload fixture (corpus =
# doc 0's bytes; delta = doc 0 RE-CONTAINERED behind a retagged
# header/trailer, which must DROP at >= 50% shared content-defined
# chunks, and doc 1 reversed, content-fresh, which must KEEP) is chunked
# through the SAME rolling-hash chunker the ingest member uses
# (multimodal.payload_cdc_chunks) and the drop verdict recomputed; the
# oracle re-derives every boundary/chunk-md5/containment verdict via
# payload_cdc_chunks_duck — both engines run the identical integer
# polynomial, so the boolean is exact, never a literal TRUE. One extra
# Spark job over 3 literal-derived rows; the full sidecar/claims/replay
# machinery stays priced in stream_payload_cdc_ingest and
# tests/test_cdc_ingest.py.
# ---------------------------------------------------------------------------
def _boiler_oracle() -> str:
    from custom_vector_database_spark.operators.multimodal import (
        payload_cdc_chunks_duck,
    )

    ch = payload_cdc_chunks_duck("p")
    return f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS toks FROM documents),
    s AS (SELECT doc_id, {_DUCK_SH5.format(t="toks")} AS sh FROM t),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    boiler AS (SELECT shingle FROM (
        SELECT shingle, COUNT(*) AS dfreq FROM inv GROUP BY shingle)
      WHERE dfreq >= 3),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM inv GROUP BY doc_id),
    bc AS (SELECT i.doc_id, COUNT(*) AS n_boiler
           FROM inv i JOIN boiler b ON i.shingle = b.shingle GROUP BY i.doc_id),
    cdcp AS (
      SELECT 0 AS pid, encode(text) AS p FROM documents WHERE doc_id = 0
      UNION ALL
      SELECT 1, encode('RIFFHDR00001' || text || 'TRAILER0')
      FROM documents WHERE doc_id = 0
      UNION ALL
      SELECT 2, encode(reverse(text)) FROM documents WHERE doc_id = 1
    ),
    cdch0 AS (SELECT pid, list_distinct({ch}) AS chs FROM cdcp),
    cdch AS (SELECT pid, len(chs) AS n, unnest(chs) AS fp FROM cdch0),
    cdcdrop AS (
      SELECT d.pid FROM cdch d JOIN cdch c ON d.fp = c.fp AND c.pid = 0
      WHERE d.pid > 0
      GROUP BY d.pid, d.n HAVING COUNT(*) * 100 >= 50 * d.n),
    cdcok AS (SELECT (COUNT(*) = 1 AND MIN(pid) = 1) AS cdc_ok FROM cdcdrop)
    SELECT d.doc_id,
           COALESCE(t.n_shingles, 0) AS n_shingles,
           COALESCE(bc.n_boiler, 0) AS n_boiler,
           round(CASE WHEN COALESCE(t.n_shingles, 0) > 0
                 THEN CAST(COALESCE(bc.n_boiler, 0) AS DOUBLE) / t.n_shingles
                 ELSE 0.0 END, 6) AS boiler_frac,
           (SELECT cdc_ok FROM cdcok) AS cdc_ok
    FROM documents d
    LEFT JOIN totals t USING (doc_id) LEFT JOIN bc USING (doc_id)
    ORDER BY d.doc_id
    """


@register("boilerplate_ngram_stats", _boiler_oracle())
def q_boilerplate_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.multimodal import (
        payload_cdc_chunks,
    )

    docs = load_spread(spark, sf_dir, "documents")
    out = cu.boilerplate_ngrams(
        docs, id_col="doc_id", text_col="text", n=5, min_docs=3
    ).orderBy("doc_id")

    # --- CDC re-container drop certification (bounded: 3 payloads) ---
    # ONE pushed-down point read collects the two source texts; the
    # 3-row fixture is then a literal single-partition frame, so the
    # distributed chunker+verdict below costs two tiny jobs instead of
    # inheriting load_spread's repartition through three union branches
    # (measured 12 s -> ~1 s on a loaded box)
    two = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") < 2)
        .select("doc_id", "text").collect()
    }
    fixture = spark.createDataFrame(
        [
            (0, two[0], False),
            (1, "RIFFHDR00001" + two[0] + "TRAILER0", False),
            # reversed IN SPARK: the Spark-reverse == DuckDB-reverse
            # pairing is what stream_payload_cdc_ingest's oracle already
            # proves; a Python [::-1] could diverge on non-ASCII
            (2, two[1], True),
        ],
        "pid int, t string, rev boolean",
    ).select(
        "pid",
        F.encode(
            F.when(F.col("rev"), F.reverse(F.col("t"))).otherwise(F.col("t")),
            "UTF-8",
        ).cast("binary").alias("payload"),
    )
    ch = fixture.select(
        "pid",
        F.array_distinct(payload_cdc_chunks("payload")).alias("chs"),
    ).select(
        "pid", F.size("chs").cast("long").alias("n"),
        F.explode("chs").alias("fp"),
    )
    d, c = ch.alias("d"), ch.alias("c")
    dropped = sorted(
        r["pid"]
        for r in (
            d.filter(F.col("d.pid") > 0)
            .join(c.filter(F.col("c.pid") == 0).select("fp"), "fp")
            .groupBy(F.col("d.pid").alias("pid"), F.col("d.n").alias("n"))
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") * 100 >= 50 * F.col("n"))
            .select("pid")
            .collect()
        )
    )
    # exactly the re-containered payload drops; the content-fresh keeps
    cdc_ok = dropped == [1]
    return out.withColumn("cdc_ok", F.lit(bool(cdc_ok)))


# ---------------------------------------------------------------------------
# Embedding outlier audit: top-5 farthest-from-centroid vectors per label.
# Centroids from exact integer micro-sums (order-independent); per-row
# distance is a fixed-order codegen fold — round(6) makes it hash-exact.
# ---------------------------------------------------------------------------
@register(
    "embedding_outliers",
    """
    WITH e AS (
      SELECT label, UNNEST(embedding) AS val,
             UNNEST(generate_series(1, len(embedding))) AS i
      FROM embeddings),
    m AS (
      SELECT label, i, COUNT(*) AS n,
             SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS s
      FROM e GROUP BY label, i),
    c AS (
      SELECT label, MAX(n) AS n,
             list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                  ORDER BY i) AS centroid
      FROM m GROUP BY label),
    d AS (
      SELECT v.label, v.vec_id,
             round(list_reduce(list_transform(list_zip(v.embedding, c.centroid),
                     p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
                   (acc, x) -> acc + x), 6) AS dist2
      FROM embeddings v JOIN c USING (label)),
    r AS (
      SELECT label, vec_id, dist2,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vec_id) AS rk
      FROM d)
    SELECT label, vec_id, dist2, rk FROM r WHERE rk <= 5
    ORDER BY label, rk
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return cu.centroid_outliers(
        emb, id_col="vec_id", vec_col="embedding", label_col="label", k=5
    ).orderBy("label", "rk")


# ---------------------------------------------------------------------------
# Length-bucketed batching: ntile(4) over token count within each lang
# shard; per-bucket padding waste under pad-to-longest. Exact window
# arithmetic -> exact oracle.
# ---------------------------------------------------------------------------
@register(
    "length_bucket_batches",
    f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_TOKS.format(c="text")}) AS n_tokens
      FROM documents),
    b AS (
      SELECT lang, doc_id, n_tokens,
             ntile(4) OVER (PARTITION BY lang ORDER BY n_tokens, doc_id)
               AS bucket
      FROM t)
    SELECT lang, bucket, COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
             AS padding_waste
    FROM b GROUP BY lang, bucket ORDER BY lang, bucket
    """,
)
def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    b = cu.length_buckets(docs, shard_col="lang", n_buckets=4)
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            (F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens"))
            .cast("long")
            .alias("padding_waste"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# Unigram log-probability quality (perplexity proxy). Per-token logprob is
# floor(1e6*ln(count/total)) — ln of an exact integer ratio, floored to
# BIGINT, so per-doc sums are exact integer aggregation in both engines;
# the final average is one IEEE division.
# ---------------------------------------------------------------------------
@register(
    "unigram_logprob_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS.format(c="text")}) AS token
      FROM documents),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    lp AS (
      SELECT token,
             CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000)
                  AS BIGINT) AS lp_micro
      FROM vocab CROSS JOIN tot),
    per_doc AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(lp.lp_micro) AS lp_micro_sum
      FROM toks t JOIN lp ON t.token = lp.token GROUP BY t.doc_id)
    SELECT d.doc_id,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           CAST(COALESCE(p.lp_micro_sum, 0) AS BIGINT) AS lp_micro_sum,
           round(CASE WHEN COALESCE(p.n_tokens, 0) > 0
                 THEN CAST(p.lp_micro_sum AS DOUBLE)
                      / (CAST(p.n_tokens AS DOUBLE) * 1000000)
                 ELSE 0.0 END, 6) AS avg_logprob
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return cu.unigram_logprob(docs, id_col="doc_id", text_col="text").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# PCA dimensionality reduction (operators/pca.py), guarantee-oracle
# pattern: the projection itself is numpy-SVD-seeded (not SQL
# reproducible), so the registered output is a deterministic slice of the
# projected table's identity columns plus one boolean certifying the fit:
# component orthonormality (driver-side, ~1e-15 for a healthy SVD) and the
# FULL-TABLE residual energy fraction under a loose bound (0.92: pure
# isotropic noise would give 1 - k/dim = 0.875 at k=8/dim=64; measured
# 0.795 across sf0.001-0.1, so regenerated data cannot flip it). The
# projection values match numpy exactly (tests/test_curation.py).
# ---------------------------------------------------------------------------
@register(
    "embedding_pca_project",
    """
    SELECT vec_id, label, TRUE AS pca_ok
    FROM embeddings WHERE vec_id < 20
    ORDER BY vec_id
    """,
)
def q_embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators import pca as P
    from custom_vector_database_spark.queries.vector_queries import fitted_pca

    emb = load(spark, sf_dir, "embeddings")
    model = fitted_pca(spark, sf_dir, k=8)
    ok = (
        model.orthonormality_error() < 1e-6
        and P.residual_fraction(emb, model, "embedding") <= 0.92
    )
    proj = emb.select(
        "vec_id", "label", P.project_expr(model, "embedding").alias("proj")
    )
    return (
        proj.filter(F.col("vec_id") < 20)
        .select("vec_id", "label", (F.lit(bool(ok)) & (F.size("proj") == 8)).alias("pca_ok"))
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# The END-TO-END curation pipeline as ONE declarative plan: exact dedup ->
# quality gate -> train split -> sequence packing, with per-stage
# accounting (docs + tokens surviving each stage — the yield report every
# corpus pipeline publishes). Each stage reuses the exact operator the
# standalone queries verify (exact_dedup, quality_score, md5-threshold
# split, pack_sequences) AND the oracle composes the SAME shared SQL
# fragments those stages' oracles use (text_queries.DUCK_QUALITY_*,
# pipeline_queries' split threshold) — one definition each, so the
# composed pipeline cannot desynchronize from its standalone stages.
# The Spark side checkpoints the scored and deduped frontiers: a union
# of five stage aggregates otherwise re-derives the shared prefix per
# branch (measured: 13 scans / 29 tokenize evaluations in one plan —
# filter pushdown makes the branch subtrees non-identical, so exchange
# reuse cannot dedupe them).
# ---------------------------------------------------------------------------
_PIPE_QUALITY_MIN = 0.7


def _pipe_oracle() -> str:
    from custom_vector_database_spark.queries.pipeline_queries import (
        _SPLIT_TRAIN_MAX,
    )
    from custom_vector_database_spark.queries.text_queries import (
        DUCK_QUALITY_EXPR,
        DUCK_QUALITY_M_CTES,
    )

    return f"""
    WITH {DUCK_QUALITY_M_CTES},
    scored AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             {DUCK_QUALITY_EXPR} AS quality
      FROM m),
    fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[ ]+', ' ', 'g'))) AS fingerprint
      FROM documents),
    reps AS (SELECT fingerprint, MIN(doc_id) AS rep_id FROM fp GROUP BY fingerprint),
    dedup AS (
      SELECT s.* FROM scored s
      JOIN fp ON s.doc_id = fp.doc_id
      JOIN reps ON fp.fingerprint = reps.fingerprint AND s.doc_id = reps.rep_id),
    qual AS (SELECT * FROM dedup WHERE quality >= {_PIPE_QUALITY_MIN}),
    train AS (
      SELECT * FROM qual
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) < {_SPLIT_TRAIN_MAX}),
    packed AS (
      SELECT lang,
             CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // 256 AS BIGINT) AS seq_id,
             n_tokens
      FROM train),
    stages AS (
      SELECT '0_raw' AS stage, COUNT(*) AS n, CAST(SUM(n_tokens) AS BIGINT) AS tokens FROM scored
      UNION ALL
      SELECT '1_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM dedup
      UNION ALL
      SELECT '2_quality', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM qual
      UNION ALL
      SELECT '3_train', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM train
      UNION ALL
      SELECT '4_packed', COUNT(*), CAST(SUM(tokens) AS BIGINT) FROM (
        SELECT lang, seq_id, SUM(n_tokens) AS tokens FROM packed GROUP BY lang, seq_id))
    SELECT stage, n AS n_docs, tokens AS n_tokens FROM stages ORDER BY stage
    """


@register("corpus_curation_pipeline", _pipe_oracle())
def q_corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators import dedup as dd
    from custom_vector_database_spark.operators import text as tx
    from custom_vector_database_spark.operators.text import tokenize
    from custom_vector_database_spark.queries.pipeline_queries import (
        _SPLIT_TRAIN_MAX,
    )

    docs = load_spread(spark, sf_dir, "documents")
    # checkpoint the scored frontier: FIVE stage aggregates consume it
    # below, and without the barrier each union branch re-runs tokenize +
    # quality over the full scan (13 scans / 29 tokenize evals measured)
    scored = docs.select(
        "doc_id", "lang", "text",
        F.size(tokenize("text")).alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
    ).localCheckpoint(eager=True)
    deduped = scored.join(
        dd.exact_dedup(docs).filter(F.col("is_dup") == 0).select("doc_id"),
        "doc_id",
    ).localCheckpoint(eager=True)  # four consumers below
    qual = deduped.filter(F.col("quality") >= _PIPE_QUALITY_MIN)
    h60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    train = qual.filter(h60 < F.lit(_SPLIT_TRAIN_MAX))
    packed = cu.pack_sequences(train, shard_col="lang", order_col="doc_id", budget=256)
    seqs = packed.groupBy("lang", "seq_id").agg(F.sum("n_tokens").alias("tokens"))

    def stage(df, name, tok_col="n_tokens"):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).alias("n_tokens"),
        )

    out = (
        stage(scored, "0_raw")
        .unionAll(stage(deduped, "1_dedup"))
        .unionAll(stage(qual, "2_quality"))
        .unionAll(stage(train, "3_train"))
        .unionAll(stage(seqs, "4_packed", tok_col="tokens"))
    )
    return out.orderBy("stage")


# ---------------------------------------------------------------------------
# Embedding drift monitor: per-label centroid shift between two snapshots
# (here: the even/odd vec_id halves as deterministic proxy snapshots —
# production would pass yesterday's and today's tables). Centroids from
# exact integer micro-sums; the shift is a fixed-order fold over the two
# centroid arrays -> round(6) hash-exact. The ML-ops alarm for embedding-
# model or upstream-data changes silently rotating the vector space.
# ---------------------------------------------------------------------------
@register(
    "embedding_drift",
    """
    WITH e AS (
      SELECT label, vec_id % 2 AS snap, UNNEST(embedding) AS val,
             UNNEST(generate_series(1, len(embedding))) AS i
      FROM embeddings),
    m AS (
      SELECT label, snap, i, COUNT(*) AS n,
             SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS s
      FROM e GROUP BY label, snap, i),
    c AS (
      SELECT label, snap,
             list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                  ORDER BY i) AS centroid,
             MAX(n) AS n
      FROM m GROUP BY label, snap),
    j AS (
      SELECT a.label, a.n AS n_a, b.n AS n_b,
             round(sqrt(list_reduce(list_transform(list_zip(a.centroid, b.centroid),
                     p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, x) -> acc + x)), 6)
               AS centroid_shift
      FROM c a JOIN c b ON a.label = b.label AND a.snap = 0 AND b.snap = 1)
    SELECT label, n_a, n_b, centroid_shift FROM j ORDER BY label
    """,
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.curation import label_centroids

    emb = load(spark, sf_dir, "embeddings")
    # ONE explode pass computes both snapshots' centroids (composite
    # grouping); the self-join below is over the tiny centroid aggregate
    # (n_labels x 2 rows), never the vector table
    cents = label_centroids(
        emb.withColumn("snap", F.col("vec_id") % 2), label_col=["label", "snap"]
    )
    a = cents.filter(F.col("snap") == 0).drop("snap").alias("a")
    b = cents.filter(F.col("snap") == 1).drop("snap").alias("b")
    shift = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("a.centroid"),
                    F.col("b.centroid"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        6,
    )
    return (
        a.join(b, F.col("a.label") == F.col("b.label"))
        .select(
            F.col("a.label").alias("label"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            shift.alias("centroid_shift"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Join-key skew report: the diagnostic that decides when a key needs
# salting (operators/skew.salted_join) — per-key frequency for the top
# keys plus the table-wide max/avg skew ratio. One map-side-combined
# count per key; the ratio divides two exact integers.
# ---------------------------------------------------------------------------
@register(
    "key_skew_report",
    """
    WITH f AS (SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
    stats AS (SELECT MAX(cnt) AS max_cnt, COUNT(*) AS n_keys,
                     CAST(SUM(cnt) AS BIGINT) AS n_rows FROM f)
    SELECT f.key, f.cnt,
           round(CAST(f.cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_ratio,
           n_rows, n_keys
    FROM f CROSS JOIN stats
    ORDER BY f.cnt DESC, f.key ASC
    LIMIT 20
    """,
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("key"))
    f = li.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    stats = f.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    return (
        f.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("skew_ratio"),
            "n_rows",
            "n_keys",
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Per-source cap (round 6): the Gopher/C4-style domain-cap rule — at most
# 10 documents per source, drawn deterministically by md5(doc_id) rank.
# Audit output per source: total, kept, and an id checksum pinning the
# exact kept set (the draw, not just its size, must match the oracle).
# ---------------------------------------------------------------------------
@register(
    "source_cap_docs",
    """
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE rk <= 10) AS n_kept,
           CAST(SUM(doc_id) FILTER (WHERE rk <= 10) AS BIGINT) AS kept_id_checksum
    FROM r GROUP BY source ORDER BY source
    """,
)
def q_source_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    kept = cu.cap_per_group(docs, group_col="source", cap=10, id_col="doc_id")
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_id_checksum"),
    )
    return (
        totals.join(kept_agg, "source")
        .select("source", "n_total", "n_kept", "kept_id_checksum")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Dataset-card corpus report (round 6): the one-pass summary a corpus
# release ships — per-language, per-source, and overall: document and
# token counts, exact-duplicate rate, and mean quality — composed from
# the already-oracled primitives in ONE GROUPING SETS aggregate (no
# three-pass union). Quality averages via floor(q·1e6) micro-integers so
# the mean is an exact BIGINT ratio in any engine (float sums are
# fold-order-dependent; integer sums are not).
# ---------------------------------------------------------------------------
def _corpus_stats_oracle() -> str:
    from custom_vector_database_spark.queries.text_queries import (
        DUCK_QUALITY_EXPR,
        DUCK_QUALITY_M_CTES,
    )

    return f"""
    WITH {DUCK_QUALITY_M_CTES},
    q AS (SELECT doc_id, {DUCK_QUALITY_EXPR} AS quality FROM m),
    fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[ ]+', ' ', 'g'))) AS f
      FROM documents),
    reps AS (SELECT f, MIN(doc_id) AS rep_id FROM fp GROUP BY f),
    base AS (
      SELECT d.lang, d.source,
             len(list_filter(string_split_regex(lower(d.text), '[^a-z0-9]+'),
                 x -> x != '')) AS n_tokens,
             CAST(floor(q.quality * 1000000) AS BIGINT) AS q_micro,
             CASE WHEN fp.doc_id != r.rep_id THEN 1 ELSE 0 END AS is_dup
      FROM documents d
      JOIN q ON d.doc_id = q.doc_id
      JOIN fp ON d.doc_id = fp.doc_id
      JOIN reps r ON fp.f = r.f)
    SELECT CASE WHEN GROUPING(lang) = 0 THEN 'lang'
                WHEN GROUPING(source) = 0 THEN 'source'
                ELSE 'all' END AS level,
           COALESCE(CASE WHEN GROUPING(lang) = 0 THEN lang ELSE source END,
                    '*') AS key,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(is_dup) AS BIGINT) AS n_exact_dups,
           CAST(SUM(q_micro) AS BIGINT) AS quality_micro_sum
    FROM base
    GROUP BY GROUPING SETS ((lang), (source), ())
    ORDER BY level, key
    """


@register("corpus_stats_report", _corpus_stats_oracle())
def q_corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators import dedup as dd
    from custom_vector_database_spark.operators import text as tx

    docs = load_spread(spark, sf_dir, "documents")
    flags = dd.exact_dedup(docs).select("doc_id", "is_dup")
    t = docs.join(flags, "doc_id").select(
        "lang", "source",
        tx.token_count("text").alias("n_tokens"),
        F.floor(tx.quality_score("text") * 1e6).cast("long").alias("q_micro"),
        F.col("is_dup").cast("long").alias("is_dup"),
    )
    t.createOrReplaceTempView("__csr_t")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(lang) = 0 THEN 'lang'
                    WHEN GROUPING(source) = 0 THEN 'source'
                    ELSE 'all' END AS level,
               COALESCE(CASE WHEN GROUPING(lang) = 0 THEN lang
                        ELSE source END, '*') AS key,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(is_dup) AS BIGINT) AS n_exact_dups,
               CAST(SUM(q_micro) AS BIGINT) AS quality_micro_sum
        FROM __csr_t
        GROUP BY GROUPING SETS ((lang), (source), ())
        ORDER BY level, key
        """
    )


# ---------------------------------------------------------------------------
# Bigram LM quality (round 6): add-one-smoothed transition log-
# likelihood — the second-order sibling of unigram_logprob_quality,
# catching word-salad documents whose individual words are common but
# whose transitions are not. Same micro-integer contract: per-bigram
# floor(1e6·ln P) so every per-doc sum is an exact BIGINT in any engine.
# ---------------------------------------------------------------------------
@register(
    "bigram_logprob_quality",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS toks FROM documents),
    big AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]) ELSE [] END) AS bigram
      FROM t),
    bcnt AS (SELECT bigram, COUNT(*) AS c2 FROM big GROUP BY bigram),
    lcnt AS (
      SELECT string_split(bigram, ' ')[1] AS w1, SUM(c2) AS c1
      FROM bcnt GROUP BY 1),
    v AS (
      SELECT COUNT(DISTINCT tok) AS v FROM (
        SELECT unnest(toks) AS tok FROM t)),
    lp AS (
      SELECT b.bigram,
             CAST(floor(ln(CAST(b.c2 + 1 AS DOUBLE) / CAST(l.c1 + v.v AS DOUBLE))
                  * 1000000) AS BIGINT) AS lp_micro
      FROM bcnt b
      JOIN lcnt l ON string_split(b.bigram, ' ')[1] = l.w1
      CROSS JOIN v),
    per_doc AS (
      SELECT g.doc_id, COUNT(*) AS n_bigrams, SUM(lp.lp_micro) AS lp_micro_sum
      FROM big g JOIN lp ON g.bigram = lp.bigram GROUP BY g.doc_id)
    SELECT d.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           CAST(COALESCE(p.lp_micro_sum, 0) AS BIGINT) AS lp_micro_sum,
           round(CASE WHEN COALESCE(p.n_bigrams, 0) > 0
                 THEN CAST(p.lp_micro_sum AS DOUBLE)
                      / (CAST(p.n_bigrams AS DOUBLE) * 1000000)
                 ELSE 0.0 END, 6) AS avg_logprob
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return cu.bigram_logprob(docs, id_col="doc_id", text_col="text").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Curation pipeline v2 (round 6): the domain-governance front half the
# v1 pipeline lacks — per-source caps FIRST (a mega-crawl domain cannot
# dominate anything downstream), then exact dedup, quality gate,
# md5-threshold train split, token packing; ONE declarative plan with
# per-stage doc/token yield accounting, oracle = the standalone stages'
# fragments chained. Stage order matters and is part of the contract:
# caps before dedup means a capped-out duplicate cannot crowd a kept
# slot (the draw is over raw rows).
# ---------------------------------------------------------------------------
def _pipe_v2_oracle() -> str:
    from custom_vector_database_spark.queries.pipeline_queries import (
        _SPLIT_TRAIN_MAX,
    )
    from custom_vector_database_spark.queries.text_queries import (
        DUCK_QUALITY_EXPR,
        DUCK_QUALITY_M_CTES,
    )

    return f"""
    WITH {DUCK_QUALITY_M_CTES},
    scored AS (
      SELECT m.doc_id, m.lang, len(m.toks) AS n_tokens,
             {DUCK_QUALITY_EXPR} AS quality, d.source
      FROM m JOIN documents d ON m.doc_id = d.doc_id),
    capped AS (
      SELECT s.* FROM scored s JOIN (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents) WHERE rk <= 10) c ON s.doc_id = c.doc_id),
    fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[ ]+', ' ', 'g'))) AS f
      FROM documents),
    reps AS (
      SELECT f.f, MIN(f.doc_id) AS rep_id
      FROM fp f JOIN capped c ON f.doc_id = c.doc_id GROUP BY f.f),
    dedup AS (
      SELECT c.* FROM capped c
      JOIN fp ON c.doc_id = fp.doc_id
      JOIN reps r ON fp.f = r.f AND c.doc_id = r.rep_id),
    qual AS (SELECT * FROM dedup WHERE quality >= {_PIPE_QUALITY_MIN}),
    train AS (
      SELECT * FROM qual
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) < {_SPLIT_TRAIN_MAX}),
    packed AS (
      SELECT lang,
             CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // 256 AS BIGINT) AS seq_id,
             n_tokens
      FROM train),
    stages AS (
      SELECT '0_raw' AS stage, COUNT(*) AS n,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens FROM scored
      UNION ALL
      SELECT '1_capped', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM capped
      UNION ALL
      SELECT '2_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM dedup
      UNION ALL
      SELECT '3_quality', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM qual
      UNION ALL
      SELECT '4_train', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM train
      UNION ALL
      SELECT '5_packed', COUNT(*), CAST(SUM(tokens) AS BIGINT) FROM (
        SELECT lang, seq_id, SUM(n_tokens) AS tokens
        FROM packed GROUP BY lang, seq_id))
    SELECT stage, n AS n_docs, tokens AS n_tokens FROM stages ORDER BY stage
    """


@register("corpus_curation_pipeline_v2", _pipe_v2_oracle())
def q_corpus_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators import dedup as dd
    from custom_vector_database_spark.operators import text as tx
    from custom_vector_database_spark.operators.text import tokenize
    from custom_vector_database_spark.queries.pipeline_queries import (
        _SPLIT_TRAIN_MAX,
    )

    docs = load_spread(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", "source", "text",
        F.size(tokenize("text")).alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
    ).localCheckpoint(eager=True)  # six stage aggregates consume it
    capped = cu.cap_per_group(
        scored, group_col="source", cap=10, id_col="doc_id"
    ).localCheckpoint(eager=True)
    # dedup WITHIN the capped survivors: min-id representative per
    # fingerprint over the capped set (caps first is the contract)
    fps = capped.select(
        "doc_id", tx.fingerprint_md5(F.col("text")).alias("f")
    )
    reps = fps.groupBy("f").agg(F.min("doc_id").alias("rep_id"))
    keep = fps.join(reps, "f").filter(F.col("doc_id") == F.col("rep_id"))
    deduped = capped.join(keep.select("doc_id"), "doc_id").localCheckpoint(
        eager=True
    )
    qual = deduped.filter(F.col("quality") >= _PIPE_QUALITY_MIN)
    h60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    train = qual.filter(h60 < F.lit(_SPLIT_TRAIN_MAX))
    packed = cu.pack_sequences(
        train, shard_col="lang", order_col="doc_id", budget=256
    )
    seqs = packed.groupBy("lang", "seq_id").agg(F.sum("n_tokens").alias("tokens"))

    def stage(df, name, tok_col="n_tokens"):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).alias("n_tokens"),
        )

    out = (
        stage(scored, "0_raw")
        .unionAll(stage(capped, "1_capped"))
        .unionAll(stage(deduped, "2_dedup"))
        .unionAll(stage(qual, "3_quality"))
        .unionAll(stage(train, "4_train"))
        .unionAll(stage(seqs, "5_packed", tok_col="tokens"))
    )
    return out.orderBy("stage")


# ---------------------------------------------------------------------------
# DSIR data selection (Xie et al., NeurIPS 2023): pick the non-English
# pool docs whose hashed unigram+bigram distribution best matches the
# English target corpus, importance-resampled via deterministic
# Gumbel-top-n. Everything is exact BIGINT arithmetic (the
# unigram_logprob micro-integer convention: ln runs once per BUCKET /
# once per doc on exact inputs and is floored, so the per-doc sums and
# the selection key are engine-exact — no float columns in the output).
# ---------------------------------------------------------------------------
_DSIR_BUCKETS = 32
_DSIR_N = 40
# the DuckDB twins live in operators/curation next to the Spark feature
# stream they mirror (one definition for BOTH DSIR oracles — this row's
# and pipeline_queries' gate)
_DSIR_GRAMS = cu.DSIR_GRAMS_DUCK
_DSIR_BUCKET = cu.dsir_bucket_duck(_DSIR_BUCKETS)


@register(
    "dsir_select_docs",
    f"""
    WITH rawd AS (SELECT doc_id, text FROM documents WHERE lang <> 'en'),
    tgt AS (SELECT text FROM documents WHERE lang = 'en'),
    rg AS (
      SELECT doc_id, unnest({_DSIR_GRAMS}) AS gram
      FROM (SELECT doc_id, {_DUCK_TOKS.format(c="text")} AS toks FROM rawd)),
    tg AS (
      SELECT unnest({_DSIR_GRAMS}) AS gram
      FROM (SELECT {_DUCK_TOKS.format(c="text")} AS toks FROM tgt)),
    rb AS (SELECT doc_id, {_DSIR_BUCKET} AS bucket FROM rg),
    tb AS (SELECT {_DSIR_BUCKET} AS bucket FROM tg),
    qc AS (SELECT bucket, COUNT(*) AS c FROM rb GROUP BY bucket),
    pc AS (SELECT bucket, COUNT(*) AS c FROM tb GROUP BY bucket),
    qt AS (SELECT COUNT(*) AS t FROM rb),
    pt AS (SELECT COUNT(*) AS t FROM tb),
    lr AS (
      SELECT s.bucket,
             CAST(floor(1e6 * ln((COALESCE(pc.c, 0) + 1.0)
                                 / (pt.t + {_DSIR_BUCKETS}.0)))
                  - floor(1e6 * ln((COALESCE(qc.c, 0) + 1.0)
                                   / (qt.t + {_DSIR_BUCKETS}.0)))
                  AS BIGINT) AS lr_micro
      FROM (SELECT unnest(range(0, {_DSIR_BUCKETS})) AS bucket) s
      LEFT JOIN pc ON s.bucket = pc.bucket
      LEFT JOIN qc ON s.bucket = qc.bucket
      CROSS JOIN pt CROSS JOIN qt),
    tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM rb
           GROUP BY doc_id, bucket),
    w AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_grams,
                 CAST(SUM(tf * lr_micro) AS BIGINT) AS logw_micro
          FROM tf JOIN lr USING (bucket) GROUP BY doc_id),
    pool AS (
      SELECT r.doc_id, COALESCE(w.n_grams, 0) AS n_grams,
             COALESCE(w.logw_micro, 0) AS logw_micro
      FROM rawd r LEFT JOIN w ON r.doc_id = w.doc_id),
    keyed AS (
      SELECT *,
             logw_micro + CAST(floor(1e6 * -ln(-ln(
               (CAST(concat('0x', substr(md5(concat('dsir',
                     CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0))) AS BIGINT) AS key_micro
      FROM pool)
    SELECT doc_id, n_grams, logw_micro, key_micro
    FROM keyed ORDER BY key_micro DESC, doc_id ASC LIMIT {_DSIR_N}
    """,
)
def q_dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    raw = docs.filter(F.col("lang") != "en").select("doc_id", "text")
    target = docs.filter(F.col("lang") == "en").select("text")
    return cu.dsir_resample(
        raw, target, n=_DSIR_N, num_buckets=_DSIR_BUCKETS, salt="dsir"
    )


# ---------------------------------------------------------------------------
# corpus_curation_pipeline_v3 (round 10): the v2 chain with the stage the
# r9 verdict flagged as missing — DECONTAMINATION — between dedup and the
# quality gate: caps -> exact dedup -> decontaminate -> quality -> split
# -> pack. The decon stage runs SPAN-CUT policy (cut the leaked spans,
# keep the documents — operators/text.decontaminate_span_cut, the same
# operator the standalone decontaminate_span_cut row verifies) and the
# yield table prices BOTH policies side by side: '3_decon_spancut' is the
# chain's real frontier (all docs kept, leaked tokens cut) and
# '3b_decon_docdrop' is the counterfactual (docs with any leak dropped
# whole) — the difference is exactly the yield span-cut surgery saves.
# The holdout is the decontaminate_docs convention (doc_id % 97 == 0,
# excluded from the pipeline corpus) and the leak is PLANTED like the
# span-cut row's fixture (natural 8-gram train/holdout overlap is zero
# in this data): every doc_id % 13 == 1 train doc gets the first 20
# tokens of the lowest-id holdout doc appended, both engines building
# the identical contaminated corpus. Quality is scored on the PRE-cut
# text: the cut rebuilds text from a lossy token stream (no case, no
# punctuation), so re-scoring cleaned text would measure the tokenizer,
# not the prose; the surgery only removes tokens, and n_kept carries its
# effect through every later stage (packing tokenizes the CLEANED text,
# so sequences are budgeted on post-surgery tokens).
#
# The split hash is SALTED ('split' || doc_id) — a fix over v1/v2, found
# composing this row: cap_per_group keeps the smallest-md5(doc_id) docs
# per source and the unsalted split thresholds the SAME md5(doc_id), so
# capped survivors land almost entirely under the 80% train threshold
# (measured: 89/89 at sf0.01 — the split stage was vacuous). Two draws
# in one pipeline must never share a hash; dsir_resample's salt||id
# convention makes them independent.
# ---------------------------------------------------------------------------
def _pipe_v3_oracle() -> str:
    from custom_vector_database_spark.queries.pipeline_queries import (
        _SPLIT_TRAIN_MAX,
    )
    from custom_vector_database_spark.queries.text_queries import (
        _DUCK_GRAMS8,
        _DUCK_ISL,
        _SPAN_N,
        DUCK_QUALITY_EXPR,
        duck_quality_m_ctes,
    )

    toks = _DUCK_TOKS.format(c="text")
    return f"""
    WITH base AS (SELECT doc_id, lang, source, text FROM documents),
    hold AS (SELECT doc_id, text FROM base WHERE doc_id % 97 = 0),
    leak AS (
      -- array_to_string, NOT the span_cut row's list_prepend('') fold:
      -- that fold yields a LEADING space, so 'text || ' ' || l' would
      -- carry a double space the Spark side does not — harmless where
      -- only token streams flow downstream (span_cut), but HERE quality
      -- reads the raw text (length/punct ratios), so the engines must
      -- build byte-identical contaminated text (r10 review finding)
      SELECT array_to_string(toks[1:20], ' ') AS l
      FROM (SELECT {toks} AS toks FROM hold ORDER BY doc_id LIMIT 1)),
    raw AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 13 = 1
                  THEN text || ' ' || (SELECT l FROM leak)
                  ELSE text END AS text
      FROM base WHERE doc_id % 97 != 0),
    {duck_quality_m_ctes(src="raw")},
    scored AS (
      SELECT m.doc_id, m.lang, m.toks, len(m.toks) AS n_tokens,
             {DUCK_QUALITY_EXPR} AS quality, r.source
      FROM m JOIN raw r USING (doc_id)),
    capped AS (
      SELECT s.* FROM scored s JOIN (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM raw) WHERE rk <= 10) c USING (doc_id)),
    fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[ ]+', ' ', 'g'))) AS fpr
      FROM raw),
    reps AS (
      SELECT p.fpr, MIN(p.doc_id) AS rep_id
      FROM fp p JOIN capped c USING (doc_id) GROUP BY p.fpr),
    dedup AS (
      SELECT c.* FROM capped c
      JOIN fp ON c.doc_id = fp.doc_id
      JOIN reps r ON fp.fpr = r.fpr AND c.doc_id = r.rep_id),
    ht AS (SELECT {toks} AS toks FROM hold),
    hs AS (SELECT DISTINCT unnest({_DUCK_GRAMS8.format(t="toks")}) AS gram
           FROM ht),
    s8 AS (SELECT doc_id, {_DUCK_GRAMS8.format(t="toks")} AS grams
           FROM dedup),
    g AS (SELECT doc_id, UNNEST(grams) AS gram,
                 UNNEST(generate_series(1, len(grams))) AS pos
          FROM s8),
    f AS (SELECT g.doc_id, g.pos FROM g JOIN hs USING (gram)),
    {_DUCK_ISL},
    spans AS (
      SELECT doc_id, MIN(pos) AS span_start,
             MAX(pos) + {_SPAN_N - 1} AS span_end
      FROM isl GROUP BY doc_id, island),
    cov AS (
      SELECT doc_id,
             flatten(list(generate_series(span_start, span_end))) AS cov
      FROM spans GROUP BY doc_id),
    decon AS (
      SELECT d.doc_id, d.lang, d.source, d.quality, d.n_tokens,
             CASE WHEN a.cov IS NULL THEN len(d.toks)
                  ELSE len(list_filter(d.toks,
                           (x, i) -> NOT list_contains(a.cov, i)))
             END AS n_kept
      FROM dedup d LEFT JOIN cov a USING (doc_id)),
    qual AS (SELECT * FROM decon WHERE quality >= {_PIPE_QUALITY_MIN}),
    train AS (
      SELECT * FROM qual
      WHERE CAST(concat('0x', substr(md5('split' ||
                 CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) < {_SPLIT_TRAIN_MAX}),
    packed AS (
      SELECT lang,
             CAST((SUM(n_kept) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_kept) // 256 AS BIGINT) AS seq_id,
             n_kept
      FROM train),
    stages AS (
      SELECT '0_raw' AS stage, COUNT(*) AS n,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens FROM scored
      UNION ALL
      SELECT '1_capped', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM capped
      UNION ALL
      SELECT '2_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM dedup
      UNION ALL
      SELECT '3_decon_spancut', COUNT(*), CAST(SUM(n_kept) AS BIGINT)
      FROM decon
      UNION ALL
      SELECT '3b_decon_docdrop', COUNT(*), CAST(SUM(n_tokens) AS BIGINT)
      FROM decon WHERE n_kept = n_tokens
      UNION ALL
      SELECT '4_quality', COUNT(*), CAST(SUM(n_kept) AS BIGINT) FROM qual
      UNION ALL
      SELECT '5_train', COUNT(*), CAST(SUM(n_kept) AS BIGINT) FROM train
      UNION ALL
      SELECT '6_packed', COUNT(*), CAST(SUM(tokens) AS BIGINT) FROM (
        SELECT lang, seq_id, SUM(n_kept) AS tokens
        FROM packed GROUP BY lang, seq_id))
    SELECT stage, n AS n_docs, tokens AS n_tokens FROM stages ORDER BY stage
    """


@register("corpus_curation_pipeline_v3", _pipe_v3_oracle())
def q_corpus_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators import text as tx
    from custom_vector_database_spark.operators.text import tokenize
    from custom_vector_database_spark.queries.pipeline_queries import (
        _SPLIT_TRAIN_MAX,
    )

    docs = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    holdout = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    # the planted leak: a one-row broadcast, both engines build the same
    # contaminated corpus (the decontaminate_span_cut fixture verbatim)
    leak = (
        holdout.orderBy("doc_id")
        .limit(1)
        .select(
            F.array_join(
                F.slice(tokenize(F.col("text")), 1, 20), " "
            ).alias("__leak")
        )
    )
    raw = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .crossJoin(F.broadcast(leak))
        .select(
            "doc_id", "lang", "source",
            F.when(
                F.col("doc_id") % 13 == 1,
                F.concat(F.col("text"), F.lit(" "), F.col("__leak")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    scored = raw.select(
        "doc_id", "lang", "source", "text",
        F.size(tokenize("text")).alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
    ).localCheckpoint(eager=True)  # consumed by caps + every stage row
    capped = cu.cap_per_group(
        scored, group_col="source", cap=10, id_col="doc_id"
    ).localCheckpoint(eager=True)
    fps = capped.select(
        "doc_id", tx.fingerprint_md5(F.col("text")).alias("fpr")
    )
    reps = fps.groupBy("fpr").agg(F.min("doc_id").alias("rep_id"))
    keep = fps.join(reps, "fpr").filter(F.col("doc_id") == F.col("rep_id"))
    deduped = capped.join(keep.select("doc_id"), "doc_id").localCheckpoint(
        eager=True
    )
    # the decontamination stage: span-cut surgery against the holdout —
    # the SAME operator the standalone row verifies, composed unchanged
    cut = tx.decontaminate_span_cut(
        deduped.select("doc_id", "text"), holdout, n=8
    )
    decon = (
        deduped.drop("text")
        .join(cut.select("doc_id", "n_cut", "cleaned"), "doc_id")
        .withColumn("n_kept", F.col("n_tokens") - F.col("n_cut"))
        .localCheckpoint(eager=True)  # five stage rows + pack consume it
    )
    qual = decon.filter(F.col("quality") >= _PIPE_QUALITY_MIN)
    # salted: the cap draw upstream already consumed md5(doc_id) — see
    # the block comment (two draws must never share a hash)
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    train = qual.filter(h60 < F.lit(_SPLIT_TRAIN_MAX))
    # pack on the CLEANED text: its token stream IS the kept tokens, so
    # sequence budgets count post-surgery tokens (n_tokens is recomputed
    # by pack_sequences from text_col — equal to n_kept by construction)
    packed = cu.pack_sequences(
        train, shard_col="lang", order_col="doc_id", budget=256,
        text_col="cleaned",
    )
    seqs = packed.groupBy("lang", "seq_id").agg(
        F.sum("n_tokens").alias("tokens")
    )

    def stage(df, name, tok_col="n_tokens"):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).alias("n_tokens"),
        )

    out = (
        stage(scored, "0_raw")
        .unionAll(stage(capped, "1_capped"))
        .unionAll(stage(deduped, "2_dedup"))
        .unionAll(stage(decon, "3_decon_spancut", tok_col="n_kept"))
        .unionAll(stage(decon.filter(F.col("n_cut") == 0), "3b_decon_docdrop"))
        .unionAll(stage(qual, "4_quality", tok_col="n_kept"))
        .unionAll(stage(train, "5_train", tok_col="n_kept"))
        .unionAll(stage(seqs, "6_packed", tok_col="tokens"))
    )
    return out.orderBy("stage")
