"""Large-scale-pipeline operators round 2, batch 2: BM25 retrieval,
bloom-pruned joins, blocked fuzzy-match entity resolution, order-independent
table fingerprints, and time-decayed aggregates.

Float determinism notes per query are inline; the shared contract is
queries/__init__.py. All five are oracle-checked — the bloom query's oracle
is the *plain* semi-join (the bloom pass is a semantics-preserving
prefilter, so the answers must be identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import bloom as bl
from custom_vector_database_spark.operators import ranking as rk
from custom_vector_database_spark.queries_registry import load, load_spread, register

# ---------------------------------------------------------------------------
# BM25 document ranking. Tokenization + formula mirrored in the oracle; the
# per-doc score is a fixed-order sum of per-term conditional sums (each has
# ≤1 nonzero element, so partial-agg order cannot change it); round(6)
# absorbs any last-ulp ln() divergence between libm and the JVM.
# ---------------------------------------------------------------------------
_BM25_TERMS = ["spark", "join", "filter"]
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"


@register(
    "bm25_top_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS dl, unnest({_DUCK_TOKS}) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, dl, token, COUNT(*) AS tf FROM toks
      WHERE token IN ('spark', 'join', 'filter')
      GROUP BY doc_id, dl, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len({_DUCK_TOKS})) AS sum_dl FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.5)
               / (tf + 1.5 * (0.25 + 0.75 * dl / (sum_dl / n_docs))) AS s
      FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    ), agg AS (
      SELECT doc_id,
             SUM(CASE WHEN token = 'spark'  THEN s ELSE 0.0 END) AS s0,
             SUM(CASE WHEN token = 'join'   THEN s ELSE 0.0 END) AS s1,
             SUM(CASE WHEN token = 'filter' THEN s ELSE 0.0 END) AS s2
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, round(0.0 + s0 + s1 + s2, 6) AS score
    FROM agg ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q_bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return (
        rk.bm25(docs, _BM25_TERMS)
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical ranking + exact dense ranking fused with
# reciprocal-rank fusion — the production RAG retrieval verb (lexical recall
# + semantic recall, rank-level fusion so the two score scales never mix).
# Both legs are bounded top-50 slices before fusion; the fusion itself is
# O(50) regardless of corpus size. Ranks are deterministic (round-6 scores,
# id tie-breaks), so the RRF sum is engine-exact.
# ---------------------------------------------------------------------------
# the ONE definition of the oracle L2 fold lives in vector_queries
from custom_vector_database_spark.queries.vector_queries import (  # noqa: E402
    _DUCK_L2SQ as _DUCK_L2SQ_H,
)


@register(
    "hybrid_rrf_retrieval",
    f"""
    WITH toks AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS dl, unnest({_DUCK_TOKS}) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, dl, token, COUNT(*) AS tf FROM toks
      WHERE token IN ('spark', 'join', 'filter')
      GROUP BY doc_id, dl, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len({_DUCK_TOKS})) AS sum_dl FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.5)
               / (tf + 1.5 * (0.25 + 0.75 * dl / (sum_dl / n_docs))) AS s
      FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    ), agg AS (
      SELECT doc_id,
             SUM(CASE WHEN token = 'spark'  THEN s ELSE 0.0 END) AS s0,
             SUM(CASE WHEN token = 'join'   THEN s ELSE 0.0 END) AS s1,
             SUM(CASE WHEN token = 'filter' THEN s ELSE 0.0 END) AS s2
      FROM scored GROUP BY doc_id
    ), lex AS (
      SELECT doc_id, round(0.0 + s0 + s1 + s2, 6) AS score
      FROM agg ORDER BY score DESC, doc_id LIMIT 50
    ), lexr AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM lex
    ), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), dense AS (
      SELECT e.vec_id AS doc_id,
             round({_DUCK_L2SQ_H.format(a="e.embedding", b="q.qv")}, 6) AS dist_sq
      FROM embeddings e CROSS JOIN q
      ORDER BY dist_sq ASC, doc_id ASC LIMIT 50
    ), denser AS (
      SELECT doc_id, row_number() OVER (ORDER BY dist_sq ASC, doc_id) AS dense_rank
      FROM dense
    )
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.lex_rank AS lex_rank, d.dense_rank AS dense_rank,
           round(COALESCE(1.0 / (60.0 + l.lex_rank), 0.0) +
                 COALESCE(1.0 / (60.0 + d.dense_rank), 0.0), 6) AS rrf_score
    FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id
    ORDER BY rrf_score DESC, doc_id ASC LIMIT 15
    """,
)
def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from custom_vector_database_spark.operators import knn as knn_ops

    docs = load_spread(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    lex = (
        rk.bm25(docs, _BM25_TERMS)
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(50)
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.col("doc_id").asc()))
        .alias("rank"),
    )
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    dense = knn_ops.knn(emb, qdf, k=50, id_col="vec_id", vec_col="embedding")
    denser = dense.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("dist_sq").asc(), F.col("vec_id").asc()))
        .alias("rank"),
    )
    fused = rk.rrf_fuse([lexr, denser], id_col="doc_id", k=60.0, topk=15)
    return fused.select(
        "doc_id",
        F.col("rank_0").alias("lex_rank"),
        F.col("rank_1").alias("dense_rank"),
        "rrf_score",
    )


# ---------------------------------------------------------------------------
# Bloom-pruned semi join: revenue by month for AUTOMOBILE-segment customers.
# The bloom filter prunes the orders scan before the exact semi join; the
# oracle is the plain semi join — identical answers or the operator is wrong.
# ---------------------------------------------------------------------------
@register(
    "bloom_pruned_revenue",
    """
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    GROUP BY month ORDER BY month
    """,
)
def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    orders = load(spark, sf_dir, "orders")
    bf = bl.bloom_build(cust, "c_custkey")
    pruned = bl.bloom_prune(orders, "o_custkey", bf)
    exact = pruned.join(  # false-positive cleanup: exact semi join
        F.broadcast(cust.select("c_custkey")),
        pruned["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    return (
        exact.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy-match entity resolution over part names: dedupe the DISTINCT
# name strings (low-cardinality canonicalization — the candidate-pair space
# is |block|², never |table|²), block on the trailing token, keep pairs
# within edit distance 4. Integer distances → exact oracle parity.
# ---------------------------------------------------------------------------
@register(
    "fuzzy_part_name_pairs",
    """
    WITH names AS (
      SELECT p_name AS name, (string_split(p_name, ' '))[-1] AS block,
             COUNT(*) AS n_parts
      FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS lev,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 4
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").alias("n_parts"))
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    lev = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(lev <= 4)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            lev.alias("lev"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Order-independent table fingerprint (anti-entropy / replica-diff check):
# per-row md5 of a canonical serialization → 60-bit int → bit_xor + count.
# XOR is commutative/associative, so the fingerprint is partition- and
# order-independent — one map-side-combined aggregation at any scale.
# Doubles are serialized via DECIMAL(18,2), timestamps via unix micros, so
# the byte strings are engine-independent.
# ---------------------------------------------------------------------------
@register(
    "table_fingerprint",
    """
    WITH o AS (
      SELECT CAST(concat('0x', substr(md5(concat_ws('|', o_orderkey, o_custkey,
               o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
               epoch_us(o_orderdate), o_orderpriority)), 1, 15)) AS BIGINT) AS h
      FROM orders
    ), c AS (
      SELECT CAST(concat('0x', substr(md5(concat_ws('|', c_custkey, c_name,
               c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
               c_mktsegment)), 1, 15)) AS BIGINT) AS h
      FROM customer
    )
    SELECT 'orders' AS tbl, bit_xor(h) AS fingerprint, COUNT(*) AS n_rows FROM o
    UNION ALL
    SELECT 'customer' AS tbl, bit_xor(h) AS fingerprint, COUNT(*) AS n_rows FROM c
    ORDER BY tbl
    """,
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(df: DataFrame, tbl: str, serial: F.Column) -> DataFrame:
        h = F.conv(F.substring(F.md5(serial), 1, 15), 16, 10).cast("long")
        return df.select(h.alias("h")).agg(
            F.lit(tbl).alias("tbl"),
            F.bit_xor("h").alias("fingerprint"),
            F.count("*").alias("n_rows"),
        )

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    o_serial = F.concat_ws(
        "|",
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        # o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is
        # value-preserving and matches DuckDB's epoch_us on the naive value.
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
        "o_orderpriority",
    )
    c_serial = F.concat_ws(
        "|",
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
        "c_mktsegment",
    )
    return (
        fp(orders, "orders", o_serial)
        .unionAll(fp(cust, "customer", c_serial))
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# Time-decayed revenue (feature-store recency weighting): weight each order
# by 0.5^k where k = min(age_in_30d_buckets, 10). Exact cross-engine floats
# by construction: cents (bigint) × 2^-k with k ≤ 10 is an exact binary
# value, and the per-customer sum stays far below 2^53 in units of 2^-10 —
# so the double sum is exact and order-independent. No rounding needed.
# ---------------------------------------------------------------------------
_REF_DATE = "1998-12-01"


@register(
    "time_decayed_revenue",
    f"""
    SELECT o_custkey,
           SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * pow(0.5, least(greatest(CAST(date_diff('day',
                                 CAST(o_orderdate AS DATE),
                                 DATE '{_REF_DATE}') AS BIGINT), 0) // 30, 10))
              ) / 100.0 AS decayed_revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY decayed_revenue DESC, o_custkey
    LIMIT 100
    """,
)
def q_time_decayed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    k = F.least(
        F.floor(
            F.greatest(
                F.datediff(F.lit(_REF_DATE).cast("date"), F.col("o_orderdate")),
                F.lit(0),
            )
            / 30
        ),
        F.lit(10),
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            (F.sum(cents * F.pow(F.lit(0.5), k)) / 100.0).alias("decayed_revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("decayed_revenue"), "o_custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# MERGE INTO (SCD1 upsert) via one full-outer join (operators/merge.py).
# Updates and inserts are derived deterministically from the table itself;
# output is a per-segment summary of the merged state so the compare stays
# small at any sf. DECIMAL sums keep it exact.
# ---------------------------------------------------------------------------
@register(
    "merge_upsert_customers",
    """
    WITH src AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE) AS c_acctbal,
             'UPGRADED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 10000000, concat('New#', c_custkey), c_nationkey,
             0.0 AS c_acctbal, 'FRESH' AS c_mktsegment
      FROM customer WHERE c_custkey % 97 = 0
    ), merged AS (
      SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
             coalesce(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
             coalesce(s.c_acctbal, t.c_acctbal) AS c_acctbal
      FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.merge import merge_upsert

    cust = load(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") + 100)
        .cast("double")
        .alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    inserts = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.concat(F.lit("New#"), F.col("c_custkey")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("FRESH").alias("c_mktsegment"),
    )
    merged = merge_upsert(cust, updates.unionAll(inserts), key="c_custkey")
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Data-quality expectations (the pipeline gate before training data ships):
# per-rule violation counts over orders, including a distributed referential
# -integrity check (anti join — no collect, no cross product). Every rule is
# a plain filter/anti-join count, so the suite stays one scan per rule at
# any scale (Catalyst fuses the shared scan via column pruning).
# ---------------------------------------------------------------------------
@register(
    "dq_expectations_orders",
    """
    WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
    SELECT * FROM (
      SELECT 'positive_price' AS rule, n_rows,
             (SELECT COUNT(*) FROM orders WHERE NOT (o_totalprice > 0)) AS n_violations
      FROM n
      UNION ALL
      SELECT 'valid_status', n_rows,
             (SELECT COUNT(*) FROM orders
              WHERE o_orderstatus NOT IN ('F', 'O', 'P')) FROM n
      UNION ALL
      SELECT 'date_in_range', n_rows,
             (SELECT COUNT(*) FROM orders
              WHERE o_orderdate < TIMESTAMP '1990-01-01'
                 OR o_orderdate >= TIMESTAMP '2000-01-01') FROM n
      UNION ALL
      SELECT 'customer_exists', n_rows,
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) FROM n
    ) ORDER BY rule
    """,
)
def q_dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n_rows = orders.count()

    def rule(name: str, violations: DataFrame) -> DataFrame:
        return violations.agg(
            F.lit(name).alias("rule"),
            F.lit(n_rows).alias("n_rows"),
            F.count("*").alias("n_violations"),
        )

    checks = [
        rule("positive_price", orders.filter(~(F.col("o_totalprice") > 0))),
        rule(
            "valid_status",
            orders.filter(~F.col("o_orderstatus").isin("F", "O", "P")),
        ),
        rule(
            "date_in_range",
            orders.filter(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            ),
        ),
        rule(
            "customer_exists",
            orders.join(
                cust.select("c_custkey"),
                orders["o_custkey"] == F.col("c_custkey"),
                "left_anti",
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("rule")


# ---------------------------------------------------------------------------
# Recursive SQL (Spark 4 WITH RECURSIVE — the same surface DuckDB exposes):
# walk the implicit decimal-digit hierarchy of customer keys (parent =
# key div 10) to the root and roll counts/sums up per level. Acyclic and
# ≤ ~8 levels deep by construction, so UNION ALL recursion terminates.
# Spark executes each recursion step as a distributed job — no driver loop.
# ---------------------------------------------------------------------------
_RECURSIVE_SQL = """
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS k, c_custkey AS node, 0 AS lvl FROM customer
      UNION ALL
      SELECT k, node {div} 10, lvl + 1 FROM anc WHERE node > 0
    )
    SELECT lvl, COUNT(*) AS n, CAST(SUM(node) AS BIGINT) AS sum_node
    FROM anc GROUP BY lvl ORDER BY lvl
"""


@register("recursive_ancestor_rollup", _RECURSIVE_SQL.format(div="//"))
def q_recursive_ancestor_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    # Spark's cteRecursionRowLimit (default 1e6) is a runaway-query safety
    # valve, not a capacity bound — this walk emits exactly
    # rows × (digits+1) rows, so SIZE the limit from the input instead of
    # failing at scale (found by the sf1 probe: 10× customers tripped the
    # default). Session-scoped: the returned DataFrame executes after this
    # function returns, so the conf must outlive it.
    row = cust.agg(
        F.count(F.lit(1)).alias("n"), F.max("c_custkey").alias("mx")
    ).first()
    bound = int(row["n"]) * (len(str(int(row["mx"] or 0))) + 2)
    cur = int(spark.conf.get("spark.sql.cteRecursionRowLimit"))
    if bound > cur:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(bound))
    return spark.sql(_RECURSIVE_SQL.format(div="div"))


# ---------------------------------------------------------------------------
# Streaming upsert sink: foreachBatch keeps the newest event per user in a
# parquet target, merged batch-by-batch (streaming/stream_ops.py:
# stream_upsert_latest). The oracle is ONE argmax over the whole stream —
# equality proves merge-per-batch ≡ merge-once (max_by associativity).
# `value` is emitted untouched (no arithmetic → raw parquet doubles hash
# equal); ts as unix micros per the events idiom (events_queries.py:6).
# ---------------------------------------------------------------------------
@register(
    "stream_upsert_latest_event",
    """
    SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_stream_upsert_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from custom_vector_database_spark.streaming.stream_ops import (
        stream_upsert_latest,
        streaming_events,
    )

    tmp = tempfile.mkdtemp(prefix="cvdb_upsert_")
    try:
        target = stream_upsert_latest(spark, streaming_events(spark, sf_dir), tmp)
        out = target.select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        ).orderBy("user_id")
        # materialize before the temp dir disappears
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# CDC snapshot diff (operators/cdc.py): old = customer, new = customer with
# deterministic mutations (updates, deletes, inserts derived from the key).
# The diff joins (key, row-hash) pairs only; the oracle expresses the same
# diff by direct column comparison over a FULL OUTER JOIN — equal results
# prove the hash-compare classification. Output stays O(3) rows: per
# change_type count + key checksum.
# ---------------------------------------------------------------------------
@register(
    "cdc_snapshot_diff",
    """
    WITH new_snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 3 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 10 = 0
                  THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 50 AS DOUBLE)
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 13 != 5
      UNION ALL
      SELECT c_custkey + 20000000, 'FRESH', 0.0
      FROM customer WHERE c_custkey % 101 = 7
    ), old_snap AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    ), diff AS (
      SELECT coalesce(n.c_custkey, o.c_custkey) AS k,
             CASE WHEN o.c_custkey IS NULL THEN 'INSERT'
                  WHEN n.c_custkey IS NULL THEN 'DELETE'
                  WHEN n.c_mktsegment IS DISTINCT FROM o.c_mktsegment
                    OR n.c_acctbal    IS DISTINCT FROM o.c_acctbal THEN 'UPDATE'
             END AS change_type
      FROM old_snap o FULL OUTER JOIN new_snap n USING (c_custkey)
    )
    SELECT change_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_key
    FROM diff WHERE change_type IS NOT NULL
    GROUP BY change_type ORDER BY change_type
    """,
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.cdc import snapshot_diff

    old = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    updated = old.filter(F.col("c_custkey") % 13 != 5).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 3, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(
            F.col("c_custkey") % 10 == 0,
            (F.col("c_acctbal").cast("decimal(18,2)") + 50).cast("double"),
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    inserted = old.filter(F.col("c_custkey") % 101 == 7).select(
        (F.col("c_custkey") + 20000000).alias("c_custkey"),
        F.lit("FRESH").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    new = updated.unionAll(inserted)
    return (
        snapshot_diff(old, new, key="c_custkey")
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c_custkey").alias("sum_key"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/cdc.py:merge_agg_delta): the
# stored monthly-revenue view covers orders before 1997; the 1997+ delta is
# aggregated alone and combined — the base is never rescanned. The oracle
# is the FULL aggregate over all orders: equality proves incremental
# maintenance ≡ recompute (decimal sums are associative, so the two-level
# combine is exact).
# ---------------------------------------------------------------------------
@register(
    "incremental_agg_maintenance",
    """
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY month ORDER BY month
    """,
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.cdc import merge_agg_delta

    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def monthly(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        ).agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )

    stored = monthly(orders.filter(F.col("o_orderdate") < cutoff))
    delta = monthly(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = merge_agg_delta(
        stored, delta, keys=["month"], measures={"revenue": "sum", "n_orders": "count"}
    )
    return merged.select(
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        "n_orders",
    ).orderBy("month")


# ---------------------------------------------------------------------------
# Correlated LATERAL join (Spark 4 + DuckDB share the syntax): top-2 orders
# per customer as a correlated subquery with ORDER BY ... LIMIT — the SQL
# surface for "per-group top-N" (Spark plans it as a ranked window, not a
# per-row re-execution). Raw doubles pass through untouched → exact hashes.
# ---------------------------------------------------------------------------
_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c.c_custkey < 50
    ORDER BY c.c_custkey, t.o_orderkey
"""


@register("lateral_top_orders_per_customer", _LATERAL_SQL)
def q_lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# SCD2 point-in-time join: build a versioned dimension from each user's
# 'view' events (valid_from = ts, valid_to = next view's ts via lead()),
# then join each 'purchase' fact to the version in effect at purchase time.
# The join is equi-keyed on user_id with a validity band filter — the same
# hash-partitioned shape as the range join, never a cross product. This is
# the warehouse "AS OF <fact time>" join against a versioned dimension.
# ---------------------------------------------------------------------------
@register(
    "scd2_point_in_time_join",
    """
    WITH versions AS (
      SELECT user_id, event_id AS version_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'view'
    ), facts AS (
      SELECT user_id, event_id, ts,
             CAST(value AS DECIMAL(18,2)) AS val
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id,
           COUNT(*) AS n_purchases,
           COUNT(DISTINCT v.version_id) AS n_versions_hit,
           CAST(SUM(f.val) AS DOUBLE) AS total_value
    FROM facts f JOIN versions v
      ON f.user_id = v.user_id
     AND f.ts >= v.valid_from
     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from custom_vector_database_spark.queries.events_queries import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("valid_from", "version_id")
    versions = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(w))
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", F.col("value").cast("decimal(18,2)").alias("val")
    )
    joined = facts.alias("f").join(
        versions.alias("v"),
        (F.col("f.user_id") == F.col("v.user_id"))
        & (F.col("f.ts") >= F.col("v.valid_from"))
        & (F.col("v.valid_to").isNull() | (F.col("f.ts") < F.col("v.valid_to"))),
    )
    return (
        joined.groupBy(F.col("v.user_id").alias("user_id"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("v.version_id").alias("n_versions_hit"),
            F.sum("f.val").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling (contrastive-training pairs): for each
# query doc, rank every other doc by an md5-derived pseudo-random value
# (seeded by the PAIR, so both engines and every rerun agree) and keep the
# top 5 "random" negatives. At 100 TB the candidate pool would be a
# hash-bucketed slice instead of the full corpus; the ranking shuffle
# carries (query, candidate, hash) triples only.
# ---------------------------------------------------------------------------
@register(
    "negative_sampling_pairs",
    """
    WITH q AS (SELECT doc_id AS qid FROM documents WHERE doc_id < 10),
    scored AS (
      SELECT qid, d.doc_id AS neg_id,
             CAST(concat('0x', substr(md5(concat(qid, '|', d.doc_id)), 1, 15)) AS BIGINT) AS r,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY CAST(concat('0x', substr(md5(concat(qid, '|', d.doc_id)), 1, 15)) AS BIGINT),
                        d.doc_id
             ) AS rk
      FROM q CROSS JOIN documents d
      WHERE d.doc_id != qid
    )
    SELECT qid, neg_id, rk FROM scored WHERE rk <= 5 ORDER BY qid, rk
    """,
)
def q_negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    q = docs.filter(F.col("doc_id") < 10).select(F.col("doc_id").alias("qid"))
    pairs = F.broadcast(q).crossJoin(
        docs.select(F.col("doc_id").alias("neg_id"))
    ).filter(F.col("neg_id") != F.col("qid"))
    r = F.conv(
        F.substring(F.md5(F.concat_ws("|", "qid", "neg_id")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("qid").orderBy(r, "neg_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "neg_id", "rk")
        .orderBy("qid", "rk")
    )


# ---------------------------------------------------------------------------
# Stream-STATIC join: enrich the purchase stream with a static per-user
# dimension (signup time, derived once from the batch table). The static
# side broadcasts into every micro-batch — no state store at all, the
# cheapest streaming join there is (and the right one whenever the dim
# fits in memory / is slowly-changing). Oracle = the same enrichment in
# batch SQL over the whole stream.
# ---------------------------------------------------------------------------
@register(
    "stream_static_enrich",
    """
    WITH signup AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT CAST(date_diff('day', CAST(s.signup_ts AS DATE), CAST(e.ts AS DATE))
                // 7 AS BIGINT) AS weeks_since_signup,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN signup s ON e.user_id = s.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
    GROUP BY weeks_since_signup
    ORDER BY weeks_since_signup
    """,
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.queries.events_queries import load_events
    from custom_vector_database_spark.streaming.stream_ops import (
        run_stream_to_memory,
        streaming_events,
    )

    signup = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    stream = streaming_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    enriched = (
        stream.join(F.broadcast(signup), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .withColumn(
            "weeks_since_signup",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("signup_ts").cast("date"))
                / 7
            ),
        )
    )
    agg = enriched.groupBy("weeks_since_signup").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    return run_stream_to_memory(spark, agg, "stream_static").orderBy(
        "weeks_since_signup"
    )


# ---------------------------------------------------------------------------
# Skew-resistant salted join (operators/skew.py:salted_join): orders⋈customer
# with the customer side replicated salt× and order rows spread by
# xxhash64(o_orderkey) % salt — heavy-hitter custkeys land on `salt`
# reducers instead of one. Result ≡ the plain join, so the oracle is the
# unsalted SQL.
# ---------------------------------------------------------------------------
@register(
    "salted_join_revenue_by_segment",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_salted_join_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.skew import salted_join

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        orders, cust, "o_custkey", "c_custkey", salt_src="o_orderkey", salt=8
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Round-3 batch: three more training-data-pipeline verbs, all built on the
# md5-deterministic / guarantee-check oracle patterns so every one is
# hash-checkable against DuckDB.
# ---------------------------------------------------------------------------

# Deterministic train/val/test split (80/10/10): the split of a document is
# a pure function of md5(doc_id) against exact integer thresholds
# (floor(f * 2^60) literals — identical arithmetic in any engine), so the
# assignment is reproducible across engines, reruns, and repartitioning,
# and adding new docs never reassigns existing ones — the properties a
# training pipeline needs from a split. Single pass, no shuffle before the
# 3-group aggregate.
_SPLIT_TRAIN_MAX = 922337203685477580  # floor(0.8 * 2^60)
_SPLIT_VAL_MAX = 1037629354146162278  # floor(0.9 * 2^60)


@register(
    "dataset_split_docs",
    f"""
    SELECT CASE
             WHEN h < {_SPLIT_TRAIN_MAX} THEN 'train'
             WHEN h < {_SPLIT_VAL_MAX} THEN 'val'
             ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM (SELECT doc_id, n_chars,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
          FROM documents)
    GROUP BY 1
    ORDER BY split
    """,
)
def q_dataset_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    split = (
        F.when(h < F.lit(_SPLIT_TRAIN_MAX), "train")
        .when(h < F.lit(_SPLIT_VAL_MAX), "val")
        .otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("split")
    )


# Weighted sampling via priority sampling (Duffield/Lund/Thorup, public
# method): priority = uniform / weight, keep the k smallest per stratum.
# The uniform is the first 13 hex chars of md5(key) — 52 bits, EXACTLY
# representable as an IEEE double — and the weight is an exact integer
# (price cents < 2^53), so priority = h / w is one correctly-rounded IEEE
# division that every engine computes bit-identically: the selected sample
# is deterministic and cross-engine hash-checkable, unlike seeded RNG
# sampling. Scale shape: one pass to hash + a per-group top-k window —
# only (status, key, priority) triples shuffle.
@register(
    "weighted_sample_orders",
    """
    WITH w AS (
      SELECT o_orderstatus AS status, o_orderkey AS orderkey,
             CAST(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13))
                       AS BIGINT) AS DOUBLE)
             / CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)
               AS priority
      FROM orders
    ), r AS (
      SELECT status, orderkey,
             row_number() OVER (PARTITION BY status
                                ORDER BY priority, orderkey) AS rk
      FROM w
    )
    SELECT status, orderkey, rk FROM r WHERE rk <= 20
    ORDER BY status, rk
    """,
)
def q_weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    h52 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10
    ).cast("long")
    w_cents = F.round(F.col("o_totalprice") * 100).cast("long")
    priority = h52.cast("double") / w_cents.cast("double")
    ranked = orders.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderkey").alias("orderkey"),
        priority.alias("priority"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("status").orderBy("priority", "orderkey")
        ),
    )
    return (
        ranked.filter(F.col("rk") <= 20)
        .select("status", "orderkey", "rk")
        .orderBy("status", "rk")
    )


# Count-min-sketch heavy hitters, built from first principles as plain
# DataFrame ops: the sketch is a (depth, bucket) -> count aggregation
# (bucket = xxhash64(key, depth) mod width) — map-side combinable, one
# shuffle of at most depth x width rows regardless of input size, the
# 100 TB shape for frequency estimation. The estimate probe is a
# broadcast join of the 10 candidate keys' buckets against the finished
# sketch, min over depths. Deterministic end to end (xxhash64 is a fixed
# function), but the estimate is Spark-specific (DuckDB has no xxhash64
# with this mixing), so — like the HLL/GK queries — the output is the
# EXACT top-10 plus a boolean asserting a deliberately 3x-RELAXED CMS
# bound (exact <= estimate <= exact + 3*(e/width) * N — at the textbook
# e/width the one-sided guarantee fails with ~e^-depth probability per
# key, a few-percent flip risk per round over regenerated data; at 3x
# the per-key failure odds are ~(3e)^-5); the oracle computes the exact
# top-10 and TRUE.
_CMS_DEPTH, _CMS_WIDTH = 5, 8192


@register(
    "cms_heavy_hitters_parts",
    """
    SELECT l_partkey, COUNT(*) AS exact_cnt, TRUE AS cms_ok
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY exact_cnt DESC, l_partkey
    LIMIT 10
    """,
)
def q_cms_heavy_hitters_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey")

    def buckets(col: str) -> F.Column:
        return F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(_CMS_WIDTH))
                for i in range(_CMS_DEPTH)
            ]
        )

    sketch = (
        li.select(F.posexplode(buckets("l_partkey")).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # one build; feeds probe AND N below
    )
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "l_partkey")
        .limit(10)
    )
    # N = the total the sketch already counted (any single depth sums to
    # it) — no third full-table scan
    n_total = int(
        sketch.filter(F.col("d") == 0).agg(F.sum("cnt")).first()[0] or 0
    )
    # 3x the textbook e/width bound: at exactly e/width the one-sided
    # guarantee fails with probability ~e^-depth (~0.7%) PER KEY under
    # random hashing — across 10 keys and per-round regenerated testdata
    # that is a few-percent chance of a red row per round. At 3x, Markov
    # per depth gives P(excess > 3e*N/width) <= (3e)^-1 per row, so the
    # min over depth=5 rows fails with ~(3e)^-5 ~= 3e-5 per key.
    bound = 3 * 2.718281828459045 / _CMS_WIDTH * n_total
    probes = top.select(
        "l_partkey", "exact_cnt", F.posexplode(buckets("l_partkey")).alias("d", "bucket")
    )
    est = (
        F.broadcast(probes)
        .join(sketch, ["d", "bucket"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        "l_partkey",
        "exact_cnt",
        (
            (F.col("est") >= F.col("exact_cnt"))
            & (F.col("est") <= F.col("exact_cnt") + F.lit(bound))
        ).alias("cms_ok"),
    ).orderBy(F.desc("exact_cnt"), "l_partkey")


# ---------------------------------------------------------------------------
# Batch BM25 retrieval: top-5 docs for EVERY query in a query table — the
# set-oriented retrieval verb (what knn_join is to knn), the shape of
# RAG-corpus retrieval and hard-negative mining. One posting-list pass
# over the union of all query terms; per-(qid, doc) scores as
# position-conditional fixed-order sums (the single-query determinism
# trick generalized), so the whole batch is hash-exact vs DuckDB.
# ---------------------------------------------------------------------------
_BATCH_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["spark", "join"]),
    (1, ["filter", "scan"]),
    (2, ["table", "row", "column"]),
    (3, ["stream", "window"]),
]
_BQ_VALUES = ", ".join(
    f"({qid}, {ti}, '{t}')"
    for qid, terms in _BATCH_QUERIES
    for ti, t in enumerate(terms)
)


@register(
    "bm25_multi_query",
    f"""
    WITH q(qid, ti, token) AS (VALUES {_BQ_VALUES}),
    toks AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS dl, unnest({_DUCK_TOKS}) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, dl, token, COUNT(*) AS tf FROM toks
      WHERE token IN (SELECT DISTINCT token FROM q)
      GROUP BY doc_id, dl, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len({_DUCK_TOKS})) AS sum_dl FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.5)
               / (tf + 1.5 * (0.25 + 0.75 * dl / (sum_dl / n_docs))) AS s
      FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    ), j AS (
      SELECT q.qid, sc.doc_id, q.ti, sc.s
      FROM scored sc JOIN q ON sc.token = q.token
    ), agg AS (
      SELECT qid, doc_id,
             SUM(CASE WHEN ti = 0 THEN s ELSE 0.0 END) AS s0,
             SUM(CASE WHEN ti = 1 THEN s ELSE 0.0 END) AS s1,
             SUM(CASE WHEN ti = 2 THEN s ELSE 0.0 END) AS s2
      FROM j GROUP BY qid, doc_id
    ), r AS (
      SELECT qid, doc_id, round(0.0 + s0 + s1 + s2, 6) AS score,
             row_number() OVER (PARTITION BY qid
                 ORDER BY round(0.0 + s0 + s1 + s2, 6) DESC, doc_id) AS rk
      FROM agg)
    SELECT qid, doc_id, score, rk FROM r WHERE rk <= 5
    ORDER BY qid, rk
    """,
)
def q_bm25_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _BATCH_QUERIES, "qid int, terms array<string>"
    )
    return rk.bm25_batch(docs, queries, k=5, max_terms=3).orderBy("qid", "rk")


# ---------------------------------------------------------------------------
# Z-order-clustered scan (round 6): lineitem rewritten once per process
# into a Morton-interleaved (l_partkey, l_suppkey) layout
# (operators/layout.zorder_write), then a TWO-dimensional range predicate
# aggregates over it. The oracle runs the plain predicate on the raw
# table — identical answers prove the clustering rewrite is lossless;
# tests/test_layout.py separately measures that BOTH columns' per-file
# zone maps narrow (the pruning the rewrite exists to buy — a
# single-column sort narrows one dimension and none of the other).
# ---------------------------------------------------------------------------
_ZORDER_CACHE: dict = {}


@register(
    "zorder_pruned_scan",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM lineitem
    WHERE l_partkey <= 50 AND l_suppkey <= 5
    """,
)
def q_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil as _shutil
    import tempfile

    from custom_vector_database_spark.operators.layout import zorder_write

    key = (spark.sparkContext.applicationId, sf_dir)
    zpath = _ZORDER_CACHE.get(key)
    if zpath is None:
        zpath = tempfile.mkdtemp(prefix="cvdb_zorder_q_")
        atexit.register(_shutil.rmtree, zpath, ignore_errors=True)
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
        )
        zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
        _ZORDER_CACHE[key] = zpath
    return (
        spark.read.parquet(zpath)
        .filter((F.col("l_partkey") <= 50) & (F.col("l_suppkey") <= 5))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_orderkey").alias("key_checksum"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming corpus ingestion with dedup-on-ingest (round 6): documents
# stream into a parquet corpus; only fingerprint-new texts append
# (streaming/stream_ops.stream_corpus_ingest — the streaming form of
# dedup_exact_docs). Delta = 10 verbatim copies of existing docs (all
# dropped), 10 genuinely new texts (kept), plus an intra-delta duplicate
# pair (exactly one kept). WHICH physical copy of a duplicate survives
# is arrival-order; the contract is fingerprint-SET equality, so the
# audit aggregates over fingerprints (count, distinct count, checksum) —
# arrival-invariant, and exactly computable by the oracle from
# corpus ∪ distinct-new-fingerprints.
# ---------------------------------------------------------------------------
_FP_DUCK = "md5(trim(regexp_replace(lower({t}), '[ ]+', ' ', 'g')))"
# each 15-hex-digit value is reduced mod 1e9+7 BEFORE summing so the
# sum stays far inside int64 in both engines (a raw sum overflows)
_FP_CKSUM_DUCK = (
    "CAST(SUM(CAST(concat('0x', substr(fp, 1, 15)) AS BIGINT) % 1000000007) "
    "AS BIGINT)"
)


def _fp_checksum_agg(fp_df: DataFrame) -> DataFrame:
    """One-row (fp_checksum) aggregate over a DISTINCT fp frame — the
    Spark twin of _FP_CKSUM_DUCK. Load-bearing convention shared by
    stream_corpus_ingest and corpus_ingest_compact: each 15-hex-digit
    prefix is reduced mod 1e9+7 BEFORE summing so both engines stay far
    inside int64; change it here and in _FP_CKSUM_DUCK together."""
    return fp_df.distinct().agg(
        F.sum(
            F.conv(F.substring("fp", 1, 15), 16, 10).cast("long") % 1_000_000_007
        ).alias("fp_checksum")
    )


@register(
    "stream_corpus_ingest",
    f"""
    WITH corpus AS (
      SELECT {_FP_DUCK.format(t="text")} AS fp FROM documents
    ), new_texts AS (
      SELECT text || ' round6 fresh suffix' AS text
      FROM documents WHERE doc_id >= 10 AND doc_id < 20
    ), new_fps AS (
      SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp FROM new_texts
    ), kept_new AS (
      SELECT fp FROM new_fps
      WHERE fp NOT IN (SELECT fp FROM corpus)
    ), final AS (
      SELECT fp FROM corpus UNION ALL SELECT fp FROM kept_new
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_distinct_fp,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS ingest_ok
    FROM final
    """,
)
def q_stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.text import fingerprint_md5
    from custom_vector_database_spark.streaming.stream_ops import (
        stream_corpus_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cvdb_corpus_ingest_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        copy_fixture(golden_exact_docs(spark, sf_dir), corpus_dir)
        copies = docs.filter(F.col("doc_id") < 10).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        )
        fresh = (
            docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" round6 fresh suffix")))
        )
        intra_dup = fresh.filter(F.col("doc_id") == 2_000_000_010).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        )
        delta = copies.unionByName(fresh).unionByName(intra_dup)
        # 4 part files + maxFilesPerTrigger=2 -> two micro-batches, so the
        # cross-batch anti-join path runs, not a degenerate single batch
        delta.repartition(4).write.parquet(delta_dir)
        n_batches = stream_corpus_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema
        )
        final = spark.read.parquet(corpus_dir).select(
            fingerprint_md5(F.col("text")).alias("fp")
        ).localCheckpoint(eager=True)  # the tmp corpus dir is deleted on return
        cksum = _fp_checksum_agg(final.select("fp"))
        return (
            final.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("fp").alias("n_distinct_fp"),
            )
            .crossJoin(cksum)
            .withColumn("ingest_ok", F.lit(n_batches >= 2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Fingerprint-sidecar compaction (round 7): the maintenance verb for
# stream_corpus_ingest's probe table — per-batch appends leave one small
# file per touched bucket per micro-batch, and compaction rewrites each
# bucket to one file via the crash-safe two-rename swap (refusing while
# any ingest claim is outstanding). The oracle pins the semantic
# contract: the fingerprint SET is untouched by compaction, so the same
# corpus∪delta aggregate as stream_corpus_ingest must hold afterwards;
# compact_ok certifies files strictly decreased, the sidecar row count
# equals the distinct corpus fingerprints, and a post-compaction ingest
# of a verbatim re-drop appends nothing (the probe still answers).
# ---------------------------------------------------------------------------
@register(
    "corpus_ingest_compact",
    f"""
    WITH corpus AS (
      SELECT {_FP_DUCK.format(t="text")} AS fp FROM documents
    ), new_texts AS (
      SELECT text || ' round7 compact suffix' AS text
      FROM documents WHERE doc_id >= 20 AND doc_id < 30
    ), new_fps AS (
      SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp FROM new_texts
    ), kept_new AS (
      SELECT fp FROM new_fps WHERE fp NOT IN (SELECT fp FROM corpus)
    ), final AS (
      SELECT fp FROM corpus UNION ALL SELECT fp FROM kept_new
    )
    SELECT COUNT(*) AS n_docs,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS compact_ok
    FROM final
    """,
)
def q_corpus_ingest_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.text import fingerprint_md5
    from custom_vector_database_spark.streaming.stream_ops import (
        _FP_SIDECAR,
        _read_fp_sidecar,
        compact_fp_sidecar,
        stream_corpus_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cvdb_fp_compact_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        copy_fixture(golden_exact_docs(spark, sf_dir), corpus_dir)
        fresh = (
            docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn(
                "text", F.concat(F.col("text"), F.lit(" round7 compact suffix"))
            )
        )
        # 4 part files / maxFilesPerTrigger=2 -> >= 2 micro-batches of
        # sidecar appends, so compaction has real fragmentation to fold
        fresh.repartition(4).write.parquet(delta_dir)
        stream_corpus_ingest(spark, delta_dir, corpus_dir, doc_schema=docs.schema)
        stats = compact_fp_sidecar(spark, corpus_dir)
        # probe-after-compact: a verbatim re-drop must append nothing
        fresh.withColumn("doc_id", F.col("doc_id") + 1_000_000_000).repartition(
            2
        ).write.mode("append").parquet(delta_dir)
        stream_corpus_ingest(spark, delta_dir, corpus_dir, doc_schema=docs.schema)
        final = spark.read.parquet(corpus_dir).select(
            fingerprint_md5(F.col("text")).alias("fp")
        ).localCheckpoint(eager=True)
        n_side = _read_fp_sidecar(
            spark, os.path.join(corpus_dir, _FP_SIDECAR)
        ).count()
        n_distinct = final.distinct().count()
        ok = (
            stats["files_after"] < stats["files_before"]
            and stats["n_fps"] == n_distinct
            and n_side == n_distinct
        )
        cksum = _fp_checksum_agg(final)
        return (
            final.agg(F.count(F.lit(1)).alias("n_docs"))
            .crossJoin(cksum)
            .withColumn("compact_ok", F.lit(bool(ok)))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming NEAR-dup ingest (streaming/stream_ops.stream_corpus_neardup_
# ingest — the fuzzy sibling of stream_corpus_ingest, backed by the
# two-frame minhash sidecar). Delta: 5 verbatim copies (exact-dropped),
# 5 single-token-appended near-copies + 1 intra-delta exact duplicate of
# one of them (dropped iff an LSH band collides with a corpus doc AND the
# signatures agree on >= 8/16 components — the oracle RECOMPUTES that
# decision from the same md5 arithmetic rather than assuming it), and 5
# per-doc-distinct fresh texts built from md5 hex tokens (kept; md5-built
# so the construction is engine-identical and shares no shingles across
# docs). Contract = fingerprint-set equality, same as stream_corpus_ingest.
# ---------------------------------------------------------------------------
def _mh_oracle_cte(src: str, pfx: str) -> str:
    """Signature + band CTEs over ``src`` (a CTE with doc_id, text) —
    the DuckDB twin of operators/dedup.with_minhash_sig +
    sig_band_structs, emitting {pfx}m (doc_id, j, c) and {pfx}b
    (doc_id, band, bh)."""
    from custom_vector_database_spark.operators.dedup import (
        MINHASH_P,
        minhash_perm_consts,
    )

    toks = _DUCK_TOKS  # the ONE tokenizer convention, shared module-wide
    sh = (
        "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform("
        "range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' "
        "|| toks[i+2])) ELSE [] END"
    )
    vals = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(minhash_perm_consts(16))
    )
    return f"""
    {pfx}t AS (SELECT doc_id, {toks} AS toks FROM {src}),
    {pfx}s AS (SELECT doc_id, unnest({sh}) AS sh FROM {pfx}t),
    {pfx}h AS (SELECT doc_id,
                      CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT)
                        % {MINHASH_P} AS h
               FROM {pfx}s),
    {pfx}m AS (SELECT doc_id, j, MIN((h * a + b) % {MINHASH_P}) AS c
               FROM {pfx}h CROSS JOIN (VALUES {vals}) perms(j, a, b)
               GROUP BY doc_id, j),
    {pfx}b AS (SELECT doc_id, j // 4 AS band,
                      CAST(concat('0x', substr(md5(
                        string_agg(CAST(c AS VARCHAR), '_' ORDER BY j)
                      ), 1, 15)) AS BIGINT) AS bh
               FROM {pfx}m GROUP BY doc_id, j // 4)"""


_NEARDUP_DELTA_DUCK = """
    delta AS (
      SELECT doc_id + 1000000000 AS doc_id, text
      FROM documents WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 2000000000, text || ' zz'
      FROM documents WHERE doc_id >= 10 AND doc_id < 15
      UNION ALL
      SELECT doc_id + 4000000000, text || ' zz'
      FROM documents WHERE doc_id = 12
      UNION ALL
      SELECT doc_id + 3000000000,
             'fresh ' || md5(text) || ' ' || md5(text || '1') || ' '
               || md5(text || '2')
      FROM documents WHERE doc_id >= 20 AND doc_id < 25)"""


def neardup_ingest_delta(docs: DataFrame) -> DataFrame:
    """The stream_neardup_ingest delta — factored out so the tripwire
    test (tests/test_streaming.py) can pin the oracle's one modeling
    assumption on the SAME frame the row streams: the oracle computes
    delta-vs-CORPUS drop decisions only, which is exact as long as no
    two DISTINCT-fingerprint delta docs are near-dup candidates of each
    other (such a pair would resolve by batch-arrival order, which SQL
    cannot see). The construction makes that structurally unlikely —
    copies drop on the exact path before any near logic, near-copies
    derive from five distinct corpus docs, fresh texts are per-doc md5
    streams — and the tripwire test asserts it holds on the fixture."""
    copies = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000_000
    )
    near = (
        docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 15))
        .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz")))
    )
    intra_exact = near.filter(F.col("doc_id") == 2_000_000_012).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000_000
    )
    fresh = (
        docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 25))
        .withColumn("doc_id", F.col("doc_id") + 3_000_000_000)
        .withColumn(
            "text",
            F.concat(
                F.lit("fresh "),
                F.md5("text"),
                F.lit(" "),
                F.md5(F.concat(F.col("text"), F.lit("1"))),
                F.lit(" "),
                F.md5(F.concat(F.col("text"), F.lit("2"))),
            ),
        )
    )
    return copies.unionByName(near).unionByName(intra_exact).unionByName(fresh)


@register(
    "stream_neardup_ingest",
    f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    {_NEARDUP_DELTA_DUCK},
    {_mh_oracle_cte("corpus", "c")},
    {_mh_oracle_cte("delta", "d")},
    cand AS (
      SELECT DISTINCT db.doc_id AS did, cb.doc_id AS cid
      FROM db JOIN cb ON db.band = cb.band AND db.bh = cb.bh),
    agree AS (
      SELECT cand.did, cand.cid, COUNT(*) AS m
      FROM cand
      JOIN dm ON dm.doc_id = cand.did
      JOIN cm ON cm.doc_id = cand.cid AND cm.j = dm.j AND cm.c = dm.c
      GROUP BY cand.did, cand.cid),
    dropped AS (SELECT DISTINCT did FROM agree WHERE m >= 8),
    cfps AS (SELECT {_FP_DUCK.format(t="text")} AS fp FROM corpus),
    kept AS (
      SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp FROM delta
      WHERE doc_id NOT IN (SELECT did FROM dropped)
        AND {_FP_DUCK.format(t="text")} NOT IN (SELECT fp FROM cfps)),
    final AS (SELECT fp FROM cfps UNION ALL SELECT fp FROM kept)
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_distinct_fp,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS ingest_ok
    FROM final
    """,
)
def q_stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.text import fingerprint_md5
    from custom_vector_database_spark.streaming.stream_ops import (
        stream_corpus_neardup_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cvdb_neardup_ingest_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        copy_fixture(golden_neardup_docs(spark, sf_dir), corpus_dir)
        delta = neardup_ingest_delta(docs)
        # 4 part files + maxFilesPerTrigger=2 -> two micro-batches
        delta.repartition(4).write.parquet(delta_dir)
        n_batches = stream_corpus_neardup_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select(fingerprint_md5(F.col("text")).alias("fp"))
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        cksum = _fp_checksum_agg(final.select("fp"))
        return (
            final.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("fp").alias("n_distinct_fp"),
            )
            .crossJoin(cksum)
            .withColumn("ingest_ok", F.lit(n_batches >= 2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Minhash-sidecar compaction (the near-dup family's maintenance verb,
# mirroring corpus_ingest_compact): ingest fresh md5-token-built docs in
# >=2 append batches, compact BOTH sidecar frames, then certify the
# compacted probes still answer — a re-drop of verbatim copies (exact
# path) and dot-appended copies (NEAR path: '.' changes the fingerprint
# but not the token stream, so the shingle sets are IDENTICAL — J=1,
# every band collides, agreement 16/16 — a guaranteed drop with zero LSH
# randomness) appends nothing. Oracle pins the fingerprint SET
# (corpus ∪ the fresh docs; the md5-hex fresh texts share no shingles
# with natural text, so no near decision is in play); compact_ok
# certifies files strictly decreased, sigs == distinct fps, and the
# post-compaction corpus row count unchanged by the re-drop.
# ---------------------------------------------------------------------------
_ND_FRESH_DUCK = (
    "'fresh' || ' ' || md5(text) || ' ' || md5(text || 'a') || ' ' || "
    "md5(text || 'b') || ' ' || md5(text || 'c') || ' ' || md5(text || 'd')"
)


@register(
    "neardup_ingest_compact",
    f"""
    WITH corpus AS (SELECT {_FP_DUCK.format(t="text")} AS fp FROM documents),
    fresh AS (
      SELECT {_ND_FRESH_DUCK} AS text
      FROM documents WHERE doc_id >= 30 AND doc_id < 38),
    kept AS (
      SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp FROM fresh
      WHERE {_FP_DUCK.format(t="text")} NOT IN (SELECT fp FROM corpus)),
    final AS (SELECT fp FROM corpus UNION ALL SELECT fp FROM kept)
    SELECT COUNT(*) AS n_docs,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS compact_ok
    FROM final
    """,
)
def q_neardup_ingest_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.text import fingerprint_md5
    from custom_vector_database_spark.streaming.stream_ops import (
        _MH_SIGS,
        _read_mh_sigs,
        compact_mh_sidecar,
        stream_corpus_neardup_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cvdb_mh_compact_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        copy_fixture(golden_neardup_docs(spark, sf_dir), corpus_dir)
        fresh = (
            docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 38))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.lit("fresh"),
                    F.md5("text"),
                    *[
                        F.md5(F.concat(F.col("text"), F.lit(s)))
                        for s in ("a", "b", "c", "d")
                    ],
                ),
            )
        )
        fresh.repartition(4).write.parquet(delta_dir)  # >= 2 append batches
        stream_corpus_neardup_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema
        )
        n_mid = spark.read.parquet(corpus_dir).count()
        stats = compact_mh_sidecar(spark, corpus_dir)
        # probe-after-compact: exact copies AND guaranteed near-copies
        # (dot-appended: new fingerprint, identical shingles) re-drop
        redrop = fresh.withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        ).unionByName(
            fresh.withColumn("doc_id", F.col("doc_id") + 3_000_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(".")))
        )
        redrop.repartition(2).write.mode("append").parquet(delta_dir)
        stream_corpus_neardup_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select(fingerprint_md5(F.col("text")).alias("fp"))
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        n_after = final.count()
        n_distinct = final.distinct().count()
        n_sigs = _read_mh_sigs(
            spark, os.path.join(corpus_dir, _MH_SIGS)
        ).count()
        ok = (
            stats["files_after"] < stats["files_before"]
            and stats["n_sigs"] == n_distinct
            and n_sigs == n_distinct
            and n_after == n_mid  # the re-drop appended NOTHING
        )
        cksum = _fp_checksum_agg(final)
        return (
            final.agg(F.count(F.lit(1)).alias("n_docs"))
            .crossJoin(cksum)
            .withColumn("compact_ok", F.lit(bool(ok)))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming DSIR-gated ingest (streaming/stream_ops.stream_corpus_dsir_
# ingest): the quality-gate member of the ingest family — fit the
# log-ratio table once (target = English docs, pool = the whole corpus),
# persist it, then stream a delta where each doc must clear
# logw_micro >= 1 before the exact dedup-on-ingest path runs. The oracle
# RECOMPUTES the whole gate (hashed unigram+bigram buckets, add-one
# smoothed micro-integer log-ratios, per-doc exact BIGINT sums) plus the
# fingerprint-set dedup contract. Delta: variants of docs 40-49 (gate
# decision data-determined, identically on both engines), verbatim
# copies of docs 0-4 (never append: fp-dropped if they pass the gate,
# gate-dropped otherwise), and one whitespace-only doc (0 grams ->
# logw 0 < 1: a GUARANTEED gate drop certifying the filter actually ran).
# ---------------------------------------------------------------------------
def _dsir_gate_oracle_cte(num_buckets: int, threshold: int) -> str:
    """CTE chain computing gate-kept delta fingerprints: expects CTEs
    ``tgt`` (text), ``pool`` (text), and ``deltad`` (doc_id, text) to be
    defined upstream; emits ``gkept`` (fp) — the DuckDB twin of
    operators/curation.dsir_bucket_logratios + dsir_score_with over
    fingerprint_md5, mirroring the dsir_select_docs arithmetic."""
    from custom_vector_database_spark.operators.curation import (
        DSIR_GRAMS_DUCK,
        dsir_bucket_duck,
    )

    toks = _DUCK_TOKS
    grams = DSIR_GRAMS_DUCK
    bucket = dsir_bucket_duck(num_buckets)
    return f"""
    gtg AS (SELECT unnest({grams}) AS gram
            FROM (SELECT {toks} AS toks FROM tgt)),
    gpg AS (SELECT unnest({grams}) AS gram
            FROM (SELECT {toks} AS toks FROM pool)),
    gpc AS (SELECT {bucket} AS bucket, COUNT(*) AS c FROM gtg GROUP BY 1),
    gqc AS (SELECT {bucket} AS bucket, COUNT(*) AS c FROM gpg GROUP BY 1),
    gpt AS (SELECT COUNT(*) AS t FROM gtg),
    gqt AS (SELECT COUNT(*) AS t FROM gpg),
    glr AS (
      SELECT s.bucket,
             CAST(floor(1e6 * ln((COALESCE(gpc.c, 0) + 1.0)
                                 / (gpt.t + {num_buckets}.0)))
                  - floor(1e6 * ln((COALESCE(gqc.c, 0) + 1.0)
                                   / (gqt.t + {num_buckets}.0)))
                  AS BIGINT) AS lr_micro
      FROM (SELECT unnest(range(0, {num_buckets})) AS bucket) s
      LEFT JOIN gpc ON s.bucket = gpc.bucket
      LEFT JOIN gqc ON s.bucket = gqc.bucket
      CROSS JOIN gpt CROSS JOIN gqt),
    gdg AS (SELECT doc_id, unnest({grams}) AS gram
            FROM (SELECT doc_id, {toks} AS toks FROM deltad)),
    gtf AS (SELECT doc_id, {bucket} AS bucket, COUNT(*) AS tf
            FROM gdg GROUP BY doc_id, 2),
    gw AS (SELECT doc_id, CAST(SUM(tf * lr_micro) AS BIGINT) AS logw
           FROM gtf JOIN glr USING (bucket) GROUP BY doc_id),
    gsc AS (SELECT d.doc_id, d.text, COALESCE(gw.logw, 0) AS logw
            FROM deltad d LEFT JOIN gw ON d.doc_id = gw.doc_id),
    gkept AS (
      SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp
      FROM gsc WHERE logw >= {threshold})"""


_DSIR_GATE_BUCKETS = 32
_DSIR_GATE_MIN = 1


@register(
    "stream_dsir_gated_ingest",
    f"""
    WITH corpus AS (SELECT {_FP_DUCK.format(t="text")} AS fp FROM documents),
    tgt AS (SELECT text FROM documents WHERE lang = 'en'),
    pool AS (SELECT text FROM documents),
    deltad AS (
      SELECT doc_id + 1000000000 AS doc_id, text
      FROM documents WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 2000000000, text || ' gated fresh suffix'
      FROM documents WHERE doc_id >= 40 AND doc_id < 50
      UNION ALL
      SELECT 3000000000, '   '),
    {_dsir_gate_oracle_cte(_DSIR_GATE_BUCKETS, _DSIR_GATE_MIN)},
    kept AS (
      SELECT fp FROM gkept WHERE fp NOT IN (SELECT fp FROM corpus)),
    final AS (SELECT fp FROM corpus UNION ALL SELECT fp FROM kept)
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_distinct_fp,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS ingest_ok
    FROM final
    """,
)
def q_stream_dsir_gated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.text import fingerprint_md5
    from custom_vector_database_spark.streaming.stream_ops import (
        fit_dsir_gate,
        stream_corpus_dsir_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cvdb_dsir_gate_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        gate_dir = os.path.join(tmp, "gate")
        copy_fixture(golden_exact_docs(spark, sf_dir), corpus_dir)
        fit_dsir_gate(
            pool=docs.select("text"),
            target=docs.filter(F.col("lang") == "en").select("text"),
            gate_dir=gate_dir,
            num_buckets=_DSIR_GATE_BUCKETS,
        )
        copies = docs.filter(F.col("doc_id") < 5).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        )
        fresh = (
            docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn(
                "text", F.concat(F.col("text"), F.lit(" gated fresh suffix"))
            )
        )
        blank = docs.limit(1).select(
            F.lit(3_000_000_000).alias("doc_id"),
            F.lit("   ").alias("text"),
            *[
                F.lit(None).cast(docs.schema[c].dataType).alias(c)
                for c in docs.columns
                if c not in ("doc_id", "text")
            ],
        ).select(docs.columns)
        delta = copies.unionByName(fresh).unionByName(blank)
        delta.repartition(4).write.parquet(delta_dir)  # >= 2 micro-batches
        n_batches = stream_corpus_dsir_ingest(
            spark,
            delta_dir,
            corpus_dir,
            gate_dir,
            doc_schema=docs.schema,
            min_logw_micro=_DSIR_GATE_MIN,
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select(fingerprint_md5(F.col("text")).alias("fp"))
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        cksum = _fp_checksum_agg(final.select("fp"))
        return (
            final.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("fp").alias("n_distinct_fp"),
            )
            .crossJoin(cksum)
            .withColumn("ingest_ok", F.lit(n_batches >= 2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming SEMANTIC dedup-on-ingest (round 9): the fourth corpus-ingest
# family member — the duplicate key is the EMBEDDING, so reformatted
# duplicates sharing no shingles still drop. Sign-band LSH candidates
# (Charikar sign bits, identity projection — deterministic) verified by
# exact round-6 cosine, streamed against the two-frame sidecar
# (streaming/stream_ops.stream_corpus_semdedup_ingest). Everything is
# engine-reproducible, so the oracle RECOMPUTES every drop decision:
# band keys for corpus and delta, band-collision candidates, exact
# cosine verification, then the kept-id set. Delta construction avoids
# intra-delta near pairs (verbatim copies / 1.001x-scaled copies /
# zeroed-last-dim variants of DISTINCT corpus docs whose pairwise
# cosine <= 0.52 in this data; negated fresh vectors, pairwise-apart by
# the same bound) — the one modeling assumption, pinned by the tripwire
# test like stream_neardup_ingest's (tests/test_streaming.py). The audit
# aggregates over the id SET (count + md5 checksum): arrival-invariant,
# exactly computable by the oracle from corpus ∪ kept delta ids.
# ---------------------------------------------------------------------------
def _sb_oracle_cte(src: str, pfx: str) -> str:
    """Sign-band CTEs over ``src`` (a CTE with doc_id, embedding) — the
    DuckDB twin of operators/dedup.sign_band_keys at 4 bands x 16 bits,
    emitting {pfx}bands (doc_id, band, key)."""
    return f"""
    {pfx}bits AS (
      SELECT doc_id, list_transform(embedding,
               x -> CASE WHEN CAST(x AS DOUBLE) > 0 THEN 1 ELSE 0 END) AS b
      FROM {src}),
    {pfx}bands AS (
      SELECT doc_id, band,
             list_reduce(list_prepend(0, b[band*16+1 : band*16+16]),
                         (acc, v) -> acc*2 + v) AS key
      FROM {pfx}bits, (SELECT UNNEST(range(0,4)) AS band)
      WHERE len(b) = 64)"""


_SB_NORM = (
    "sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * "
    "CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
)
_SB_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)

_SEMDEDUP_DELTA_DUCK = """
    delta AS (
      SELECT doc_id + 1000000000 AS doc_id, embedding
      FROM corpus WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 2000000000,
             list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT))
      FROM corpus WHERE doc_id >= 10 AND doc_id < 15
      UNION ALL
      SELECT doc_id + 4000000000,
             list_concat(embedding[1:63], [CAST(0.0 AS FLOAT)])
      FROM corpus WHERE doc_id >= 15 AND doc_id < 18
      UNION ALL
      SELECT doc_id + 3000000000, list_transform(embedding, x -> -x)
      FROM corpus WHERE doc_id >= 20 AND doc_id < 25)"""


def semdedup_ingest_delta(docs: DataFrame) -> DataFrame:
    """The stream_semdedup_ingest delta — factored out so the tripwire
    test can pin the oracle's one modeling assumption (no intra-delta
    near pairs) on the SAME frame the row streams."""
    copies = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000_000
    )
    scaled = (
        docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 15))
        .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT))"
            ),
        )
    )
    zeroed = (
        docs.filter((F.col("doc_id") >= 15) & (F.col("doc_id") < 18))
        .withColumn("doc_id", F.col("doc_id") + 4_000_000_000)
        .withColumn(
            "embedding",
            F.expr("concat(slice(embedding, 1, 63), array(CAST(0.0 AS FLOAT)))"),
        )
    )
    fresh = (
        docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 25))
        .withColumn("doc_id", F.col("doc_id") + 3_000_000_000)
        .withColumn("embedding", F.expr("transform(embedding, x -> -x)"))
    )
    return copies.unionByName(scaled).unionByName(zeroed).unionByName(fresh)


_SB_COS_DIST_DUCK = (
    "round(1.0 - CASE WHEN {na} * {nb} != 0 THEN {dot} / ({na} * {nb}) END, 6)"
    " + 0.0"
)


@register(
    "stream_semdedup_ingest",
    f"""
    WITH corpus AS (SELECT vec_id AS doc_id, embedding FROM embeddings),
    {_SEMDEDUP_DELTA_DUCK},
    {_sb_oracle_cte("corpus", "c")},
    {_sb_oracle_cte("delta", "d")},
    cand AS (
      SELECT DISTINCT dbands.doc_id AS did, cbands.doc_id AS cid
      FROM dbands JOIN cbands
        ON dbands.band = cbands.band AND dbands.key = cbands.key),
    dropped AS (
      SELECT DISTINCT cand.did
      FROM cand JOIN delta y ON cand.did = y.doc_id
                JOIN corpus x ON cand.cid = x.doc_id
      WHERE {_SB_COS_DIST_DUCK.format(
          na=_SB_NORM.format(a="y.embedding"),
          nb=_SB_NORM.format(a="x.embedding"),
          dot=_SB_DOT.format(a="y.embedding", b="x.embedding"),
      )} <= 0.1),
    kept AS (
      SELECT doc_id FROM delta
      WHERE doc_id NOT IN (SELECT did FROM dropped)),
    final AS (
      SELECT doc_id FROM corpus UNION ALL SELECT doc_id FROM kept),
    fps AS (SELECT DISTINCT md5(CAST(doc_id AS VARCHAR)) AS fp FROM final)
    SELECT (SELECT COUNT(*) FROM final) AS n_docs,
           (SELECT {_FP_CKSUM_DUCK} FROM fps) AS id_checksum,
           TRUE AS ingest_ok
    """,
)
def q_stream_semdedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.streaming.stream_ops import (
        stream_corpus_semdedup_ingest,
    )

    docs = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_semdedup_ingest_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        copy_fixture(golden_semdedup_emb(spark, sf_dir), corpus_dir)
        delta = semdedup_ingest_delta(docs)
        # 4 part files + maxFilesPerTrigger=2 -> two micro-batches
        delta.repartition(4).write.parquet(delta_dir)
        n_batches = stream_corpus_semdedup_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema,
            max_cos_dist=0.1,
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select(F.md5(F.col("doc_id").cast("string")).alias("fp"))
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        cksum = _fp_checksum_agg(final.select("fp")).withColumnRenamed(
            "fp_checksum", "id_checksum"
        )
        return (
            final.agg(F.count(F.lit(1)).alias("n_docs"))
            .crossJoin(cksum)
            .withColumn("ingest_ok", F.lit(n_batches >= 2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Learned-classifier gated ingest (round 9): the gated-ingest verb driven
# by a LEARNED linear quality classifier instead of the DSIR importance
# table — fit_quality_classifier(method='lcr'): Wang & Manning 2012's
# log-count-ratio weights over hashed unigram+bigram buckets, the closed
# form of the fastText-style gate (Joulin et al. 2016), fit on LABELED
# corpora: pos = the English documents, neg = deterministic md5-token
# gibberish derived from them inside the query (both engines build the
# identical corpus — the pii_redaction convention). The fit is exact
# integer arithmetic, so the oracle recomputes the persisted weights,
# every document score, and the kept set — _dsir_gate_oracle_cte with
# its target/pool roles bound to pos/neg labels (the lcr closed form IS
# that table with labeled inputs; intercept 0). Gate-dropped: gibberish
# delta docs (never near the natural-text buckets); gate-passed: natural
# fresh docs, which then run the exact-dedup path.
# ---------------------------------------------------------------------------
_QGATE_BUCKETS = 64
_QGATE_MIN = 1_000_000
_QGATE_JUNK_TRAIN = "abcdefghijkl"
_QGATE_JUNK_HELD = "mnopqrstuvwx"


def _junk_text_duck(salts: str) -> str:
    return " || ' ' || ".join(f"md5(text || '{s}')" for s in salts)


def classifier_junk_docs(docs: DataFrame, salts: str, offset: int) -> DataFrame:
    """Deterministic 12-token md5 gibberish per source doc — the Spark
    twin of _junk_text_duck, shared by the fit (training negatives) and
    the delta (held-out junk, distinct salts)."""
    cols = [F.md5(F.concat(F.col("text"), F.lit(s))) for s in salts]
    return docs.select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
    )


@register(
    "stream_classifier_gated_ingest",
    f"""
    WITH corpus AS (SELECT {_FP_DUCK.format(t="text")} AS fp FROM documents),
    tgt AS (SELECT text FROM documents WHERE lang = 'en'),
    pool AS (SELECT {_junk_text_duck(_QGATE_JUNK_TRAIN)} AS text
             FROM documents WHERE lang = 'en'),
    deltad AS (
      SELECT doc_id + 1000000000 AS doc_id, text
      FROM documents WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 2000000000, text || ' classifier fresh suffix'
      FROM documents WHERE doc_id >= 40 AND doc_id < 50
      UNION ALL
      SELECT doc_id + 3000000000, {_junk_text_duck(_QGATE_JUNK_HELD)}
      FROM documents WHERE doc_id >= 60 AND doc_id < 70),
    {_dsir_gate_oracle_cte(_QGATE_BUCKETS, _QGATE_MIN)},
    kept AS (
      SELECT fp FROM gkept WHERE fp NOT IN (SELECT fp FROM corpus)),
    final AS (SELECT fp FROM corpus UNION ALL SELECT fp FROM kept)
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_distinct_fp,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS ingest_ok
    FROM final
    """,
)
def q_stream_classifier_gated_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.text import fingerprint_md5
    from custom_vector_database_spark.streaming.stream_ops import (
        fit_quality_classifier,
        stream_corpus_dsir_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en")
    tmp = tempfile.mkdtemp(prefix="cvdb_classifier_gate_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        gate_dir = os.path.join(tmp, "gate")
        copy_fixture(golden_exact_docs(spark, sf_dir), corpus_dir)
        fit_quality_classifier(
            pos=en.select("text"),
            neg=classifier_junk_docs(en, _QGATE_JUNK_TRAIN, 0).select("text"),
            gate_dir=gate_dir,
            method="lcr",
            num_buckets=_QGATE_BUCKETS,
        )
        copies = docs.filter(F.col("doc_id") < 5).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        )
        fresh = (
            docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" classifier fresh suffix")),
            )
        )
        junk = classifier_junk_docs(
            docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 70)),
            _QGATE_JUNK_HELD,
            3_000_000_000,
        )
        for c in docs.columns:
            if c not in junk.columns:
                junk = junk.withColumn(
                    c, F.lit(None).cast(docs.schema[c].dataType)
                )
        delta = copies.unionByName(fresh).unionByName(
            junk.select(docs.columns)
        )
        delta.repartition(4).write.parquet(delta_dir)  # >= 2 micro-batches
        n_batches = stream_corpus_dsir_ingest(
            spark,
            delta_dir,
            corpus_dir,
            gate_dir,
            doc_schema=docs.schema,
            min_logw_micro=_QGATE_MIN,
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select(fingerprint_md5(F.col("text")).alias("fp"))
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        cksum = _fp_checksum_agg(final.select("fp"))
        return (
            final.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("fp").alias("n_distinct_fp"),
            )
            .crossJoin(cksum)
            .withColumn("ingest_ok", F.lit(n_batches >= 2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Semantic-sidecar compaction + REBUCKET (round 9): the sign-band
# family's maintenance verb, registered like neardup_ingest_compact —
# and the rebucket certification rides in the same row: the compaction
# moves the sidecar from 16 to 32 buckets (compact_sb_sidecar's
# commit-marker protocol), and the post-compact re-drop probe proves
# decisions are IDENTICAL under the new modulus. Ingest fresh negated
# vectors in >= 2 append batches (per-bucket small files in both
# frames), compact+rebucket, then re-stream verbatim copies of the
# fresh docs (cosine 0 — guaranteed exact-path drops) and 1.001x-scaled
# copies of corpus docs (guaranteed near-path drops): nothing appends.
# Oracle pins the id SET (corpus ∪ the fresh negated docs, with the
# negated-vs-corpus decisions RECOMPUTED from band keys + exact cosine,
# not assumed); compact_ok certifies files strictly decreased,
# n_vecs == final corpus rows, the meta pin moved to 32, and the
# re-drop appended nothing.
# ---------------------------------------------------------------------------
@register(
    "semdedup_ingest_compact",
    f"""
    WITH corpus AS (SELECT vec_id AS doc_id, embedding FROM embeddings),
    delta AS (
      SELECT doc_id + 2000000000 AS doc_id,
             list_transform(embedding, x -> -x) AS embedding
      FROM corpus WHERE doc_id >= 30 AND doc_id < 38),
    {_sb_oracle_cte("corpus", "c")},
    {_sb_oracle_cte("delta", "d")},
    cand AS (
      SELECT DISTINCT dbands.doc_id AS did, cbands.doc_id AS cid
      FROM dbands JOIN cbands
        ON dbands.band = cbands.band AND dbands.key = cbands.key),
    dropped AS (
      SELECT DISTINCT cand.did
      FROM cand JOIN delta y ON cand.did = y.doc_id
                JOIN corpus x ON cand.cid = x.doc_id
      WHERE {_SB_COS_DIST_DUCK.format(
          na=_SB_NORM.format(a="y.embedding"),
          nb=_SB_NORM.format(a="x.embedding"),
          dot=_SB_DOT.format(a="y.embedding", b="x.embedding"),
      )} <= 0.1),
    kept AS (
      SELECT doc_id FROM delta
      WHERE doc_id NOT IN (SELECT did FROM dropped)),
    final AS (
      SELECT doc_id FROM corpus UNION ALL SELECT doc_id FROM kept),
    fps AS (SELECT DISTINCT md5(CAST(doc_id AS VARCHAR)) AS fp FROM final)
    SELECT (SELECT COUNT(*) FROM final) AS n_docs,
           (SELECT {_FP_CKSUM_DUCK} FROM fps) AS id_checksum,
           TRUE AS compact_ok
    """,
)
def q_semdedup_ingest_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_VECS,
        _read_sb_vecs,
        compact_sb_sidecar,
        stream_corpus_semdedup_ingest,
    )

    docs = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_sb_compact_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        copy_fixture(golden_semdedup_emb(spark, sf_dir), corpus_dir)
        fresh = (
            docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 38))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn("embedding", F.expr("transform(embedding, x -> -x)"))
        )
        fresh.repartition(4).write.parquet(delta_dir)  # >= 2 append batches
        stream_corpus_semdedup_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema,
            max_cos_dist=0.1,
        )
        n_mid = spark.read.parquet(corpus_dir).count()
        stats = compact_sb_sidecar(spark, corpus_dir, new_n_buckets=32)
        with open(
            os.path.join(corpus_dir, _SB_VECS, "_sidecar_meta.json")
        ) as f:
            pinned = json.load(f)["n_buckets"]
        # probe-after-rebucket: verbatim copies of the FRESH docs
        # (cosine 0 to their sidecar rows — exact-path drops) and
        # 1.001x-scaled corpus copies (near-path drops) re-drop under
        # the NEW modulus; nothing appends
        redrop = fresh.withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        ).unionByName(
            docs.filter(F.col("doc_id") < 5)
            .withColumn("doc_id", F.col("doc_id") + 4_000_000_000)
            .withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT))"
                ),
            )
        )
        redrop.repartition(2).write.mode("append").parquet(delta_dir)
        stream_corpus_semdedup_ingest(
            spark, delta_dir, corpus_dir, doc_schema=docs.schema,
            max_cos_dist=0.1,
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select(F.md5(F.col("doc_id").cast("string")).alias("fp"))
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        n_after = final.count()
        n_vecs = _read_sb_vecs(
            spark, os.path.join(corpus_dir, _SB_VECS)
        ).count()
        ok = (
            # a 16 -> 32 widening can raise the TOTAL file count, so
            # the defrag certification is one-file-per-bucket, with the
            # pre-compact state proven fragmented beyond that bound
            stats["files_after"] <= 2 * stats["n_buckets"]
            and stats["files_before"] > 2 * 16
            and stats["n_buckets"] == 32
            and pinned == 32
            and n_vecs == n_after  # one sidecar row per live doc
            and n_after == n_mid  # the re-drop appended NOTHING
        )
        cksum = _fp_checksum_agg(final).withColumnRenamed(
            "fp_checksum", "id_checksum"
        )
        return (
            final.agg(F.count(F.lit(1)).alias("n_docs"))
            .crossJoin(cksum)
            .withColumn("compact_ok", F.lit(bool(ok)))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Semantic benchmark decontamination (round 9): the embedding member of
# the decontamination trio — decontaminate_docs counts exact shingle
# overlap, neardup_decontaminate_docs catches reformatted text leaks,
# and THIS flags train rows whose EMBEDDING sits within cosine 0.1 of a
# holdout embedding (paraphrased/translated leaks share neither
# shingles nor minhash bands, but an embedding model maps them
# together). operators/dedup.semantic_contamination: sign-band
# candidates against a BROADCAST holdout, exact round-6 cosine verify —
# both halves the ONE shared definition (sign_band_keys /
# sign_band_cos_dist), so the oracle recomputes every flag. Fixture
# mirrors neardup_decontaminate_docs: holdout = vec_id % 97 == 0;
# train = the rest PLUS planted leaks (1.001x-scaled holdout vectors
# under +5e9 ids — same direction, cosine distance 0, guaranteed
# band-collisions). Natural train rows sit >= 0.45 away in this data,
# but nothing is assumed: the SQL recomputes candidates and verdicts.
# ---------------------------------------------------------------------------
@register(
    "semantic_decontaminate_docs",
    f"""
    WITH hold AS (SELECT vec_id AS doc_id, embedding FROM embeddings
                  WHERE vec_id % 97 = 0),
    train AS (
      SELECT vec_id AS doc_id, embedding FROM embeddings
      WHERE vec_id % 97 != 0
      UNION ALL
      SELECT doc_id + 5000000000,
             list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT))
      FROM hold),
    {_sb_oracle_cte("train", "t")},
    {_sb_oracle_cte("hold", "h")},
    cand AS (
      SELECT tbands.doc_id AS tid, hbands.doc_id AS hid
      FROM tbands JOIN hbands
        ON tbands.band = hbands.band AND tbands.key = hbands.key
      GROUP BY 1, 2),
    ver AS (
      SELECT cand.tid,
             {_SB_COS_DIST_DUCK.format(
                 na=_SB_NORM.format(a="x.embedding"),
                 nb=_SB_NORM.format(a="y.embedding"),
                 dot=_SB_DOT.format(a="x.embedding", b="y.embedding"),
             )} AS cd
      FROM cand JOIN train x ON cand.tid = x.doc_id
                JOIN hold y ON cand.hid = y.doc_id),
    per_doc AS (
      SELECT tid AS doc_id, COUNT(*) AS n_cand,
             MIN(cd) AS min_cos_dist
      FROM ver GROUP BY tid)
    SELECT doc_id, CAST(n_cand AS BIGINT) AS n_cand, min_cos_dist,
           min_cos_dist <= 0.1 AS contaminated
    FROM per_doc WHERE min_cos_dist <= 0.1
    ORDER BY doc_id
    """,
)
def q_semantic_decontaminate_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from custom_vector_database_spark.operators.dedup import (
        semantic_contamination,
    )

    emb = load_spread(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    hold = emb.filter(F.col("doc_id") % 97 == 0)
    train = emb.filter(F.col("doc_id") % 97 != 0).unionByName(
        hold.select(
            (F.col("doc_id") + 5_000_000_000).alias("doc_id"),
            F.expr(
                "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT))"
            ).alias("embedding"),
        )
    )
    out = semantic_contamination(
        train, hold, id_col="doc_id", vec_col="embedding", max_cos_dist=0.1
    )
    return (
        out.filter(F.col("contaminated"))
        .select(
            "doc_id",
            F.col("n_cand").cast("long").alias("n_cand"),
            "min_cos_dist",
            "contaminated",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# sidecar_report (round 10): the ingest family's describe() as a priced,
# oracle-checked row — the r9 verdict's registration ask. One corpus
# carries all THREE dedup-on-ingest sidecars (the existing test fixture):
# minhash and sign-band bootstrapped over the 201-doc corpus (200 real
# docs joined to their embeddings + ONE planted zero-norm doc, so the
# report also covers the r10 excluded-id marker: a vecs row with
# vec=NULL and no band rows), then a clean exact-family STREAM ingest
# (bootstrap + one micro-batched delta, claims resolved by the runner).
# The oracle recomputes every frame's row count from the tables — the
# exact frame's post-ingest fingerprint set, the minhash frames' one
# sig row / n_bands band rows per distinct fingerprint, the sign-band
# frames' one vecs row per doc (+1 NULL marker) / n_bands band rows per
# DECIDABLE doc — and pins the meta shape values and zero outstanding
# claims. report_ok certifies Spark-side structure the SQL cannot see:
# every frame present (no heal-pending halves), files_per_bucket > 0,
# and the claims list empty (the compact_ok convention).
# ---------------------------------------------------------------------------
_SR_PLANT = (
    "zero norm planted document with enough repeated filler tokens to "
    "shingle and band cleanly in every text keyed sidecar family"
)


@register(
    "sidecar_report",
    f"""
    WITH corpus AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE d.doc_id < 200),
    all0 AS (
      SELECT doc_id, text FROM corpus
      UNION ALL SELECT 900, '{_SR_PLANT}'),
    fps0 AS (SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp FROM all0),
    new_texts AS (
      SELECT text || ' sidecar report suffix' AS text
      FROM corpus WHERE doc_id >= 20 AND doc_id < 30),
    new_fps AS (
      SELECT DISTINCT {_FP_DUCK.format(t="text")} AS fp FROM new_texts),
    kept AS (SELECT fp FROM new_fps WHERE fp NOT IN (SELECT fp FROM fps0)),
    n AS (SELECT (SELECT COUNT(*) FROM fps0) AS n0,
                 (SELECT COUNT(*) FROM kept) AS nk,
                 (SELECT COUNT(*) FROM corpus) AS nsb)
    SELECT * FROM (
      SELECT 'exact' AS family, CAST(16 AS BIGINT) AS n_buckets,
             CAST(NULL AS BIGINT) AS n_perms,
             CAST(NULL AS BIGINT) AS n_bands,
             CAST(NULL AS BIGINT) AS band_bits,
             CAST(n0 + nk AS BIGINT) AS rows_primary,
             CAST(NULL AS BIGINT) AS rows_bands,
             CAST(0 AS BIGINT) AS n_claims, TRUE AS report_ok
      FROM n
      UNION ALL
      SELECT 'minhash', 16, 16, 4, NULL, n0, n0 * 4, 0, TRUE FROM n
      UNION ALL
      SELECT 'signband', 16, NULL, 4, 16, nsb + 1, nsb * 4, 0, TRUE FROM n)
    ORDER BY family
    """,
)
def q_sidecar_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_mh_sidecar,
        _ensure_sb_sidecar,
        sidecar_report,
        stream_corpus_ingest,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.filter(F.col("doc_id") < 200).join(emb, "doc_id")
    planted = spark.createDataFrame(
        [(900, _SR_PLANT, [0.0] * 64)],
        "doc_id long, text string, embedding array<float>",
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_sidecar_report_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        full = corpus.unionByName(planted)
        full.write.parquet(corpus_dir)
        # two-frame families over the ORIGINAL corpus (the exact-family
        # stream below appends docs, but only to the corpus + fp frames)
        _ensure_mh_sidecar(spark, corpus_dir, "text", 16, 4, 16)
        _ensure_sb_sidecar(
            spark, corpus_dir, "doc_id", "embedding", 4, 16, 16
        )
        # clean exact-family ingest: fp bootstrap + >= 2 micro-batches,
        # every claim resolved by the runner
        fresh = (
            corpus.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000)
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" sidecar report suffix")),
            )
        )
        fresh.repartition(4).write.parquet(delta_dir)
        stream_corpus_ingest(
            spark, delta_dir, corpus_dir, doc_schema=full.schema
        )

        rep = sidecar_report(spark, corpus_dir)
        rows = []
        for family in sorted(rep):
            fam = rep[family]
            meta, frames = fam["meta"], fam["frames"]
            names = sorted(
                frames,
                # primary frame first: _fingerprints / _mh_sigs / _sb_vecs
                key=lambda x: {"_mh_sigs": 0, "_sb_vecs": 0}.get(x, 1)
                if family != "exact" else 0,
            )
            ok = (
                all(frames[x] is not None for x in names)
                and all(frames[x]["files_per_bucket"] > 0 for x in names)
                and fam["outstanding_claims"] == []
            )
            # a heal-pending frame is None: report it as a NULL count
            # with report_ok=False rather than TypeError-ing the whole
            # certification row (r10 second-review finding)
            n_rows = lambda x: (  # noqa: E731
                int(frames[x]["n_rows"]) if frames[x] is not None else None
            )
            rows.append((
                family,
                int(meta["n_buckets"]),
                int(meta["n_perms"]) if meta.get("n_perms") is not None
                else None,
                int(meta["n_bands"]) if meta.get("n_bands") is not None
                else None,
                int(meta["band_bits"]) if meta.get("band_bits") is not None
                else None,
                n_rows(names[0]),
                n_rows(names[1]) if len(names) > 1 else None,
                len(fam["outstanding_claims"]),
                bool(ok),
            ))
        return spark.createDataFrame(
            rows,
            "family string, n_buckets long, n_perms long, n_bands long, "
            "band_bits long, rows_primary long, rows_bands long, "
            "n_claims long, report_ok boolean",
        ).orderBy("family")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Golden fixture corpora (round 15): the ingest-protocol rows each start
# from an identical, never-mutated base state — a base-table corpus plus
# its bootstrapped sidecar frames. That state is a pure function of the
# parquet inputs, so it is built ONCE per (applicationId, sf_dir) — the
# saved_index convention where the alphabetically-first consumer prices
# the build — and every consumer gets a PRIVATE copy it mutates freely.
# Mutated copies are never reused across rows, and nothing persists
# across processes: every bench/oracle invocation still computes the
# fixture from the parquet inputs. Rows that may populate this cache are
# listed in bench.py's _NO_RETRY (a retry would price the copy path as
# the build).
# ---------------------------------------------------------------------------
_GOLDEN_CACHE: dict = {}


def golden_fixture(spark: SparkSession, sf_dir: str, name: str, build) -> str:
    """Path to the golden (read-only) fixture tree named ``name``, built
    once per (applicationId, sf_dir) by ``build(path)``. Callers MUST
    NOT mutate the returned tree — take a copy via copy_fixture()."""
    import atexit
    import os
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir, name)
    path = _GOLDEN_CACHE.get(key)
    if path is None:
        base = tempfile.mkdtemp(prefix=f"cvdb_golden_{name}_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        path = os.path.join(base, "fx")
        build(path)
        _GOLDEN_CACHE[key] = path
    return path


def copy_fixture(golden: str, dest: str) -> str:
    """Private mutable copy of a golden tree (real byte copies, never
    hardlinks: sidecar compactions rewrite meta files in place, and a
    shared inode would corrupt the golden state)."""
    import shutil

    shutil.copytree(golden, dest)
    return dest


def golden_exact_docs(spark: SparkSession, sf_dir: str) -> str:
    """documents corpus + bootstrapped exact-fingerprint sidecar — the
    base state of every exact-family ingest row (stream_corpus_ingest,
    corpus_ingest_compact, and the gated variants, which all ensure this
    exact shape before their first micro-batch)."""

    def build(path: str) -> None:
        import os

        from custom_vector_database_spark.streaming.stream_ops import (
            _FP_SIDECAR,
            _ensure_fp_sidecar,
        )

        docs = load(spark, sf_dir, "documents")
        docs.write.parquet(path)
        _ensure_fp_sidecar(
            spark, path, os.path.join(path, _FP_SIDECAR), "text", 16
        )

    return golden_fixture(spark, sf_dir, "exact_docs", build)


def golden_neardup_docs(spark: SparkSession, sf_dir: str) -> str:
    """documents corpus + bootstrapped minhash sidecar (16 perms, 4
    bands, 16 buckets — the near-dup family's default shape)."""

    def build(path: str) -> None:
        from custom_vector_database_spark.streaming.stream_ops import (
            _ensure_mh_sidecar,
        )

        docs = load(spark, sf_dir, "documents")
        docs.write.parquet(path)
        _ensure_mh_sidecar(spark, path, "text", 16, 4, 16)

    return golden_fixture(spark, sf_dir, "neardup_docs", build)


def golden_semdedup_emb(spark: SparkSession, sf_dir: str) -> str:
    """embeddings-as-documents corpus + bootstrapped sign-band sidecar
    (4 bands, 16 bits, 16 buckets — the semantic family's default)."""

    def build(path: str) -> None:
        from custom_vector_database_spark.streaming.stream_ops import (
            _ensure_sb_sidecar,
        )

        docs = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        docs.write.parquet(path)
        _ensure_sb_sidecar(spark, path, "doc_id", "embedding", 4, 16, 16)

    return golden_fixture(spark, sf_dir, "semdedup_emb", build)


def _fragmented_sb_corpus(
    spark: SparkSession, emb: DataFrame, corpus_dir: str,
    n_batches: int = 1, n_buckets: int = 4, start_batch: int = 1,
) -> str:
    """Fixture: a corpus whose sign-band sidecar is FRAGMENTED —
    bootstrap at ``n_buckets`` + ``n_batches`` resolved apply batches of
    guaranteed-fresh vectors (negated/shifted — max natural |cos| ≈ 0.55
    in this data, so every batch appends). ONE copy shared by the
    maintenance_plan row, the maintenance_execute row, and
    tests/test_maintenance.py (r10 second-review finding: three drifting
    near-copies of the bootstrap + apply + claim-resolve choreography).
    Bootstrap writes one file per occupied bucket (<= n_buckets) and
    each apply appends >= 1 more, so files_per_bucket >= (n_buckets +
    n_batches) / n_buckets. ``start_batch`` > 1 resumes on an existing
    corpus (the golden-fixture incremental build): the corpus dir must
    already hold batches 1..start_batch-1."""
    import glob
    import os

    from custom_vector_database_spark.streaming.stream_ops import (
        _ensure_sb_sidecar,
        corpus_semdedup_apply_batch,
    )

    docs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    if start_batch == 1:
        docs.write.parquet(corpus_dir)
        _ensure_sb_sidecar(
            spark, corpus_dir, "doc_id", "embedding", 4, 16, n_buckets
        )
    ops = ("-x", "-(x + 0.25)", "-(x + 0.5)")
    for b in range(start_batch, n_batches + 1):
        op = ops[(b - 1) % len(ops)]
        # orderBy BEFORE limit: an unordered limit(5) is plan-dependent,
        # so which 5 vectors seed each batch could drift across engines/
        # plans (r10 ADVICE) — the fixture's determinism must not rest on
        # Spark happening to pick the same rows every time
        batch = docs.orderBy("doc_id").limit(5).select(
            (F.col("doc_id") + 10_000 * b).alias("doc_id"),
            F.expr(
                f"transform(embedding, x -> CAST(CAST({op} AS DOUBLE)"
                " AS FLOAT))"
            ).alias("embedding"),
        )
        corpus_semdedup_apply_batch(
            spark, batch, b, corpus_dir, n_buckets=n_buckets
        )
    for c in glob.glob(os.path.join(corpus_dir, "_sb_claims", "claim_*")):
        os.remove(c)
    return corpus_dir


def fragmented_sb_corpus_cached(
    spark: SparkSession, sf_dir: str, dest: str, n_batches: int = 1
) -> str:
    """Private copy of the golden fragmented sign-band corpus — the
    maintenance rows' shared fixture, built once per process instead of
    once per call site (4 calls across maintenance_plan/execute). The
    2-batch variant extends a copy of the 1-batch golden with one more
    apply, so the whole family costs one bootstrap + 3 apply batches per
    process, total."""
    import os
    import shutil

    def build1(path: str) -> None:
        emb = load(spark, sf_dir, "embeddings")
        _fragmented_sb_corpus(spark, emb, path, n_batches=1)

    g1 = golden_fixture(spark, sf_dir, "frag_sb1", build1)
    if n_batches == 1:
        return copy_fixture(g1, dest)
    if n_batches != 2:
        raise ValueError("only n_batches in (1, 2) are golden-cached")

    def build2(path: str) -> None:
        shutil.copytree(g1, path)
        emb = load(spark, sf_dir, "embeddings")
        _fragmented_sb_corpus(spark, emb, path, n_batches=2, start_batch=2)

    g2 = golden_fixture(spark, sf_dir, "frag_sb2", build2)
    return copy_fixture(g2, dest)


def golden_claimed_fp(spark: SparkSession, sf_dir: str) -> str:
    """10-doc corpus with a healthy exact sidecar and ONE planted
    outstanding ingest claim — maintenance_plan's 'resolve_claims'
    fixture (read-only in plan mode, so consumers still copy)."""

    def build(path: str) -> None:
        import os

        from custom_vector_database_spark.streaming.stream_ops import (
            _ensure_fp_sidecar,
        )

        load(spark, sf_dir, "documents").limit(10).write.parquet(path)
        _ensure_fp_sidecar(
            spark, path, os.path.join(path, "_fingerprints"), "text", 16
        )
        os.makedirs(os.path.join(path, "_ingest_claims"), exist_ok=True)
        with open(os.path.join(path, "_ingest_claims", "claim_7"), "a"):
            pass

    return golden_fixture(spark, sf_dir, "claimed_fp", build)


# ---------------------------------------------------------------------------
# maintenance_plan (round 10): the rebuild/compact AUTOPILOT's report
# mode as a priced row (operators/maintenance.py) — one verb reads the
# staleness protocol (quantization_error_report over a saved layout) and
# the sidecar snapshots (sidecar_report) and emits the ranked action
# table a 100 TB operator runs on a schedule. Deterministic fixture:
# the cached saved IVF-PQ layout evaluated against a fresh slice
# (vec_id % 3 == 0 -> 'none') and a +1.0-drifted slice (the
# pq_staleness_report construction -> 'rebuild'); a tmp corpus whose
# sign-band sidecar is fragmented by two resolved apply batches at 4
# buckets -> 'compact' (executable); a tmp corpus with one planted
# outstanding claim -> 'resolve_claims' (never executable). The oracle
# 'resolve_claims' (never executable); a corpus whose bands frame a
# crashed swap deleted -> 'heal' (the blocker class surfaced by the r10
# review pass, never executable here — the family's own ensure verb
# heals). The oracle
# pins the full classification table — target, action, blocked,
# executable, over_threshold — plus plan_ok certifying the rank
# invariant SQL cannot see. Round 11: both layout entries also emit a
# 'calibrate' advisory row (the shared fixture layout carries no recall
# pin — operators/calibrate.py; a rebuild drops the pin, and this row is
# how the autopilot surfaces the need to re-earn it), ranked between
# actionable and healthy, never executable (resolve_claims first,
# healthy rows last;
# the metric-ratio ordering between rebuild and compact is fit- and
# sf-dependent, so rows are compared BY TARGET and the invariant rides
# the boolean). Execute mode is pinned by
# tests/test_maintenance.py::test_execute_runs_exactly_the_plan.
# ---------------------------------------------------------------------------
@register(
    "maintenance_plan",
    """
    SELECT * FROM (VALUES
      ('claimed:exact', 'resolve_claims', FALSE, FALSE, TRUE, TRUE),
      ('emb_drifted', 'calibrate', FALSE, FALSE, FALSE, TRUE),
      ('emb_drifted', 'rebuild', FALSE, FALSE, TRUE, TRUE),
      ('emb_fresh', 'calibrate', FALSE, FALSE, FALSE, TRUE),
      ('emb_fresh', 'none', FALSE, FALSE, FALSE, TRUE),
      ('frag:signband', 'compact', FALSE, TRUE, TRUE, TRUE),
      ('half:signband', 'heal', FALSE, FALSE, TRUE, TRUE)
    ) AS t(target, action, blocked, executable, over_threshold, plan_ok)
    ORDER BY target, action
    """,
)
def q_maintenance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.maintenance import (
        maintenance_plan,
    )
    from custom_vector_database_spark.queries.vector_queries import (
        saved_index,
    )

    idx = saved_index(spark, sf_dir, "ivfpq")
    emb = load_spread(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").alias("vec"))
    fresh = base.filter(F.col("vec_id") % 3 == 0)
    drifted = base.filter(F.col("vec_id") % 3 == 1).select(
        "vec_id",
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"
        ).alias("vec"),
    )
    layouts = [
        {"name": "emb_fresh", "index": idx, "build_df": base,
         "recent_df": fresh},
        {"name": "emb_drifted", "index": idx, "build_df": base,
         "recent_df": drifted},
    ]
    tmp = tempfile.mkdtemp(prefix="cvdb_maintenance_")
    try:
        frag = fragmented_sb_corpus_cached(
            spark, sf_dir, os.path.join(tmp, "frag"), n_batches=2
        )
        # healthy exact sidecar with ONE planted outstanding claim
        claimed = copy_fixture(
            golden_claimed_fp(spark, sf_dir), os.path.join(tmp, "claimed")
        )
        # half-present family (crashed swap: the bands frame is gone) —
        # the plan must surface it as a 'heal' blocker, not a healthy
        # 'none' row (the r10 review-pass contract, driver-visible here)
        half = fragmented_sb_corpus_cached(
            spark, sf_dir, os.path.join(tmp, "half")
        )
        shutil.rmtree(os.path.join(half, "_sb_bands"))

        plan = maintenance_plan(
            spark, layouts,
            [("frag", frag), ("claimed", claimed), ("half", half)],
            max_files_per_bucket=1.4,
        )
        # the rank invariant SQL cannot see: the plan is ordered
        # blockers (heal / resolve_claims) -> actionable -> healthy
        rank = {"heal": 0, "resolve_claims": 0, "rebuild": 1,
                "compact": 1, "calibrate": 2, "none": 3}
        ranks = [rank[a["action"]] for a in plan]
        ok = ranks == sorted(ranks)
        rows = [
            (a["target"], a["action"], a["blocked"], a["executable"],
             a["metric"] > a["threshold"], bool(ok))
            for a in plan
        ]
        return spark.createDataFrame(
            rows,
            "target string, action string, blocked boolean, "
            "executable boolean, over_threshold boolean, plan_ok boolean",
        ).orderBy("target", "action")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# stream_payload_ingest (round 10): the exact ingest family's MULTIMODAL
# member — fp_kind='payload_md5' keys the fingerprint sidecar on a raw
# md5 over an opaque BINARY payload column, so image/audio/video corpora
# get byte-level exact dedup-on-ingest with NO codec (the one multimodal
# capability the sandbox stubs never gate). Fixture payloads are the
# documents' UTF-8 bytes (DuckDB's md5(text) IS md5 over those bytes, so
# the oracle recomputes every payload hash exactly): delta = 10 verbatim
# byte-copies under fresh ids (all dropped), 10 one-suffix-altered
# payloads (kept), 1 intra-delta byte-dup (dropped). Same aggregate
# contract as stream_corpus_ingest — corpus∪kept fingerprint set,
# mod-reduced checksum — under the payload fingerprint expression; the
# fp-kind pin, legacy-meta behavior, garbage-corpus steady state, and
# compaction carry are pinned by
# tests/test_streaming.py::test_payload_ingest_multimodal_member.
# ---------------------------------------------------------------------------
@register(
    "stream_payload_ingest",
    f"""
    WITH corpus AS (
      SELECT md5(text) AS fp FROM documents
    ), new_p AS (
      SELECT md5(text || ' r10 payload suffix') AS fp
      FROM documents WHERE doc_id >= 10 AND doc_id < 20
    ), new_fps AS (
      SELECT DISTINCT fp FROM new_p
    ), kept_new AS (
      SELECT fp FROM new_fps
      WHERE fp NOT IN (SELECT fp FROM corpus)
    ), final AS (
      SELECT fp FROM corpus UNION ALL SELECT fp FROM kept_new
    )
    SELECT COUNT(*) AS n_media,
           COUNT(DISTINCT fp) AS n_distinct_fp,
           (SELECT {_FP_CKSUM_DUCK} FROM (SELECT DISTINCT fp FROM final))
             AS fp_checksum,
           TRUE AS ingest_ok
    FROM final
    """,
)
def q_stream_payload_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.streaming.stream_ops import (
        stream_corpus_ingest,
    )

    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"),
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_payload_ingest_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        media.write.parquet(corpus_dir)
        copies = media.filter(F.col("media_id") < 10).withColumn(
            "media_id", F.col("media_id") + 1_000_000_000
        )
        fresh = (
            docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
            .select(
                (F.col("doc_id") + 2_000_000_000).alias("media_id"),
                F.encode(
                    F.concat(F.col("text"), F.lit(" r10 payload suffix")),
                    "UTF-8",
                ).cast("binary").alias("payload"),
            )
        )
        intra_dup = fresh.filter(
            F.col("media_id") == 2_000_000_010
        ).withColumn("media_id", F.col("media_id") + 1_000_000_000)
        delta = copies.unionByName(fresh).unionByName(intra_dup)
        # 4 part files / maxFilesPerTrigger=2 -> >= 2 micro-batches
        delta.repartition(4).write.parquet(delta_dir)
        n_batches = stream_corpus_ingest(
            spark, delta_dir, corpus_dir, doc_schema=media.schema,
            id_col="media_id", text_col="payload", fp_kind="payload_md5",
        )
        final = spark.read.parquet(corpus_dir).select(
            F.md5(F.col("payload")).alias("fp")
        ).localCheckpoint(eager=True)  # tmp corpus deleted on return
        cksum = _fp_checksum_agg(final.select("fp"))
        return (
            final.agg(
                F.count(F.lit(1)).alias("n_media"),
                F.count_distinct("fp").alias("n_distinct_fp"),
            )
            .crossJoin(cksum)
            .withColumn("ingest_ok", F.lit(n_batches >= 2))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# maintenance_execute (round 10): the autopilot's EXECUTE mode as a
# priced certification row — maintenance_plan's sibling proves the
# classification; this row proves the contract that makes execution
# safe: run_maintenance(execute=True) runs EXACTLY its own plan's
# executable rows via the existing crash-safe verbs and nothing else.
# Fixture: a stale saved IVF layout WITH a refit callable (-> rebuild
# executes through the shared install_dir_swap), a fresh layout with a
# refit callable (-> must NOT be refit), a fragmented sign-band corpus
# (-> compact executes, files strictly decrease), and a fragmented
# corpus with a planted claim (-> compact listed but BLOCKED, its files
# untouched). Booleans certify each leg plus executed==plan-executable;
# n_vectors is the oracle-recomputed fit-slice count.
# ---------------------------------------------------------------------------
@register(
    "maintenance_execute",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS executed_matches_plan,
           TRUE AS fresh_never_refit,
           TRUE AS compact_landed,
           TRUE AS blocked_untouched,
           TRUE AS rebuild_landed
    FROM embeddings WHERE vec_id < 64
    """,
)
def q_maintenance_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.operators.ivf import IvfIndex
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 64)
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    n = base.count()
    drifted = base.withColumn(
        "vec",
        F.expr("transform(vec, x -> CAST(CAST(x AS DOUBLE) + 1.0 AS FLOAT))"),
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_maint_exec_")
    try:
        path = os.path.join(tmp, "ivf")
        IvfIndex.fit(base, n_clusters=4).save(path)
        idx = IvfIndex.load(spark, path)
        calls: list = []

        def refit_stale():
            calls.append("stale")
            return IvfIndex.fit(drifted, n_clusters=4)

        def refit_fresh():
            calls.append("fresh")
            return IvfIndex.fit(base, n_clusters=4)

        layouts = [
            {"name": "stale", "index": idx, "build_df": base,
             "recent_df": drifted.limit(16), "refit": refit_stale,
             "path": path},
            {"name": "fresh", "index": idx, "build_df": base,
             "recent_df": base.limit(16), "refit": refit_fresh,
             "path": path},
        ]

        # ONE resolved apply batch suffices: files_per_bucket >= 5/4 >
        # the 1.2 threshold below (_fragmented_sb_corpus docstring)
        frag = fragmented_sb_corpus_cached(
            spark, sf_dir, os.path.join(tmp, "frag")
        )
        blocked = fragmented_sb_corpus_cached(
            spark, sf_dir, os.path.join(tmp, "blocked")
        )
        os.makedirs(os.path.join(blocked, "_sb_claims"), exist_ok=True)
        with open(os.path.join(blocked, "_sb_claims", "claim_9"), "a"):
            pass
        count_files = lambda d: len(  # noqa: E731
            glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        )
        frag_before = count_files(os.path.join(frag, "_sb_bands"))
        blocked_before = count_files(os.path.join(blocked, "_sb_bands"))

        plan, executed = run_maintenance(
            spark, layouts, [("frag", frag), ("blocked", blocked)],
            max_files_per_bucket=1.2, execute=True,
        )
        exec_ok = sorted(
            (e["target"], e["action"]) for e in executed
        ) == sorted(
            (a["target"], a["action"]) for a in plan if a["executable"]
        )
        fresh_ok = calls == ["stale"]
        compact_ok = count_files(os.path.join(frag, "_sb_bands")) < frag_before
        blocked_ok = (
            count_files(os.path.join(blocked, "_sb_bands")) == blocked_before
        )
        rebuilt = IvfIndex.load(spark, path)
        rep = quantization_error_report(
            rebuilt, drifted, drifted.limit(16)
        ).first()
        rebuild_ok = not rep["stale"] and not os.path.isdir(path + "_old")
        return spark.createDataFrame(
            [(n, bool(exec_ok), bool(fresh_ok), bool(compact_ok),
              bool(blocked_ok), bool(rebuild_ok))],
            "n_vectors long, executed_matches_plan boolean, "
            "fresh_never_refit boolean, compact_landed boolean, "
            "blocked_untouched boolean, rebuild_landed boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# writer_lease_contract (round 11): the single-writer lease that closes
# the last silent-duplicate hole in the ingest family — every dedup
# correctness proof (exact/near-dup/gated/semantic/payload) assumes ONE
# writer per corpus, and before this round nothing ENFORCED it: two
# concurrent ingest streams could each probe the same sidecar state,
# miss each other's in-flight appends, and land a duplicate silently.
# The lease (streaming/lease.py, corpus_dir/_writer_lease.json) is taken
# by every bootstrap/ingest/apply/compact verb; this row certifies the
# five behaviors the guarantee rests on: (1) a free corpus acquires and
# RELEASES (a completed verb never wedges the corpus); (2) a live
# foreign writer refuses loudly with the remedy; (3) a provably dead
# pid on this host is reclaimed automatically with an epoch bump;
# (4) force_lease=True takes over a live holder; (5) epoch fencing — a
# taken-over writer's next write attempt refuses and leaves the new
# owner's lease intact. Reference anchor: the reference is implicitly
# single-process (one CLI, one JSON file — main.cpp:66-70); the lease is
# that assumption made explicit on a shared filesystem.
# ---------------------------------------------------------------------------
@register(
    "writer_lease_contract",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS single_writer_releases,
           TRUE AS conflict_refuses,
           TRUE AS dead_pid_reclaims,
           TRUE AS force_takeover_works,
           TRUE AS fenced_writer_refuses
    FROM documents WHERE doc_id < 16
    """,
)
def q_writer_lease_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import socket
    import subprocess
    import tempfile

    from custom_vector_database_spark.streaming.lease import (
        LEASE_FILE,
        acquire_writer_lease,
        release_writer_lease,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        compact_fp_sidecar,
        corpus_ingest_apply_batch,
        stream_corpus_ingest,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 16)
    n = docs.count()
    tmp = tempfile.mkdtemp(prefix="cvdb_writer_lease_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        lease_path = os.path.join(corpus_dir, LEASE_FILE)
        docs.filter(F.col("doc_id") < 8).select("doc_id", "text").write.parquet(corpus_dir)
        fresh = docs.filter(F.col("doc_id") >= 8).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
        fresh.repartition(2).write.parquet(delta_dir)

        def plant(pid: int, epoch: int = 1) -> None:
            with open(lease_path, "w") as f:
                _json.dump({
                    "owner": "foreign", "epoch": epoch, "pid": pid,
                    "host": socket.gethostname(), "verb": "ingest:exact",
                }, f)

        def refuses(fn, needle: str) -> bool:
            try:
                fn()
                return False
            except ValueError as e:
                return needle in str(e)

        # (2) live foreign writer (pid 1 is always alive) refuses with
        # the remedy BEFORE any sidecar/corpus byte moves
        plant(pid=1)
        conflict_ok = refuses(
            lambda: stream_corpus_ingest(
                spark, delta_dir, corpus_dir,
                doc_schema=T_DOC_SCHEMA(), id_col="doc_id",
            ),
            "force_lease=True",
        ) and not os.path.isdir(os.path.join(corpus_dir, "_fingerprints"))

        # (4) force_lease=True takes over the live holder and runs
        n_batches = stream_corpus_ingest(
            spark, delta_dir, corpus_dir, doc_schema=T_DOC_SCHEMA(),
            id_col="doc_id", force_lease=True,
        )
        # (1) ...and releases on completion
        release_ok = n_batches >= 1 and not os.path.exists(lease_path)
        force_ok = n_batches >= 1

        # (3) a provably dead pid on this host reclaims automatically
        p = subprocess.Popen(["true"])
        p.wait()
        plant(pid=p.pid, epoch=3)
        stats = compact_fp_sidecar(spark, corpus_dir)
        dead_ok = stats["n_fps"] == 16 and not os.path.exists(lease_path)

        # (5) epoch fencing: we hold the lease, a usurper replaces it
        # (simulating a cross-host force takeover); our next write verb
        # refuses and the usurper's lease survives untouched
        acquire_writer_lease(corpus_dir, "ingest:exact")
        plant(pid=1, epoch=9)
        batch = fresh.withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
        fenced_ok = refuses(
            lambda: corpus_ingest_apply_batch(spark, batch, 7, corpus_dir),
            "FENCED",
        )
        with open(lease_path) as f:
            fenced_ok = fenced_ok and _json.load(f)["owner"] == "foreign"
        try:
            release_writer_lease(corpus_dir)
        except ValueError:
            pass  # fenced release refuses by contract; file stays foreign
        return spark.createDataFrame(
            [(n, bool(release_ok), bool(conflict_ok), bool(dead_ok),
              bool(force_ok), bool(fenced_ok))],
            "n_docs long, single_writer_releases boolean, "
            "conflict_refuses boolean, dead_pid_reclaims boolean, "
            "force_takeover_works boolean, fenced_writer_refuses boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def T_DOC_SCHEMA():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])


# ---------------------------------------------------------------------------
# stream_payload_cdc_ingest (round 11): the ingest family's codec-free
# NEAR-dup payload member. fp_kind='payload_md5' (round 10) catches only
# byte-identical media; a re-containered file — the same content stream
# behind a retagged header/footer — slips past it. This member
# fingerprints payloads by content-defined chunking (operators/
# multimodal.payload_cdc_chunks: rolling-hash boundary positions move
# WITH the content, so two containers of one payload share almost all
# chunk md5s) and drops an arrival iff a smaller-id batch sibling or a
# corpus payload shares >= 50% of its distinct chunks. The ENTIRE
# decision is recomputed in the oracle — boundaries, chunk md5s,
# one-hop intra-batch verdicts, cross-corpus containment — because both
# engines run the identical integer polynomial over the uppercase hex
# encoding (payload_cdc_chunks_duck). Fixture: corpus = even-doc
# payloads; delta (ONE micro-batch, so the one-hop verdicts are
# deterministic) = re-containered evens (mostly dropped), verbatim
# byte-copies (dropped), reversed-text payloads (content-fresh, mostly
# kept), and a reversed+retagged intra-delta near-dup pair. Kept ids
# are decided deterministically, so the contract is exact id-set
# equality (SUM(id) checksum). Multi-batch replay and crash recovery
# are pinned by tests/test_cdc_ingest.py.
# ---------------------------------------------------------------------------
def _cdc_duck_oracle() -> str:
    from custom_vector_database_spark.operators.multimodal import (
        payload_cdc_chunks_duck,
    )

    ch = payload_cdc_chunks_duck("p")
    return f"""
    WITH corpus AS (
      SELECT doc_id AS id, encode(text) AS p FROM documents
      WHERE doc_id % 2 = 0 AND doc_id < 500
    ), delta AS (
      SELECT doc_id + 1000000000 AS id,
             encode('RIFFHDR00001' || text || 'TRAILER0') AS p
      FROM documents WHERE doc_id % 4 = 0 AND doc_id < 500
      UNION ALL
      SELECT doc_id + 2000000000, encode(text)
      FROM documents WHERE doc_id % 4 = 2 AND doc_id < 500
      UNION ALL
      SELECT doc_id + 3000000000, encode(reverse(text))
      FROM documents WHERE doc_id % 2 = 1 AND doc_id < 500
      UNION ALL
      SELECT doc_id + 4000000000,
             encode('RIFFHDR00001' || reverse(text) || 'TRAILER0')
      FROM documents WHERE doc_id % 8 = 1 AND doc_id < 500
    ), cch AS (
      SELECT id, unnest(list_distinct({ch})) AS fp FROM corpus
    ), dch0 AS (
      SELECT id, list_distinct({ch}) AS chs FROM delta
    ), dch AS (
      SELECT id, len(chs) AS n, unnest(chs) AS fp FROM dch0
    ), intra AS (
      SELECT b.id FROM dch a JOIN dch b ON a.fp = b.fp AND a.id < b.id
      GROUP BY b.id, b.n, a.id HAVING COUNT(*) * 100 >= 50 * b.n
    ), cross_d AS (
      SELECT d.id FROM dch d JOIN cch c ON d.fp = c.fp
      GROUP BY d.id, d.n, c.id HAVING COUNT(*) * 100 >= 50 * d.n
    ), dropped AS (
      SELECT DISTINCT id FROM (
        SELECT id FROM intra UNION ALL SELECT id FROM cross_d
      )
    ), final AS (
      SELECT id FROM corpus
      UNION ALL
      SELECT id FROM delta WHERE id NOT IN (SELECT id FROM dropped)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(id) AS BIGINT) AS id_checksum,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dropped) AS n_dropped,
           TRUE AS ingest_ok
    FROM final
    """


@register("stream_payload_cdc_ingest", _cdc_duck_oracle())
def q_stream_payload_cdc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from custom_vector_database_spark.streaming.stream_ops import (
        _CDC_CHUNKS,
        stream_corpus_cdc_ingest,
    )

    # doc_id < 500 caps the fixture (inert at sf0.01, binds at larger
    # sf): the row prices the MECHANISM — chunk/dedup of ~500 media — not
    # an sf-linear corpus re-chunk; the oracle carries the same cap
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    enc = lambda c: F.encode(c, "UTF-8").cast("binary")  # noqa: E731
    corpus_df = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("media_id"), enc(F.col("text")).alias("payload")
    )
    delta_df = (
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000_000).alias("media_id"),
            enc(F.concat(F.lit("RIFFHDR00001"), F.col("text"),
                         F.lit("TRAILER0"))).alias("payload"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 2).select(
                (F.col("doc_id") + 2_000_000_000).alias("media_id"),
                enc(F.col("text")).alias("payload"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 2 == 1).select(
                (F.col("doc_id") + 3_000_000_000).alias("media_id"),
                enc(F.reverse(F.col("text"))).alias("payload"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 8 == 1).select(
                (F.col("doc_id") + 4_000_000_000).alias("media_id"),
                enc(F.concat(F.lit("RIFFHDR00001"), F.reverse(F.col("text")),
                             F.lit("TRAILER0"))).alias("payload"),
            )
        )
    )
    n_delta = delta_df.count()
    tmp = tempfile.mkdtemp(prefix="cvdb_payload_cdc_")
    try:
        corpus_dir = os.path.join(tmp, "corpus")
        delta_dir = os.path.join(tmp, "delta")
        corpus_df.write.parquet(corpus_dir)
        # ONE file -> ONE micro-batch: the intra-batch one-hop verdicts
        # are then deterministic (batch splits are an execution detail;
        # multi-batch replay is pinned by the pytest family suite)
        delta_df.repartition(1).write.parquet(delta_dir)
        n_batches = stream_corpus_cdc_ingest(
            spark, delta_dir, corpus_dir, doc_schema=corpus_df.schema,
            id_col="media_id", payload_col="payload",
            max_files_per_trigger=4,
        )
        final = (
            spark.read.parquet(corpus_dir)
            .select("media_id")
            .localCheckpoint(eager=True)  # tmp corpus deleted on return
        )
        with open(
            os.path.join(corpus_dir, _CDC_CHUNKS, "_sidecar_meta.json")
        ) as f:
            meta = _json.load(f)
        pins_ok = meta.get("cdc_mask") == 16 and meta.get("cdc_window") == 8
        agg = final.agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("media_id").alias("id_checksum"),
        )
        n_kept_new = final.filter(
            F.col("media_id") >= 1_000_000_000
        ).count()
        return agg.select(
            "n_media",
            "id_checksum",
            F.lit(n_delta - n_kept_new).cast("long").alias("n_dropped"),
            F.lit(bool(n_batches == 1 and pins_ok)).alias("ingest_ok"),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
