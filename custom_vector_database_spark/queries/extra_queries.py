"""Round-2 closers: oracle-checked Structured Streaming queries (tumbling +
session), an oracle-checked multimodal (mapInPandas) query, GROUPING SETS,
source-format roundtrips (CSV/JSON sinks+sources), exact percentiles,
TF-IDF, and the IVF ANN path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.queries_registry import load, load_spread, register

_DEC = "decimal(18,2)"


def _run_memory_stream(spark: SparkSession, agg_df, prefix: str) -> DataFrame:
    from custom_vector_database_spark.streaming import run_stream_to_memory

    return run_stream_to_memory(spark, agg_df, prefix)


# ---------------------------------------------------------------------------
# Structured Streaming, oracle-checked: the tumbling-window aggregation run
# as a real stream (file source → availableNow → complete-mode memory sink)
# must equal the same SQL any batch engine computes — so the DuckDB oracle
# is the batch tumbling-window query verbatim.
# ---------------------------------------------------------------------------
@register(
    "stream_tumbling_window",
    """
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts)
    ORDER BY window_start_us
    """,
)
def q_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.streaming import (
        stream_tumbling_agg,
        streaming_events,
    )

    out = _run_memory_stream(
        spark, stream_tumbling_agg(streaming_events(spark, sf_dir)), "stream_tumbling"
    )
    return out.orderBy("window_start_us")


# ---------------------------------------------------------------------------
# Streaming SLIDING window under the same enumerate-member-windows oracle as
# the batch sliding query (width 2h, slide 1h → 2 overlapping windows/event).
# ---------------------------------------------------------------------------
@register(
    "stream_sliding_window",
    """
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts) - i * INTERVAL '1 hour')
               AS window_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events, UNNEST([0, 1]) AS t(i)
    GROUP BY 1
    ORDER BY window_start_us
    """,
)
def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.streaming import (
        stream_sliding_agg,
        streaming_events,
    )

    out = _run_memory_stream(
        spark, stream_sliding_agg(streaming_events(spark, sf_dir)), "stream_sliding"
    )
    return out.orderBy("window_start_us")


# ---------------------------------------------------------------------------
# Streaming session window under the same gap-island oracle as the batch
# session query: stateful streaming session assembly must equal batch SQL.
# ---------------------------------------------------------------------------
@register(
    "stream_session_window",
    """
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '12 hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), y AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM y GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.streaming import (
        stream_session_agg,
        streaming_events,
    )

    out = _run_memory_stream(
        spark, stream_session_agg(streaming_events(spark, sf_dir)), "stream_session"
    )
    return out.orderBy("user_id", "session_start_us")


# ---------------------------------------------------------------------------
# Multimodal, oracle-checked: documents' text bytes stand in as opaque
# payloads; the Arrow-batched mapInPandas kernel computes byte length and
# sha256 — DuckDB computes the same digest natively, so the Python-side
# batching machinery itself is under the oracle.
# ---------------------------------------------------------------------------
@register(
    "multimodal_payload_stats",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    ORDER BY media_id
    """,
)
def q_multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.multimodal import image_features

    # cap the fan-out: each mapInPandas task pays a fixed Python-worker +
    # Arrow-channel cost that dwarfs per-row sha256 work at fixture scale
    # (measured at sf0.1: 32 tasks ~1.0-2.1 s, 8 tasks ~0.65 s); at real
    # scale the source has >= parallelism files and load_spread skips the
    # repartition entirely
    docs = load_spread(spark, sf_dir, "documents", max_partitions=8)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = image_features(media)
    return feats.select("media_id", "n_bytes", "sha256").orderBy("media_id")


# ---------------------------------------------------------------------------
# GROUPING SETS (the third grouping flavor next to rollup/cube): chosen
# subtotal combinations only.
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_orders",
    """
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY status, priority
    """,
)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority
        """
    )


# ---------------------------------------------------------------------------
# Source/sink roundtrips (SURVEY §2.2 'Connectors'): the engine's values
# must survive CSV and JSON sinks+sources bit-for-bit. Spark writes the
# format to a temp dir and reads it back; the oracle computes the same
# aggregate straight from the canonical parquet — equality proves the
# roundtrip lossless (shortest-repr float formatting round-trips exactly).
# ---------------------------------------------------------------------------
_ROUNDTRIP_ORACLE = """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_orderkey < 1000
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    import shutil
    import tempfile

    subset = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
    )
    tmp = tempfile.mkdtemp(prefix=f"cvdb_{fmt}_")
    try:
        path = f"{tmp}/data"
        subset.write.format(fmt).option("header", "true").save(path)
        back = (
            spark.read.format(fmt)
            .option("header", "true")
            .schema(
                "l_orderkey LONG, l_returnflag STRING, "
                "l_quantity DOUBLE, l_extendedprice DOUBLE"
            )
            .load(path)
        )
        out = _roundtrip_agg(back)
        result = spark.createDataFrame(out.collect(), out.schema)
        return result
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register("csv_roundtrip_agg", _ROUNDTRIP_ORACLE)
def q_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv")


@register("json_roundtrip_agg", _ROUNDTRIP_ORACLE)
def q_json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register("orc_roundtrip_agg", _ROUNDTRIP_ORACLE)
def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ORC: the third columnar interchange format Spark ships natively
    # (typed, so the write→read cycle is lossless without the CSV/JSON
    # shortest-repr float argument); same oracle as the other roundtrips.
    return _roundtrip(spark, sf_dir, "orc")


# ---------------------------------------------------------------------------
# Exact percentiles (Spark `percentile` = linear interpolation, the same
# definition as DuckDB quantile_cont); round(4) absorbs the one-ulp
# interpolation-formula difference.
# ---------------------------------------------------------------------------
@register(
    "percentiles_order_price",
    """
    SELECT o_orderstatus AS status,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def q_percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
            F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Approximate percentiles (Greenwald–Khanna sketch): the scale path for
# quantiles — mergeable per-partition sketches, one shuffle of O(sketch)
# state instead of a global sort. DuckDB's approx_quantile is a different
# sketch (t-digest), so the sketch OUTPUT can't hash-match — instead the
# query emits the exact percentiles (oracle-checkable values) plus one
# boolean per approx percentile asserting the documented GK guarantee:
# the TRUE RANK of the sketch value must be within N/accuracy (+1 for
# discreteness) of q*N. The rank is computed by broadcasting the 3-row
# sketch result back over the table — one extra scan, shuffle-free.
# Spark's GK sketch is deterministic for given data, so the booleans are
# stable; the oracle emits the exact values and TRUE — an out-of-bound
# sketch flips a boolean and fails the hash. (The same rank bound is
# asserted in tests/test_properties.py.)
# ---------------------------------------------------------------------------
@register(
    "approx_percentiles_order_price",
    """
    SELECT o_orderstatus AS status,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           TRUE AS ap50_ok, TRUE AS ap90_ok, TRUE AS ap99_ok
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def q_approx_percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    accuracy = 10_000  # GK rank error <= N / accuracy
    qs = [("50", 0.5), ("90", 0.9), ("99", 0.99)]

    sketch = orders.groupBy("o_orderstatus").agg(
        *[
            F.approx_percentile("o_totalprice", F.lit(q), F.lit(accuracy)).alias(
                f"ap{s}"
            )
            for s, q in qs
        ]
    )
    joined = orders.join(F.broadcast(sketch), "o_orderstatus")
    n = F.count(F.lit(1))
    aggs = [
        F.round(F.percentile("o_totalprice", F.lit(q)), 4).alias(f"p{s}")
        for s, q in qs
    ]
    for s, q in qs:
        rank = F.sum(
            (F.col("o_totalprice") <= F.col(f"ap{s}")).cast("long")
        )
        err = F.abs(rank.cast("double") - F.lit(q) * n.cast("double"))
        aggs.append((err <= n.cast("double") / accuracy + 1.0).alias(f"ap{s}_ok"))
    return (
        joined.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(*aggs)
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms: explode → term/document frequencies → idf join →
# global top-20 by score. The full inverted-index + join + window stack in
# one query, oracle-checked.
# ---------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x != '')) AS term
      FROM documents
    ), tf AS (
      SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, tf, df,
           round(tf * ln(CAST(n.n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf CROSS JOIN n
    ORDER BY tfidf DESC, term ASC
    LIMIT 20
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.text import tokenize

    docs = load_spread(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
    tf = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    return (
        tf.select(
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("term").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# IVF ANN search under the guarantee-oracle pattern (same reformulation as
# the HLL/GK/CMS queries): the output is the EXACT top-10 (deterministic,
# oracle-expressible) plus one boolean asserting the IVF result's quality —
# the partition-pruned nprobe=8/16 probe (over the SAVED cluster layout,
# built/priced by ivf_build) must recover at least half of the true top-10.
# The oracle computes the exact top-10 and TRUE, so the approximate
# operator is hash-checkable without pretending approximate = exact.
# Recall >= 0.9 at nprobe=12 is separately asserted in tests/test_recall.py;
# the >= 5/10 bound here is deliberately loose so regenerated data can
# never flip it. Replaces the reference's approximate O7
# (vectordb.cpp:120-156) with checkable semantics.
# ---------------------------------------------------------------------------
@register(
    "ivf_search",
    """
    WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS vec_id,
           round(list_reduce(list_transform(list_zip(e.embedding, q.q),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
                      (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                 (acc, v) -> acc + v), 6) AS dist_sq,
           TRUE AS ivf_ok
    FROM embeddings e CROSS JOIN q
    ORDER BY dist_sq ASC, vec_id ASC
    LIMIT 10
    """,
)
def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.queries.vector_queries import (
        _exact_with_recall_flag,
        saved_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    index = saved_index(spark, sf_dir, "ivf")
    return _exact_with_recall_flag(
        spark, sf_dir, index.search(query, k=10, nprobe=8), "ivf_ok", query=query
    )


# ---------------------------------------------------------------------------
# Custom stateful streaming operator (applyInPandasWithState) under a full
# oracle: the final per-user state must equal a plain GROUP BY.
# ---------------------------------------------------------------------------
@register(
    "stream_stateful_user_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.streaming import streaming_events
    from custom_vector_database_spark.streaming.stateful import user_running_stats

    from custom_vector_database_spark.streaming import run_stream_to_memory

    # update-mode sink appends one snapshot per (user, micro-batch); the
    # final state per user is the one with the highest running count
    snap = run_stream_to_memory(
        spark, user_running_stats(streaming_events(spark, sf_dir)),
        "stateful", output_mode="update",
    )
    final = snap.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value", "max_value")).alias("s")
    )
    return final.select(
        "user_id", "s.n_events", "s.total_value", "s.max_value"
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Per-(user, event_type) custom stateful stream under a full oracle: final
# emitted state must equal GROUP BY user_id, event_type. Runs on
# applyInPandasWithState (flat (user, type) key) — the verified API. The
# transformWithStateInPandas twin (stateful.user_type_spend) is
# EXPERIMENTAL, explicit-opt-in only: it has never executed in this
# environment (protobuf absent), so production paths no longer
# auto-dispatch to it; tests/test_streaming.py carries the protobuf-CI
# integration test that must go green before it is promoted.
# ---------------------------------------------------------------------------
@register(
    "stream_user_type_spend",
    """
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE user_id < 50
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def q_stream_user_type_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.streaming import (
        run_stream_to_memory,
        streaming_events,
    )
    from custom_vector_database_spark.streaming.stateful import (
        user_type_spend_compat,
    )

    ev = streaming_events(spark, sf_dir).filter(F.col("user_id") < 50)
    stream = user_type_spend_compat(ev)
    snap = run_stream_to_memory(spark, stream, "tws", output_mode="update")
    final = snap.groupBy("user_id", "event_type").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    return final.select(
        "user_id", "event_type", "s.n_events", "s.total_value"
    ).orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# Salted (skew-resistant) aggregation — bit-identical to the direct groupBy,
# proven by sharing the oracle of a plain GROUP BY.
# ---------------------------------------------------------------------------
@register(
    "salted_agg_lineitem",
    """
    SELECT l_returnflag AS returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY returnflag
    """,
)
def q_salted_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators.skew import salted_agg

    li = load(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_returnflag", "returnflag"
    )
    out = salted_agg(
        li,
        keys=["returnflag"],
        aggs={
            "n_items": ("count", F.lit(1)),
            "sum_qty": ("sum", F.col("l_quantity").cast(_DEC)),
            "max_price": ("max", F.col("l_extendedprice")),
        },
        salt=16,
    )
    return out.select(
        "returnflag",
        "n_items",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "max_price",
    ).orderBy("returnflag")


# ---------------------------------------------------------------------------
# Metadata-filtered k-NN (VERDICT r1 #7): the vector table's JSON metadata
# drives the predicate, extracted with get_json_object and pushed below the
# distance computation.
# ---------------------------------------------------------------------------
@register(
    "knn_metadata_filtered",
    """
    WITH v AS (
      SELECT vec_id, embedding,
             '{"label": ' || CAST(label AS VARCHAR) || ', "src": "emb"}' AS metadata
      FROM embeddings
    ), q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT v.vec_id AS vec_id,
           round(list_reduce(list_transform(list_zip(v.embedding, q.q),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
                      (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                 (acc, val) -> acc + val), 6) AS dist_sq
    FROM v CROSS JOIN q
    WHERE CAST(json_extract_string(v.metadata, '$.label') AS BIGINT) >= 5
    ORDER BY dist_sq ASC, vec_id ASC
    LIMIT 10
    """,
)
def q_knn_metadata_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.operators import knn as knn_ops

    emb = load(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id",
        "embedding",
        F.concat(
            F.lit('{"label": '), F.col("label").cast("string"), F.lit(', "src": "emb"}')
        ).alias("metadata"),
    )
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    predicate = F.get_json_object("metadata", "$.label").cast("long") >= 5
    return knn_ops.knn(
        vectors, qdf, k=10, id_col="vec_id", vec_col="embedding",
        predicate=predicate,
    )


# ---------------------------------------------------------------------------
# Analytic window functions beyond rank: lag / lead / ntile over per-user
# event sequences.
# ---------------------------------------------------------------------------
@register(
    "window_lag_lead_ntile",
    """
    SELECT event_id, user_id,
           COALESCE(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) AS since_prev_us,
           COALESCE(epoch_us(lead(ts) OVER w) - epoch_us(ts), -1) AS until_next_us,
           ntile(4) OVER w AS quartile
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def q_window_lag_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from custom_vector_database_spark.queries.events_queries import load_events

    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(us - F.lag(us).over(w), F.lit(-1)).alias("since_prev_us"),
        F.coalesce(F.lead(us).over(w) - us, F.lit(-1)).alias("until_next_us"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Approx distinct (HLL): the sketch estimate is engine-specific (DuckDB's
# approx_count_distinct uses a different HLL), so the query emits the exact
# count (oracle-checkable value) plus a boolean asserting Spark's estimate
# landed within 5×rsd of it — deterministic (Spark's HLL is hash-based and
# merge-order-independent), and a drifting sketch flips the boolean and
# fails the hash. The oracle computes the exact count and TRUE.
# ---------------------------------------------------------------------------
@register(
    "approx_distinct_parts",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rsd = 0.02
    approx = F.approx_count_distinct("l_partkey", rsd=rsd)
    exact = F.count_distinct("l_partkey")
    bound = (
        F.abs(approx.cast("double") - exact.cast("double"))
        <= F.lit(5 * rsd) * exact.cast("double")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact.alias("exact_parts"),
            bound.alias("approx_within_bound"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Pivot: order counts + decimal-exact revenue per status, one column per
# priority value (Spark .pivot with explicit value list → deterministic
# column set; oracle via CASE-WHEN aggregation).
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_COLS = {p: p.split("-")[0] for p in _PRIORITIES}  # '1-URGENT' → 'p1'


@register(
    "pivot_revenue_by_priority",
    f"""
    SELECT o_orderstatus AS status,
           {", ".join(
               f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' "
               f"THEN CAST(o_totalprice AS DECIMAL(18,2)) "
               f"ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p{c}"
               for p, c in _PIV_COLS.items()
           )}
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def q_pivot_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    piv = (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.coalesce(F.sum(F.col("o_totalprice").cast(_DEC)),
                        F.lit(0).cast("decimal(28,2)")))
    )
    renamed = piv.select(
        "status",
        *[F.col(f"`{p}`").cast("double").alias(f"rev_p{c}") for p, c in _PIV_COLS.items()],
    )
    return renamed.orderBy("status")


# ---------------------------------------------------------------------------
# VariantType (Spark 4): semi-structured metadata as a first-class variant
# (SURVEY §1.2 'VariantType on Spark 4.x'). Same values as the
# string-path json_extract query, which is what the oracle computes.
# ---------------------------------------------------------------------------
@register(
    "variant_metadata_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_variant_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.queries.events_queries import load_events

    ev = load_events(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.max(k).alias("max_k"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery: orders priced above their customer's average.
# ---------------------------------------------------------------------------
@register(
    "scalar_subquery_above_avg",
    """
    SELECT o_orderkey AS orderkey, o_custkey AS custkey
    FROM orders o
    WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5 FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    ORDER BY orderkey
    """,
)
def q_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey AS orderkey, o_custkey AS custkey
        FROM _sq_orders o
        WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5 FROM _sq_orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        ORDER BY orderkey
        """
    )


# ---------------------------------------------------------------------------
# intersectAll / exceptAll (bag semantics — duplicates preserved, unlike the
# set-semantics pair in set_ops_nations).
# ---------------------------------------------------------------------------
@register(
    "bag_set_ops_priorities",
    """
    WITH f AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O')
    SELECT p, COUNT(*) AS n FROM (
      SELECT p FROM f INTERSECT ALL SELECT p FROM o
    ) GROUP BY p
    ORDER BY p
    """,
)
def q_bag_set_ops_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("p")
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("p")
    )
    return (
        f.intersectAll(o)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("p")
    )
