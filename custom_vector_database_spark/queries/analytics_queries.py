"""Event-analytics verbs over the events/orders tables: funnel analysis,
cohort retention, date-spine gap filling, and ordered list aggregation —
the standard product-analytics workload a general engine must express.
All pure Catalyst; all oracle-checked.

Determinism notes: week buckets use date_trunc('week') (Monday-start in
both Spark-UTC and DuckDB); offsets are exact integer day arithmetic;
list aggregation is emitted as a comma-joined SORTED string so the value
hash is independent of both engines' aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.queries_registry import load, register
from custom_vector_database_spark.queries.events_queries import load_events


# ---------------------------------------------------------------------------
# Funnel: view → click → purchase, each stage's first event strictly after
# the previous stage's. Three conditional min-aggregations per user (no
# self-join explosion — each pass is a map-side-combined agg over the same
# scan; at 100 TB this is 3 shuffles of (user, ts) pairs, never events).
# ---------------------------------------------------------------------------
@register(
    "funnel_view_click_purchase",
    """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS v FROM events WHERE event_type = 'view'
      GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS c
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts >= t1.v
      GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS p
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= t2.c
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM t1) AS n_view,
           (SELECT COUNT(*) FROM t2) AS n_view_click,
           (SELECT COUNT(*) FROM t3) AS n_view_click_purchase
    """,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by signup week; how many are active 0,
# 1, 2… weeks later. Two shuffles total (cohort assignment + the matrix
# agg); the matrix is (weeks × offsets) cells regardless of event volume.
# ---------------------------------------------------------------------------
@register(
    "cohort_retention_weekly",
    """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS aw
      FROM events e),
    j AS (
      SELECT c.user_id, c.cw,
             CAST((epoch(a.aw) - epoch(c.cw)) / 604800 AS BIGINT) AS week_offset
      FROM cohort c JOIN activity a ON c.user_id = a.user_id
      WHERE a.aw >= c.cw)
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
           COUNT(DISTINCT user_id) AS n_active
    FROM j GROUP BY cw, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("aw")
    ).distinct()
    j = (
        cohort.join(activity, "user_id")
        .filter(F.col("aw") >= F.col("cw"))
        .select(
            "user_id",
            "cw",
            ((F.unix_timestamp("aw") - F.unix_timestamp("cw")) / 604800)
            .cast("long")
            .alias("week_offset"),
        )
    )
    return (
        j.groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"), "week_offset"
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Date-spine gap fill: one row per (user, day) over each user's own active
# range, zero-filled — sequence+explode generates the spine (no calendar
# table needed), then a left join brings the counts. Spine size is
# users × days, independent of event volume.
# ---------------------------------------------------------------------------
@register(
    "date_spine_daily_events",
    """
    WITH bounds AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
      FROM events WHERE user_id < 10 GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events WHERE user_id < 10 GROUP BY 1, 2)
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, day
    """,
)
def q_date_spine_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 10)
    day = F.date_trunc("day", "ts")
    bounds = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# The pure-SQL kNN surface: the same top-10 as knn_exact, written entirely
# in SQL against the session's registered scalar functions
# (functions/sql_functions.py). A SQL function is inlined at analysis
# time, so this compiles to the identical codegen'd plan as the DataFrame
# path — asserted in tests/test_plans.py.
# ---------------------------------------------------------------------------
@register(
    "sql_knn_exact",
    """
    WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS vec_id,
           round(list_reduce(list_transform(list_zip(e.embedding, q.q),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
                      (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                 (acc, val) -> acc + val), 6) AS dist_sq
    FROM embeddings e CROSS JOIN q
    ORDER BY dist_sq ASC, vec_id ASC
    LIMIT 10
    """,
)
def q_sql_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.functions.sql_functions import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    load(spark, sf_dir, "embeddings").createOrReplaceTempView("_sql_emb")
    return spark.sql(
        """
        WITH q AS (SELECT embedding AS qv FROM _sql_emb WHERE vec_id = 0)
        SELECT e.vec_id AS vec_id, round(l2_sq(e.embedding, q.qv), 6) AS dist_sq
        FROM _sql_emb e CROSS JOIN q
        ORDER BY dist_sq ASC, vec_id ASC
        LIMIT 10
        """
    )


# ---------------------------------------------------------------------------
# Ordered list aggregation: each customer's order keys as one sorted
# comma-joined string — collect_list is unordered by contract, so
# sort_array fixes a canonical order BEFORE joining (and makes the result
# hashable against DuckDB's ORDER BY string_agg).
# ---------------------------------------------------------------------------
@register(
    "collect_orders_per_customer",
    """
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS orderkeys
    FROM orders
    WHERE o_custkey < 30
    GROUP BY o_custkey
    ORDER BY custkey
    """,
)
def q_collect_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias(
                "orderkeys"
            ),
        )
        .orderBy("custkey")
    )
