"""Event-stream analytics over the `events` table — JSON metadata access,
event-time windows (tumbling + session), as-of join, and a banded range
join. SURVEY §2.2 rows: Map/JSON functions, Date/time, event-time windows,
Range/as-of joins.

Window starts are emitted as epoch microseconds (unix_micros / epoch_us) —
integers, immune to timestamp-formatting drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.asof import asof_join
from custom_vector_database_spark.queries_registry import load, register

_DEC = "decimal(18,2)"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as a naive TIMESTAMP(MICROS); Spark infers
    TIMESTAMP_NTZ for it. Cast to session-tz TIMESTAMP (session tz is UTC,
    so the wall clock is preserved and unix_micros matches DuckDB's
    epoch_us of the same naive value) — downstream window/as-of/interval
    code all operates on plain TIMESTAMP."""
    ev = load(spark, sf_dir, "events")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


# ---------------------------------------------------------------------------
# JSON metadata access (reference touchpoint: metadata["name"], test.cpp:76;
# json::parse, main.cpp:68). get_json_object is pure Catalyst.
# ---------------------------------------------------------------------------
@register(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / COUNT(*), 6) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row JSON parsing is the cost here; spread the single-file scan
    # across cores before it (see queries_registry.load_spread rationale)
    ev = load_events(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Tumbling event-time window (batch window(); the Structured Streaming twin
# lives in streaming/ and is asserted equal in tests). Epoch-aligned 1-hour
# buckets match DuckDB's time_bucket.
# ---------------------------------------------------------------------------
@register(
    "event_tumbling_window",
    """
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts)
    ORDER BY window_start_us
    """,
)
def q_event_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start_us")
    )


# ---------------------------------------------------------------------------
# SLIDING event-time window (width 2h, slide 1h — every event lands in
# exactly width/slide = 2 overlapping windows). Oracle: enumerate each
# event's member windows (the slide-aligned bucket and the one before it)
# and aggregate — the relational definition of a sliding window.
# ---------------------------------------------------------------------------
@register(
    "event_sliding_window",
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
def q_event_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start_us")
    )


# ---------------------------------------------------------------------------
# Session window: per-user sessions closed by a 12-hour inactivity gap.
# Spark's session_window starts a NEW session when the inter-event gap is
# >= the gap duration (next_ts >= prev_ts + gap); the oracle's gap-and-island
# SQL uses the same strict boundary.
# ---------------------------------------------------------------------------
@register(
    "event_session_window",
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
def q_event_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start_us")
    )


# ---------------------------------------------------------------------------
# As-of join: for every purchase, the latest click by the same user at or
# before the purchase. Oracle: DuckDB's native ASOF LEFT JOIN. Missing
# matches coalesce to -1 so the compared columns stay integral.
# ---------------------------------------------------------------------------
@register(
    "asof_purchase_click",
    """
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           COALESCE(epoch_us(c.ts), -1) AS click_ts_us,
           COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY event_id
    """,
)
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.coalesce(F.unix_micros("ts_right"), F.lit(-1)).alias("click_ts_us"),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros("ts_right"), F.lit(-1)
        ).alias("gap_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Interval-overlap join (the third of the range/as-of/interval triple):
# per-user daily click-activity intervals ⋈ view-activity intervals that
# OVERLAP (a.start <= b.end AND b.start <= a.end). The equi-key (user_id)
# keeps the join hash-partitioned; the overlap predicate only filters within
# user groups — never a cross product. Overlap length in exact integer
# microseconds.
# ---------------------------------------------------------------------------
@register(
    "interval_join_activity_overlap",
    """
    WITH c AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
             MIN(ts) AS c_start, MAX(ts) AS c_end
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, time_bucket(INTERVAL '1 day', ts)
    ), v AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
             MIN(ts) AS v_start, MAX(ts) AS v_end
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, time_bucket(INTERVAL '1 day', ts)
    )
    SELECT c.user_id AS user_id,
           COUNT(*) AS n_overlaps,
           CAST(SUM(epoch_us(least(c.c_end, v.v_end))
               - epoch_us(greatest(c.c_start, v.v_start))) AS BIGINT) AS total_overlap_us
    FROM c JOIN v ON c.user_id = v.user_id
                 AND c.c_start <= v.v_end AND v.v_start <= c.c_end
    GROUP BY c.user_id
    ORDER BY user_id
    """,
)
def q_interval_join_activity_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)

    def day_intervals(event_type: str, prefix: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy("user_id", F.window("ts", "1 day").alias("d"))
            .agg(
                F.min("ts").alias(f"{prefix}_start"),
                F.max("ts").alias(f"{prefix}_end"),
            )
            .drop("d")
        )

    clicks = day_intervals("click", "c")
    views = day_intervals("view", "v").withColumnRenamed("user_id", "v_user_id")
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("c_start") <= F.col("v_end"))
        & (F.col("v_start") <= F.col("c_end")),
    )
    overlap_us = F.unix_micros(F.least("c_end", "v_end")) - F.unix_micros(
        F.greatest("c_start", "v_start")
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(overlap_us).alias("total_overlap_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Banded range join: ordered event pairs of the same user within 24 hours —
# an equi-join on the key plus a band predicate, aggregated to per-user
# counts. The equi key keeps the join hash-partitioned (no cross product);
# the band only filters within user partitions.
# ---------------------------------------------------------------------------
@register(
    "range_join_event_pairs",
    """
    SELECT a.user_id AS user_id,
           COUNT(*) AS n_pairs,
           CAST(SUM(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS total_gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '24 hours'
    GROUP BY a.user_id
    ORDER BY user_id
    """,
)
def q_range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 24 HOURS")),
    )
    return (
        pairs.groupBy(F.col("a.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))
            ).alias("total_gap_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous aggregate: ONE pass building hour+day+month
# rollups via GROUPING SETS (the multi-granularity materialization a
# time-series store maintains). Identical SQL on both engines; Spark
# executes it as a single Expand + hash aggregate — no per-granularity
# rescan.
# ---------------------------------------------------------------------------
_MGR_SQL = """
    SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                WHEN grouping(d) = 0 THEN 'day'
                ELSE 'month' END AS gran,
           {epoch}(coalesce(h, d, m)) AS bucket_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                 date_trunc('month', ts) AS m, value
          FROM {src})
    GROUP BY GROUPING SETS ((h), (d), (m))
    ORDER BY gran, bucket_us
"""


@register(
    "multi_granularity_rollup",
    _MGR_SQL.format(epoch="epoch_us", src="events"),
)
def q_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_events(spark, sf_dir).createOrReplaceTempView("events_mgr")
    return spark.sql(_MGR_SQL.format(epoch="unix_micros", src="events_mgr"))


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users, the scalable formulation: dedupe to daily
# (day, user) pairs FIRST, fan each pair out to its ≤7 member windows
# (explode(sequence)), then COUNT(DISTINCT) per window day — equi-joins and
# keyed aggregations only, no range join over the raw stream. The
# sketch-merge variant below (daily HLL → hll_union_agg over member
# windows) is what you run when exact distinct is too expensive; the test
# asserts it lands within HLL error of this exact result.
# ---------------------------------------------------------------------------
@register(
    "rolling_7d_active_users",
    """
    WITH bounds AS (
      SELECT date_trunc('day', MAX(ts)) AS d1 FROM events
    ), daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), fan AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wday,
             user_id
      FROM daily
    )
    SELECT strftime(wday, '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS active_users
    FROM fan, bounds WHERE wday <= d1
    GROUP BY wday ORDER BY day
    """,
)
def q_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    day = F.date_trunc("day", "ts")
    daily = ev.select(day.alias("day"), "user_id").distinct()
    fan = daily.select(
        F.explode(
            F.sequence("day", F.expr("day + INTERVAL 6 DAY"), F.expr("INTERVAL 1 DAY"))
        ).alias("wday"),
        "user_id",
    )
    d1 = ev.agg(F.date_trunc("day", F.max("ts")).alias("d1"))
    return (
        fan.join(F.broadcast(d1), fan["wday"] <= F.col("d1"))
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(F.date_format("wday", "yyyy-MM-dd").alias("day"), "active_users")
        .orderBy("day")
    )


# Registered twin of the sketch-merge path, hash-checkable like the other
# sketch queries: emits the EXACT per-window distinct count plus a boolean
# asserting the merged-HLL estimate landed within 5× the sketch's relative
# standard deviation (default lgConfigK=12 → rsd ≈ 1.6%, bound 8%). The
# oracle computes the exact counts and TRUE; a drifting sketch or a broken
# union flips a boolean and fails the hash.
@register(
    "rolling_7d_active_users_hll",
    """
    WITH bounds AS (
      SELECT date_trunc('day', MAX(ts)) AS d1 FROM events
    ), daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), fan AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wday,
             user_id
      FROM daily
    )
    SELECT strftime(wday, '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS active_users,
           TRUE AS hll_ok
    FROM fan, bounds WHERE wday <= d1
    GROUP BY wday ORDER BY day
    """,
)
def q_rolling_7d_active_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    exact = q_rolling_7d_active_users(spark, sf_dir)
    approx = rolling_active_users_hll(ev).withColumnRenamed(
        "active_users", "hll_users"
    )
    bound = 5 * 1.04 / (2**12) ** 0.5  # 5 × rsd(lgConfigK=12) ≈ 8%
    return (
        exact.join(approx, "day")
        .select(
            "day",
            "active_users",
            (
                F.abs(F.col("hll_users") - F.col("active_users"))
                <= F.lit(bound) * F.col("active_users")
            ).alias("hll_ok"),
        )
        .orderBy("day")
    )


def rolling_active_users_hll(ev: DataFrame, window_days: int = 7) -> DataFrame:
    """Sketch-merge rolling uniques: ONE HLL sketch per day (map-side
    combinable), then union the ≤`window_days` member sketches per window.
    At 100 TB this is the only tractable shape — state per day is a ~KB
    sketch instead of the user set, and re-aggregation never touches raw
    events. Approximate (~2% HLL error); exactness contract is the
    registered exact query above."""
    day = F.date_trunc("day", "ts")
    daily = ev.groupBy(day.alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    fan = daily.select(
        F.explode(
            F.sequence(
                "day",
                F.expr(f"day + INTERVAL {window_days - 1} DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("wday"),
        "sk",
    )
    d1 = ev.agg(F.date_trunc("day", F.max("ts")).alias("d1"))
    return (
        fan.join(F.broadcast(d1), fan["wday"] <= F.col("d1"))
        .groupBy("wday")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("active_users"))
        .select(F.date_format("wday", "yyyy-MM-dd").alias("day"), "active_users")
        .orderBy("day")
    )
