"""Relational analytics over the TPC-H-ish driver tables — SURVEY.md §2.2.

Every standard category the reference lacks (joins, aggregation, windows,
rollup/cube, semi/anti joins, set ops, string/date functions) expressed as
pure Catalyst plans with a DuckDB oracle twin. No UDFs anywhere.

Scale notes (100 TB discipline):
- Dimension tables (region/nation, and customer vs orders where it is the
  small side) join with an explicit broadcast() hint — no shuffle of the
  fact table.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE handles
  skew/coalescing (session.py enables both).
- GroupBy aggregates are partial+final automatically (map-side combine);
  DECIMAL sums keep them associative AND cross-engine exact.
- Windows partition by a key (never a global window over big data); running
  frames use DECIMAL so segment-tree vs streaming accumulation order cannot
  diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_vector_database_spark.queries_registry import load, register

_DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


# ---------------------------------------------------------------------------
# Aggregation (hash agg, partial+final): TPC-H Q1-style pricing summary.
# ---------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Broadcast join chain: fact (customer) ⋈ broadcast dims (nation, region).
# Plan: two BroadcastHashJoins, zero shuffle of customer.
# ---------------------------------------------------------------------------
@register(
    "join_broadcast_enrich",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def q_join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# Fact-fact shuffle join (orders ⋈ lineitem on orderkey) + aggregation.
# At scale both sides hash-partition on l_orderkey; AQE coalesces.
# ---------------------------------------------------------------------------
@register(
    "join_orders_lineitem_agg",
    """
    SELECT o.o_orderpriority AS priority,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def q_join_orders_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count_distinct(F.col("o_orderkey")).alias("n_orders"),
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — the 6-table "local supplier volume" join: two fact-fact
# shuffle joins (orders⋈lineitem⋈supplier) with every dimension
# (customer/nation/region) broadcast, a pushed-down date-range + region
# filter, and the local-supplier correlation (c_nationkey = s_nationkey)
# applied as a join-side predicate. The canonical join-ordering/broadcast
# stress test for an analytics engine.
# ---------------------------------------------------------------------------
@register(
    "tpch_q5_local_supplier_revenue",
    """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q_tpch_q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Window / rank: top-3 orders per customer by totalprice.
# Shuffles only (custkey, orderkey, price) triples, partitioned by custkey.
# ---------------------------------------------------------------------------
@register(
    "window_top_orders_per_cust",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY custkey, rn
    """,
)
def q_window_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("custkey", "rn")
    )


# ---------------------------------------------------------------------------
# Window / running frame: cumulative spend per customer over order dates.
# DECIMAL keeps the frame sum exact whether the engine accumulates
# streaming (Spark) or via segment tree (DuckDB).
# ---------------------------------------------------------------------------
@register(
    "window_running_spend",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders
    FROM orders
    WHERE o_custkey < 30
    ORDER BY custkey, orderkey
    """,
)
def q_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    ).orderBy("custkey", "orderkey")


# ---------------------------------------------------------------------------
# RANGE window frame (value-based, vs ROWS' position-based frames above):
# per customer, spend within the trailing 30 DAYS of each order — peers at
# the same orderdate all see the same frame, and the frame width is a data
# value, not a row count. Ordering key = integer epoch days on both sides
# so the RANGE arithmetic is identical.
# ---------------------------------------------------------------------------
@register(
    "window_range_frame_spend",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS order_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS spend_30d,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS orders_30d
    FROM orders
    WHERE o_custkey < 30
    ORDER BY custkey, orderkey
    """,
)
def q_window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        day.alias("order_day"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("orders_30d"),
    ).orderBy("custkey", "orderkey")


# ---------------------------------------------------------------------------
# Rollup: hierarchical subtotals (returnflag → linestatus → grand total).
# NULL grouping slots coalesced to '(all)' on both sides so the compare
# never depends on engine NULL-sort placement.
# ---------------------------------------------------------------------------
@register(
    "rollup_pricing",
    """
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Cube: all grouping-set combinations of (orderstatus, orderpriority).
# ---------------------------------------------------------------------------
@register(
    "cube_status_priority",
    """
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# Left-semi join: customers that have at least one finished ('F') order.
# Broadcast of the (distinct-keyed) probe side when small; semi join never
# duplicates customer rows regardless of order multiplicity.
# ---------------------------------------------------------------------------
@register(
    "semi_join_customers",
    """
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    ORDER BY custkey
    """,
)
def q_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Left-anti join: customers with no orders at all (the reference's delete
# is the degenerate by-key form of this, SURVEY §2.2).
# ---------------------------------------------------------------------------
@register(
    "anti_join_customers",
    """
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY custkey
    """,
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent order (the unrestricted anti-join is
    vacuously empty on this data — every customer has some order)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Set ops: INTERSECT + EXCEPT + UNION ALL in one result — nations that have
# customers, partitioned into those that also have suppliers and those that
# don't.
# ---------------------------------------------------------------------------
@register(
    "set_ops_nations",
    """
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT tag, n_name AS nation_name FROM (
      SELECT 'both' AS tag, nk FROM (SELECT nk FROM cust_nations INTERSECT SELECT nk FROM supp_nations)
      UNION ALL
      SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cust_nations EXCEPT SELECT nk FROM supp_nations)
    ) t JOIN nation n ON t.nk = n.n_nationkey
    ORDER BY tag, nation_name
    """,
)
def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_n = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    supp_n = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    nation = load(spark, sf_dir, "nation")
    both = cust_n.intersect(supp_n).withColumn("tag", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("tag", F.lit("cust_only"))
    return (
        both.unionByName(cust_only)
        .join(F.broadcast(nation), F.col("nk") == nation.n_nationkey)
        .select("tag", F.col("n_name").alias("nation_name"))
        .orderBy("tag", "nation_name")
    )


# ---------------------------------------------------------------------------
# Distinct / count-distinct per group.
# ---------------------------------------------------------------------------
@register(
    "distinct_customers_per_segment",
    """
    SELECT c_mktsegment AS segment,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def q_distinct_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("c_nationkey").alias("n_nations"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# String functions: upper/substring/length/split/regexp over part.
# ---------------------------------------------------------------------------
@register(
    "string_funcs_part",
    """
    SELECT p_partkey AS partkey,
           upper(p_brand) AS brand_u,
           substr(p_type, 1, 5) AS type5,
           length(p_name) AS name_len,
           len(string_split(p_name, ' ')) AS n_words,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled
    FROM part
    ORDER BY partkey
    """,
)
def q_string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").alias("name_len"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("devoweled"),
    ).orderBy("partkey")


# ---------------------------------------------------------------------------
# Date/time functions: monthly revenue roll-up from order timestamps.
# ---------------------------------------------------------------------------
@register(
    "date_funcs_monthly_revenue",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    ORDER BY order_month
    """,
)
def q_date_funcs_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape (promo revenue ratio): fact⋈dim join + conditional
# aggregation + a final scalar ratio. Both numerator and denominator are
# exact decimal sums; the single ratio division is the only float op, so
# it's bit-identical across engines. The part dim broadcasts; lineitem is
# filtered on the pushed-down shipdate range before the join.
# ---------------------------------------------------------------------------
@register(
    "tpch_q14_promo_revenue",
    """
    SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
    """,
)
def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast(_DEC) - _dec("l_discount")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast(_DEC)
    )
    return li.join(
        F.broadcast(part), li["l_partkey"] == F.col("p_partkey")
    ).agg(
        # ×100 stays in the decimal domain (DuckDB's 100.0 literal is a
        # DECIMAL, so its multiply is exact pre-cast — match that)
        (
            (F.sum(promo) * 100).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )
