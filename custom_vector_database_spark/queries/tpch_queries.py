"""The remaining TPC-H query shapes, adapted to the driver schema — SURVEY §2.2.

Rounds 1-4 covered Q1/Q3/Q5/Q6/Q10/Q14/Q18; this module completes the suite
with Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q19/Q20/Q21/Q22 — all 22 TPC-H
query shapes are now represented — each adapted to the
columns the synthetic tables actually carry (no partsupp table; no
l_shipmode / l_commitdate / l_receiptdate / c_phone / p_container):

- supply cost (Q2/Q9/Q20)   -> observed lineitem unit price / a retailprice
                               cost proxy / shipped-quantity share
- commit-vs-receipt lateness (Q4/Q12/Q21) -> l_shipdate vs o_orderdate + N days
- phone country code (Q22)  -> c_nationkey mod 5
Each adaptation keeps the REFERENCE QUERY's plan shape (the join graph,
the correlation structure, the agg pattern) — that is what is being
exercised, not TPC-H compliance.

Scale notes (100 TB discipline): region/nation/part/supplier are dimension
tables -> broadcast; customer broadcasts where it joins a fact table alone.
orders ⋈ lineitem is the only fact-fact shuffle, always on the join key.
Correlated per-part / per-order subqueries become small keyed aggregates
joined back (never a window over the whole fact table without a partition
key). DECIMAL(18,2) before any money arithmetic keeps partial aggregation
associative and bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_vector_database_spark.queries_registry import load, register

_DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


def _revenue():
    return F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    ).cast("double")


_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# Q2 (adapted): minimum-cost supplier per part. No partsupp, so "cost" is the
# minimum OBSERVED unit price (extendedprice/quantity) a supplier charged for
# the part, restricted to suppliers in EUROPE and STANDARD parts of size<=15.
# Plan shape preserved: part x (per-(part,supplier) min) with a per-part
# argmin, dims broadcast. The argmin is a window over the SMALL aggregated
# (part, supplier) table — never over lineitem itself.
# ---------------------------------------------------------------------------
@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH per_ps AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             MIN(round(l.l_extendedprice / l.l_quantity, 6)) AS unit_price
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD' AND p.p_size <= 15
      GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_name
    )
    SELECT p_partkey AS partkey, p_name AS part_name, s_name AS supp_name,
           unit_price
    FROM (
      SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY unit_price ASC, s_suppkey ASC) AS rn
      FROM per_ps
    ) WHERE rn = 1
    ORDER BY unit_price ASC, partkey ASC
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    per_ps = (
        li.join(
            F.broadcast(
                part.filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name")
        .agg(
            F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)).alias(
                "unit_price"
            )
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("unit_price").asc(), F.col("s_suppkey").asc()
    )
    return (
        per_ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            "unit_price",
        )
        .orderBy(F.col("unit_price").asc(), F.col("partkey").asc())
    )


# ---------------------------------------------------------------------------
# Q4 (adapted): order-priority checking. "Late" (commitdate < receiptdate in
# the reference) becomes l_shipdate > o_orderdate + 30 days. The EXISTS is a
# LEFT SEMI join of orders against late lineitems — Spark never materializes
# the multiplicity, and the semi join build side is the FILTERED fact slice.
# ---------------------------------------------------------------------------
@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 (adapted): volume shipping between nation pairs — supplier nations in
# EUROPE shipping to customer nations in ASIA, revenue by (supp_nation,
# cust_nation, year). Same 6-table join graph as the reference query; the
# two nation legs broadcast, the orders ⋈ lineitem shuffle carries only the
# keys + money columns.
# ---------------------------------------------------------------------------
@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {_REV_SQL} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r1  ON n1.n_regionkey = r1.r_regionkey
    JOIN region r2  ON n2.n_regionkey = r2.r_regionkey
    WHERE r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    n1 = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 (adapted): national market share — the share of NATION_3 suppliers in
# ASIA-region PROMO-part revenue, by order year. The CASE-inside-SUM ratio is
# one pass; numerator and denominator stay DECIMAL until the final divide.
# ---------------------------------------------------------------------------
@register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n2 = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"), "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0).cast(_DEC)
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 (adapted): product-type profit. No ps_supplycost, so cost is proxied by
# half the part's retail price per unit: profit = extprice*(1-disc) -
# qty * 0.5 * p_retailprice, for parts named '%widget%', grouped by supplier
# nation x order year — the reference's exact output shape.
# ---------------------------------------------------------------------------
@register(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) -
                    CAST(l.l_quantity AS DECIMAL(18,2)) *
                    CAST(0.5 AS DECIMAL(18,2)) *
                    CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    profit = _dec("l_extendedprice") * (
        F.lit(1).cast(_DEC) - _dec("l_discount")
    ) - _dec("l_quantity") * F.lit(0.5).cast(_DEC) * _dec("p_retailprice")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 (adapted): important stock. No partsupp, so a part's "stock value"
# is the revenue EUROPE-region suppliers shipped for it; keep parts above
# 1.5× the AVERAGE part value (scale-invariant selectivity — the absolute
# 0.1%-of-total fraction keeps ~everything on a 200-part dimension) — the
# reference's HAVING > (scalar subquery × fraction) shape, decorrelated
# to one keyed aggregate + one broadcast scalar.
# ---------------------------------------------------------------------------
@register(
    "tpch_q11_important_stock",
    f"""
    WITH pv AS (
      SELECT l.l_partkey, {_REV_SQL} AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS partkey, value
    FROM pv
    WHERE value > (SELECT AVG(value) * 1.5 FROM pv)
    ORDER BY value DESC, partkey
    """,
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    pv = (
        li.join(F.broadcast(euro_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(_revenue().alias("value"))
    )
    thresh = pv.agg((F.avg("value") * 1.5).alias("thresh"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("thresh"))
        .select("partkey", "value")
        .orderBy(F.col("value").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# Q12 (adapted): shipping-latency vs order priority. No l_shipmode, so lines
# bucket into SLOW/FAST by whether they shipped >90 days after the order
# date; the reference's CASE-sum on priority classes is kept verbatim.
# ---------------------------------------------------------------------------
@register(
    "tpch_q12_latency_priority",
    """
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_bucket
    ORDER BY ship_bucket
    """,
)
def q_tpch_q12_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                F.lit("SLOW"),
            ).otherwise(F.lit("FAST")),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution. Two-level aggregation: orders per
# customer (left join keeps zero-order customers), then customers per count.
# The priority filter stands in for the reference's comment NOT LIKE filter.
# ---------------------------------------------------------------------------
@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue. The revenue view is a keyed
# aggregate (one row per supplier); the MAX comparison runs over that tiny
# aggregate, not the fact table, so the unpartitioned window is safe at any
# fact scale (suppliers ~ sqrt of data). DECIMAL sums make the equality exact.
# ---------------------------------------------------------------------------
@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY suppkey
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    # the MAX is one scalar: aggregate it and broadcast the 1-row frame
    # back over the per-supplier aggregate. An unpartitioned window here
    # would move every supplier row to ONE partition to compute the same
    # scalar — the single-partition WindowExec anti-pattern.
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
    )
    return (
        F.broadcast(supp)
        .join(top, supp.s_suppkey == F.col("supplier_no"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 (adapted): supplier diversity per part group. partsupp becomes the
# DISTINCT (part, supplier) pairs observed in lineitem; the brand/type
# exclusion filters are the reference's. COUNT(DISTINCT) over the pair set.
# ---------------------------------------------------------------------------
@register(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type NOT LIKE 'PROMO%'
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (~F.col("p_type").like("PROMO%"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue. The correlated per-part avg-quantity
# subquery becomes a per-part aggregate joined back (broadcast — one row per
# part), exactly how Catalyst would decorrelate it; threshold compare and the
# final single-row sum stay engine-exact (DECIMAL sum, double divide).
# ---------------------------------------------------------------------------
@register(
    "tpch_q17_small_qty_revenue",
    """
    SELECT round(COALESCE(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
                          0.0) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                        / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return joined.agg(
        F.round(
            F.coalesce(F.sum(_dec("l_extendedprice")).cast("double"), F.lit(0.0))
            / 7.0,
            2,
        ).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Q19 (adapted): discounted revenue under a disjunctive brand/size/quantity
# predicate (container/shipmode clauses dropped — columns absent). The whole
# OR-of-ANDs stays one pushed scan predicate; no join shape at all beyond the
# broadcast part dim.
# ---------------------------------------------------------------------------
@register(
    "tpch_q19_discounted_revenue",
    f"""
    SELECT COALESCE({_REV_SQL}, 0.0) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 5 AND 35)
       OR (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity BETWEEN 10 AND 50)
    """,
)
def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    pred = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(5, 35)
    ) | (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(10, 50)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(F.coalesce(_revenue(), F.lit(0.0)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 (adapted): excess suppliers of 'red%' parts. partsupp availability
# becomes shipped quantity: suppliers whose 1997 shipped quantity of red
# parts exceeds the average over shipping suppliers. Nested aggregate ->
# scalar threshold -> semi join back to supplier, all on keyed aggregates.
# ---------------------------------------------------------------------------
@register(
    "tpch_q20_excess_suppliers",
    """
    WITH shipped AS (
      SELECT l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, sh.qty AS red_qty
    FROM supplier s JOIN shipped sh ON s.s_suppkey = sh.l_suppkey
    WHERE sh.qty > (SELECT AVG(qty) FROM shipped)
    ORDER BY suppkey
    """,
)
def q_tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("qty"))
    )
    # scalar AVG via aggregate + broadcast crossJoin, not an
    # unpartitioned window (which would single-thread all suppliers)
    avg_qty = shipped.agg(F.avg("qty").alias("__avg_qty"))
    above = (
        shipped.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("qty") > F.col("__avg_qty"))
        .drop("__avg_qty")
    )
    return (
        F.broadcast(supp)
        .join(above, supp.s_suppkey == F.col("l_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("qty").alias("red_qty"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting. "Late" = shipped >60 days
# after the order date (no commit/receipt dates). The reference's
# EXISTS(other supplier) / NOT EXISTS(other late supplier) pair becomes one
# per-order aggregate — n_suppliers and n_late_suppliers — joined back to the
# per-(order, supplier) late flags: the sole-late-supplier-in-a-multi-
# supplier-order condition, with no correlated scans of lineitem.
# ---------------------------------------------------------------------------
@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH flags AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
      FROM flags GROUP BY l_orderkey
    )
    SELECT s.s_name AS supp_name, COUNT(*) AS numwait
    FROM flags f
    JOIN per_order po ON f.l_orderkey = po.l_orderkey
    JOIN supplier s   ON f.l_suppkey = s.s_suppkey
    WHERE f.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY supp_name
    ORDER BY numwait DESC, supp_name
    """,
)
def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    flags = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(li.l_orderkey, li.l_suppkey)
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = flags.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        flags.filter(F.col("is_late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "supp_name")
    )


# ---------------------------------------------------------------------------
# Q22 (adapted): idle wealthy customers. Country code = c_nationkey mod 5 (no
# phone column); "no orders" = no orders since 1999 (every synthetic customer
# has SOME order). The positive-balance average is one scalar aggregate
# broadcast into the filter; the no-recent-orders test is an ANTI join.
# ---------------------------------------------------------------------------
@register(
    "tpch_q22_idle_customers",
    """
    WITH eligible AS (
      SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
      FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE e.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                         FROM eligible WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    eligible = cust.filter((F.col("c_nationkey") % 5).isin(0, 1, 2)).select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 5).alias("cntrycode")
    )
    avg_row = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thresh")
    )
    return (
        eligible.join(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
