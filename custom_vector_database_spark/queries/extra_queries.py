"""Round-2 closers: an oracle-checked Structured Streaming query, an
oracle-checked multimodal (mapInPandas) query, and GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_vector_database_spark.queries_registry import load_spread, register

_DEC = "decimal(18,2)"


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
    import uuid

    from custom_vector_database_spark.streaming import (
        stream_tumbling_agg,
        streaming_events,
    )

    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        stream_tumbling_agg(streaming_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).orderBy("window_start_us")


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

    docs = load_spread(spark, sf_dir, "documents")
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
