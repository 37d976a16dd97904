"""The UDF / UDAF / UDTF surface (SURVEY §2.2 row) — demonstrated once
each, oracle-checked, with the engine's standing rule stated up front:
built-in Catalyst expressions are ALWAYS preferred in hot paths (every
distance/text kernel in operators/ is expression-based); these exist to
prove the extension surface works and stays correct.

- scalar: Arrow-vectorized pandas_udf (numpy batch math, no per-row Python)
- UDAF:   grouped-agg pandas_udf (pandas reduction per group)
- UDTF:   Python UDTF emitting multiple rows per input row
Plus the streaming dedup operator (dropDuplicates on a stream) under the
same oracle as its batch twin.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from custom_vector_database_spark.queries_registry import load, register

_DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# Scalar pandas UDF: log1p over prices — Arrow batches in, numpy math, Arrow
# out. Oracle: DuckDB's ln(1+x) (same libm-level doubles, round(6)).
# ---------------------------------------------------------------------------
# explicit DataType (not a DDL string): string return types are parsed at
# decoration time and would require an active SparkSession at import
@pandas_udf(T.DoubleType())
def _log1p_price(s: pd.Series) -> pd.Series:
    import numpy as np

    return pd.Series(np.log1p(s.to_numpy()))


@register(
    "pandas_udf_log_price",
    """
    SELECT o_orderkey AS orderkey,
           round(ln(1.0 + o_totalprice), 6) AS log_price
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY orderkey
    """,
)
def q_pandas_udf_log_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.round(_log1p_price("o_totalprice"), 6).alias("log_price"),
    ).orderBy("orderkey")


# ---------------------------------------------------------------------------
# Grouped-agg pandas UDF (UDAF): interpolated median per group — the same
# definition as DuckDB quantile_cont(0.5); round(4) absorbs formula ulps.
# ---------------------------------------------------------------------------
@pandas_udf(T.DoubleType())
def _median(s: pd.Series) -> float:
    return float(s.median())


# grouped-agg pandas UDFs cannot mix with built-in aggregates in one agg —
# the row count is a pandas reduction too
@pandas_udf(T.LongType())
def _count(s: pd.Series) -> int:
    return int(len(s))


@register(
    "pandas_udaf_median_price",
    """
    SELECT o_orderstatus AS status,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def q_pandas_udaf_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(_median("o_totalprice"), 4).alias("median_price"),
            _count("o_totalprice").alias("n_orders"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Python UDTF: one output row per word-token of the input (the table-
# generating surface; native explode(split()) is the production path and
# the oracle uses exactly that on the DuckDB side).
# ---------------------------------------------------------------------------
@register(
    "udtf_doc_tokens",
    """
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                      x -> x != '')) AS token
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id, token
    """,
)
def q_udtf_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, token: string")
    class TokenEmitter:
        def eval(self, doc_id: int, text: str):
            for tok in re.split(r"[^a-z0-9]+", (text or "").lower()):
                if tok:
                    yield (doc_id, tok)

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("token_emitter", TokenEmitter)
    out = spark.sql(
        "SELECT t.doc_id, t.token FROM _udtf_docs d, "
        "LATERAL token_emitter(d.doc_id, d.text) t"
    )
    return out.orderBy("doc_id", "token")


# ---------------------------------------------------------------------------
# Streaming dedup: dropDuplicates on the event stream (event_id is unique in
# the data, so the deduped per-type counts equal the plain GROUP BY — which
# is the oracle; planted duplicate streams are exercised in tests).
# ---------------------------------------------------------------------------
@register(
    "stream_dedup_counts",
    """
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_vector_database_spark.streaming import streaming_events

    ev = streaming_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from custom_vector_database_spark.streaming import run_stream_to_memory

    return run_stream_to_memory(spark, agg, "stream_dedup").orderBy("event_type")
