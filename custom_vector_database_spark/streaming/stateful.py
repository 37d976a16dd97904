"""Custom stateful streaming operator via applyInPandasWithState — the
brief's named mechanism for operators Structured Streaming lacks built-in.

`user_running_stats` keeps one state row per user while a stream drains:
event count, decimal-exact value total, and max value. With
trigger(availableNow) + GroupStateTimeout.NoTimeout the final emitted state
equals a plain GROUP BY over the same data — which is exactly what the
DuckDB oracle checks (queries/extra_queries.q_stream_stateful_user_stats).

Scale shape: state is partitioned by the grouping key (user_id) across
executors; each micro-batch routes a user's events to its state partition;
Arrow batches in/out. State size is O(distinct users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["user_running_stats"]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),  # decimal-exact as cents
        T.StructField("max_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, cents, mx = state.get
    else:
        n, cents, mx = 0, 0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        # cents as integers: associative, order-free, bit-exact (the values
        # are 2-decimal; float->Decimal->cents is value-exact)
        cents += int(
            sum(int(Decimal(str(v)).scaleb(2)) for v in pdf["value"])
        )
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, cents, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "max_value": [mx],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, total, max) maintained as custom group
    state. Emits the running snapshot for every group in every batch; in
    update-mode sinks the latest row per user is the final answer."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
