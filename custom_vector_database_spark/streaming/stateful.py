"""Custom stateful streaming operators — applyInPandasWithState (the
Spark 3.x-era API) and transformWithStateInPandas (the Spark 4
arbitrary-state API with typed Value/List/Map state and timers), the
brief's named mechanisms for operators Structured Streaming lacks
built-in.

`user_running_stats` keeps one state row per user while a stream drains:
event count, decimal-exact value total, and max value. With
trigger(availableNow) + GroupStateTimeout.NoTimeout the final emitted state
equals a plain GROUP BY over the same data — which is exactly what the
DuckDB oracle checks (queries/extra_queries.q_stream_stateful_user_stats).

STATUS of the transformWithStateInPandas branch (`user_type_spend`):
EXPERIMENTAL, EXPLICIT-OPT-IN ONLY (demoted round 6 after three rounds
unexecuted) — it has never run in this environment because pyspark's
protobuf dependency is absent here (tws_available() gates it with a hard
NotImplementedError). NO production path auto-dispatches to it anymore:
the registered query runs `user_type_spend_compat`
(applyInPandasWithState — same semantics, oracle-checked) always. The
TWS operator stays as the forward-port implementation with a dedicated
integration test (tests/test_streaming.py::
test_tws_user_type_spend_integration) that protobuf-equipped CI must
pass before anyone promotes it.

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

__all__ = [
    "user_running_stats",
    "user_type_spend",
    "user_type_spend_compat",
    "tws_available",
]


def tws_available() -> bool:
    """transformWithStateInPandas speaks protobuf between the JVM and its
    Python state server; without the protobuf package the stream crashes
    at init. Gate on it so callers pick the right implementation up
    front (this container has no protobuf — the operator is real and
    runs wherever pyspark's own dependencies are installed)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False

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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): the newest arbitrary-state API.
# Unlike applyInPandasWithState's single state tuple, the handle hands out
# TYPED state primitives (ValueState / ListState / MapState, optional TTL,
# timers). Here a per-user MapState keyed by event_type holds (count,
# cents) — the state layout a per-user-per-category accumulator actually
# wants, with per-entry point updates instead of rewriting one blob.
# Requires the RocksDB state store provider (the only provider that
# implements the API's multi-column-family layout) — the query wrapper
# sets it for the bounded drain and restores after.
# ---------------------------------------------------------------------------
TYPE_SPEND_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def user_type_spend(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running (count, decimal-exact total) via a
    MapState per user. Update-mode emission: every micro-batch emits the
    refreshed entries for the types it touched; the final answer per
    (user, type) is the row with the highest running count.

    Raises NotImplementedError where protobuf is absent (see
    ``tws_available``); ``user_type_spend_compat`` computes the same
    result through the applyInPandasWithState API."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark dependency, absent in this environment); use "
            "user_type_spend_compat"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PerTypeSpend(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._m = handle.getMapState(
                "per_type", "event_type STRING", "n LONG, cents LONG"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            touched: dict[str, tuple[int, int]] = {}
            for pdf in rows:
                for et, grp in pdf.groupby("event_type"):
                    if et in touched:
                        n, cents = touched[et]
                    else:
                        prev = (
                            self._m.getValue((et,))
                            if self._m.containsKey((et,))
                            else None
                        )
                        n, cents = prev if prev is not None else (0, 0)
                    n += len(grp)
                    cents += int(
                        sum(int(Decimal(str(v)).scaleb(2)) for v in grp["value"])
                    )
                    touched[et] = (n, cents)
            for et, (n, cents) in touched.items():
                self._m.updateValue((et,), (n, cents))
            if touched:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(touched),
                        "event_type": list(touched),
                        "n_events": [n for n, _ in touched.values()],
                        "total_value": [c / 100.0 for _, c in touched.values()],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=PerTypeSpend(),
            outputStructType=TYPE_SPEND_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


# -- compat twin: identical semantics through applyInPandasWithState ------
TYPE_SPEND_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _type_spend_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(sum(int(Decimal(str(v)).scaleb(2)) for v in pdf["value"]))
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [event_type],
            "n_events": [n],
            "total_value": [cents / 100.0],
        }
    )


def user_type_spend_compat(events: DataFrame) -> DataFrame:
    """The ``user_type_spend`` semantics on the applyInPandasWithState
    API: grouping key (user_id, event_type) with a tuple state replaces
    the per-user MapState (one state row per pair instead of one map per
    user — same state volume, keyed flat). Runs on any state store
    provider and has no protobuf dependency."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _type_spend_update,
            outputStructType=TYPE_SPEND_OUTPUT,
            stateStructType=TYPE_SPEND_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
