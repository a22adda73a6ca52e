"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no update capture (CDC out of scope,
dags/mssql_to_postgresql_orders_daily.py:33-36) — but its sync variant's
last-writer-wins guard implies per-key version state. This operator keeps
that state ACROSS micro-batches: for each key it tracks (count, latest
version timestamp, last value), emitting one row per key per batch — the
streaming-native generalization of the merge's matched-condition.

State is per-key and partitioned by Spark's state store (RocksDB/HDFS at
scale); each micro-batch only touches keys present in the batch. Timeouts
are disabled here (pure accumulation); GroupStateTimeout.ProcessingTimeTimeout
is the hook for TTL-style eviction.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("latest_ts_micros", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("latest_ts_micros", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _track(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, latest, last_value = state.get
    else:
        n, latest, last_value = 0, -1, None
    for pdf in batches:
        n += len(pdf)
        ts = pdf["ts_micros"]
        idx = ts.idxmax()
        if int(ts[idx]) > latest:  # last-writer-wins on the version timestamp
            latest = int(ts[idx])
            last_value = float(pdf["value"][idx])
    state.update((n, latest, last_value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "latest_ts_micros": [latest],
            "last_value": [last_value],
        }
    )


def track_user_state(events: DataFrame) -> DataFrame:
    """Per-user running state over a stream of (user_id, ts_micros, value):
    event count, latest version timestamp, value at that timestamp."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def track_user_state_tws(stream):
    """The same per-key running aggregate as ``track_user_state``, on the
    Spark 4 ``transformWithStateInPandas`` API (StatefulProcessor with typed
    ValueState) — the successor to applyInPandasWithState: explicit state
    variables, timers, and TTL live on the handle instead of one
    GroupState blob. Kept alongside the legacy operator so either API
    drives the engine's custom stateful path.

    Environment note: the TWS state-server protocol needs google.protobuf
    at runtime; where it's unavailable (this container) the operator raises
    on start and tests importorskip — applyInPandasWithState
    (track_user_state) is the dependency-free fallback."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", "n_events long, latest_ts_micros long, last_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, latest, last = (0, 0, 0.0)
            if self._state.exists():
                n, latest, last = self._state.get()
            for pdf in rows:
                pdf = pdf.sort_values("ts_micros")
                n += len(pdf)
                latest = max(latest, int(pdf["ts_micros"].iloc[-1]))
                last = float(pdf["value"].iloc[-1])
            self._state.update((n, latest, last))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n],
                 "latest_ts_micros": [latest], "last_value": [last]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType="user_id long, n_events long, latest_ts_micros long, last_value double",
        outputMode="Update",
        timeMode="None",
    )
