"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2 "Streaming" — the arbitrary-state escape hatch the driver
contract names for operators windowed aggs can't express).

Implements a per-station queue-state tracker: running event count, running
max value, and the timestamp of the last 'error' — state the reference
keeps implicitly by upserting one DynamoDB row per (station, ts)
(estimate_queue.py:166-178), here maintained incrementally per micro-batch
with bounded per-key state (three scalars — safe at any key cardinality).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

output_schema = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
        StructField("last_error_epoch_us", LongType()),
    ]
)

state_schema = StructType(
    [
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
        StructField("last_error_epoch_us", LongType()),
    ]
)


def _track(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        n, mx, last_err = state.get
    else:
        n, mx, last_err = 0, float("-inf"), 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
            errs = pdf.loc[pdf["event_type"] == "error", "ts"]
            if len(errs):
                last_err = max(
                    last_err, int(errs.max().value // 1_000)
                )  # pandas ns → µs
    state.update((n, mx, last_err))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "max_value": [mx],
            "last_error_epoch_us": [last_err],
        }
    )


def stateful_station_tracker(events: DataFrame) -> DataFrame:
    """Per-station incremental state over a stream: one output row per
    station per micro-batch with the updated running aggregates."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


try:  # Spark 4.x arbitrary-state API (transformWithStateInPandas)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _TrackerProcessor(StatefulProcessor):
        """transformWithStateInPandas twin of :func:`_track`: the same
        three-scalar per-key state held in a typed ValueState. The newer
        API adds composite state types (Value/List/Map), per-key timers,
        TTL, and initial-state seeding, and requires the RocksDB state
        store provider — the operational posture for billions of keys
        (state lives off-heap/on-disk per executor, not in JVM heap)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, mx, last_err = self._agg.get()
            else:
                n, mx, last_err = 0, float("-inf"), 0
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
                    errs = pdf.loc[pdf["event_type"] == "error", "ts"]
                    if len(errs):
                        last_err = max(last_err, int(errs.max().value // 1_000))
            self._agg.update((n, mx, last_err))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_value": [mx],
                    "last_error_epoch_us": [last_err],
                }
            )

        def close(self) -> None:
            pass

    def stateful_station_tracker_tws(events: DataFrame) -> DataFrame:
        """Spark-4 ``transformWithStateInPandas`` form of the tracker.
        Caller must enable the RocksDB state store
        (file_stream.use_rocksdb_state) — the API requires it."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_TrackerProcessor(),
            outputStructType=output_schema,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover — older Spark
    stateful_station_tracker_tws = None
