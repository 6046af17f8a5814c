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
