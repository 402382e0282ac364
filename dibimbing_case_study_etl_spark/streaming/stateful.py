"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` / windowed aggregation (events_stream.py) cover the
built-in stateful shapes; this module is the escape hatch for operators
Spark doesn't ship: arbitrary per-key state carried across micro-batches,
updated by an Arrow-batched pandas function.

The demo operator keeps per-user running totals (event count + exact
scaled-integer value cents) and emits the cumulative row every time a
micro-batch touches the user. State is a 2-int struct per key — bounded,
shuffle-partitioned by user_id, and resilient to restart via the
checkpoint (state store persists between runs).

Scale: state volume is O(distinct active keys), not O(events); the
scaled-integer representation keeps the running sum exact and
order-independent, so results are deterministic under any micro-batch
slicing of the input — which is also what the test asserts (stream in N
batches == one batch == batch-mode groupBy).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # pandas .round is numpy rint (half-even) — matches the engine-wide
        # rint/round_even convention in functions.oracle_safe
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Cumulative (count, exact value sum) per user, emitted on every
    micro-batch that touches the user. ``events`` may be a stream or a
    batch frame (the operator also runs in batch mode for twin-testing)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
