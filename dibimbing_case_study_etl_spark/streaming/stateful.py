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


# --- transformWithStateInPandas (Spark 4 arbitrary-state API) ---------------

TYPE_CENSUS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_distinct_types", T.LongType()),
        T.StructField("top_type", T.StringType()),
    ]
)


def _type_census_processor():
    """Per-user event-type census on Spark 4's ``transformWithStateInPandas``
    (the successor to ``applyInPandasWithState``): a typed **MapState**
    (event_type → count) plus a **ValueState** total survive across
    micro-batches in the state store, so the operator emits, per touched
    user, the cumulative event count, the exact distinct-type count, and
    the modal type (count desc, name asc tiebreak — deterministic under
    any micro-batch slicing).

    Scale: state is O(active keys × distinct types per key) — event-type
    alphabets are tiny, so this is the bounded-state shape; the runtime
    shuffles by user_id and the state store checkpoints per micro-batch
    (restart-safe, same guarantee the test exercises for
    ``user_running_totals``). Built lazily inside a function: the class
    statement itself touches the streaming-state client plumbing, which
    keeps import-time clean for non-streaming users.

    Runtime dependency: the transformWithState JVM↔Python state protocol
    is protobuf-framed (``StateMessage_pb2``), so executing a query built
    on this operator needs the ``protobuf`` wheel — absent in this
    container (test env-gated on it), present in any real deployment;
    ``user_running_totals`` covers the same guarantee on the
    protobuf-free ``applyInPandasWithState`` API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeCensus(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "etype string", "n bigint"
            )
            self._total = handle.getValueState("total", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            total = self._total.get()[0] if self._total.exists() else 0
            for pdf in rows:
                total += len(pdf)
                # value_counts() drops nulls, but len(pdf) counted them —
                # an all-null-typed key would leave `counts` empty and
                # min() would raise, failing the micro-batch. Map nulls
                # to a sentinel type so every counted event has a bucket.
                types = pdf["event_type"].fillna("__null__")
                for etype, n in types.value_counts().items():
                    prev = self._counts.getValue((etype,))
                    self._counts.updateValue(
                        (etype,), (int(n) + (prev[0] if prev else 0),)
                    )
            self._total.update((total,))
            counts = {k[0]: v[0] for k, v in self._counts.iterator()}
            if not counts:
                return
            top = min(counts, key=lambda k: (-counts[k], k))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [total],
                    "n_distinct_types": [len(counts)],
                    "top_type": [top],
                }
            )

        def close(self) -> None:
            pass

    return _TypeCensus()


def user_type_census(events: DataFrame) -> DataFrame:
    """Cumulative per-user event-type census via
    ``transformWithStateInPandas`` (update mode, no event-time timers)."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_type_census_processor(),
            outputStructType=TYPE_CENSUS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# --- event-time timeout sessionization (r11: st04) --------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_GAP_MIN = 30  # minutes; fixed so the operator and its oracle agree


def _session_update(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Arbitrary-state sessionizer with EVENT-TIME TIMEOUT — the state
    lifecycle ``session_window`` hides, made explicit: a session closes
    (and is emitted, append-style) either when a later event from the
    same user arrives more than the gap after it IN-STREAM, or when the
    WATERMARK passes ``last_event + gap`` (``hasTimedOut``) — at which
    point the state is removed, which is exactly why state stays
    O(open sessions), not O(stream). A gap of exactly the timeout does
    NOT split (strict >), mirroring the strict ``<`` Spark applies when
    firing event-time timers against the watermark."""
    gap_us = _GAP_MIN * 60 * 1_000_000
    out_rows: list[tuple[int, int, int, int]] = []  # (uid, start, last, n)
    uid = key[0]

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        out_rows.append((uid, start_us, last_us, n))
        state.remove()
    else:
        start_us = last_us = None
        n = 0
        if state.exists:
            start_us, last_us, n = state.get
        ts_all = (
            pd.concat([pdf["ts"] for pdf in pdfs])
            .sort_values()
            .astype("datetime64[us]")
            .astype("int64")
        )
        for t in ts_all:
            t = int(t)
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out_rows.append((uid, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        # fire when the watermark passes the open session's horizon
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    if out_rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out_rows],
                "session_start": pd.to_datetime(
                    [r[1] for r in out_rows], unit="us"
                ),
                "session_end": pd.to_datetime([r[2] for r in out_rows], unit="us"),
                "n_events": [r[3] for r in out_rows],
            }
        )


def gap_timeout_sessions(events: DataFrame) -> DataFrame:
    """CLOSED sessions per user (append output): 30-minute gap rule,
    open sessions held as per-key state and flushed by event-time
    timeout once the watermark passes ``last_event + gap``. The input
    must carry a watermark (``withWatermark("ts", ...)``) for the
    timers to fire."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _session_update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
