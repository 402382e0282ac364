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

import numpy as np
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
        # np.rint is half-even — matches the engine-wide rint/round_even
        # convention in functions.oracle_safe (and pandas' .round, whose
        # per-Series overhead this numpy form avoids: the function runs
        # once per KEY per micro-batch, so constant per-call cost is the
        # operator's dominant term at high key cardinality — guide §4.2)
        cents += int(np.rint(pdf["value"].to_numpy() * 100).astype(np.int64).sum())
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
    uid = key[0]

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": np.array([uid], dtype=np.int64),
                "session_start": np.array([start_us], dtype="datetime64[us]"),
                "session_end": np.array([last_us], dtype="datetime64[us]"),
                "n_events": np.array([n], dtype=np.int64),
            }
        )
        return

    # Vectorized sessionization (r11, guide §4.2): the function runs once
    # per KEY per micro-batch, so the old per-event Python loop and the
    # pandas sort/convert chain were the operator's dominant per-trigger
    # cost at high key cardinality. Same strict-gap semantics, now as one
    # numpy pass: session boundaries are positions where the gap to the
    # previous event EXCEEDS gap_us (strict >), segment stats come from
    # boundary indexing, and the carried-in open session either absorbs
    # the first segment (gap <= gap_us) or closes ahead of it.
    chunks = [pdf["ts"].to_numpy() for pdf in pdfs]
    ts = chunks[0] if len(chunks) == 1 else np.concatenate(chunks)
    ts = np.sort(ts.astype("datetime64[us]").astype(np.int64))
    bounds = np.empty(len(ts), dtype=bool)
    bounds[0] = True
    np.greater(ts[1:] - ts[:-1], gap_us, out=bounds[1:])
    pos = np.flatnonzero(bounds)  # start index of each in-batch segment
    seg_start = ts[pos]
    seg_end = ts[np.append(pos[1:] - 1, len(ts) - 1)]
    seg_n = np.diff(np.append(pos, len(ts))).astype(np.int64)

    closed_start: np.ndarray
    closed_end: np.ndarray
    closed_n: np.ndarray
    if state.exists:
        start0, last0, n0 = state.get
        if ts[0] - last0 > gap_us:
            # carried session closes before the batch's first event
            closed_start = np.append(np.int64(start0), seg_start[:-1])
            closed_end = np.append(np.int64(last0), seg_end[:-1])
            closed_n = np.append(np.int64(n0), seg_n[:-1])
        else:
            # first segment continues the carried session
            seg_start[0] = start0
            seg_n[0] += n0
            closed_start, closed_end, closed_n = (
                seg_start[:-1],
                seg_end[:-1],
                seg_n[:-1],
            )
    else:
        closed_start, closed_end, closed_n = seg_start[:-1], seg_end[:-1], seg_n[:-1]

    state.update((int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1])))
    # fire when the watermark passes the open session's horizon
    state.setTimeoutTimestamp((int(seg_end[-1]) + gap_us) // 1000)

    if len(closed_n):
        yield pd.DataFrame(
            {
                "user_id": np.full(len(closed_n), uid, dtype=np.int64),
                "session_start": closed_start.astype("datetime64[us]"),
                "session_end": closed_end.astype("datetime64[us]"),
                "n_events": closed_n,
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
