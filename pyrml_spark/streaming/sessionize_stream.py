"""Streaming gap-based sessionization — the custom STATEFUL streaming
operator (``applyInPandasWithState`` + event-time timeout).

Batch counterpart: :func:`pyrml_spark.ops.sessions.events_sessionize`
(lag → gap flag → running sum). That shape needs the whole history per
user; a stream instead keeps ONE open session per user as state and emits a
session exactly when it closes:

* data for a user arrives → merge into the open session if within the gap,
  else close-and-emit the open one and start a new one;
* the watermark passes ``last_event + gap`` with no new data → the
  event-time timeout fires, the open session is emitted, state is removed.

State per user is O(1) (four numbers — start, last ts, count, value sum),
eviction is driven by the watermark, so a 100 TB/day clickstream holds
|active users| state rows, not history. Output mode is append (sessions
are immutable once emitted), which every sink supports.

The reference has no streaming at all (SURVEY.md §2); this is the
Spark-native design the north rule's pipeline needs for continuous ingest.
Equality with the batch sessionizer over a drained stream is tested
(``tests/test_streaming.py``).
"""

from __future__ import annotations

import re
import warnings
from typing import Any, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.DoubleType()),   # epoch seconds
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

# (session_start_epoch, last_event_epoch, n_events, total_value)
STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _make_sessionizer(gap_seconds: float):
    def sessionize(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "n_events": [n], "total_value": [total]})
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["epoch"] = rows["ts"].astype("int64") / 1e9
        rows = rows.sort_values(["epoch", "event_id"], kind="mergesort")

        open_sess = list(state.get) if state.exists else None
        closed = []
        for epoch, value in zip(rows["epoch"].to_numpy(),
                                rows["value"].to_numpy()):
            if open_sess is None:
                open_sess = [epoch, epoch, 0, 0.0]
            elif epoch - open_sess[1] > gap_seconds:
                closed.append(tuple(open_sess))
                open_sess = [epoch, epoch, 0, 0.0]
            # a late cross-batch event may pre-date the open session's
            # start — extend the session backwards, not just forwards
            open_sess[0] = min(open_sess[0], epoch)
            open_sess[1] = max(open_sess[1], epoch)
            open_sess[2] += 1
            open_sess[3] += float(value)

        state.update(tuple(open_sess))
        # wake when the watermark passes the gap after the last event —
        # that's exactly when the open session can no longer grow
        state.setTimeoutTimestamp(int((open_sess[1] + gap_seconds) * 1000))
        if closed:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(closed),
                 "session_start": [c[0] for c in closed],
                 "n_events": [c[2] for c in closed],
                 "total_value": [c[3] for c in closed]})

    return sessionize


_WM_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _watermark_seconds(watermark: str) -> Optional[float]:
    m = re.match(r"^\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+?)s?\s*$", watermark)
    if not m or m.group(2).lower() not in _WM_UNITS:
        return None
    return float(m.group(1)) * _WM_UNITS[m.group(2).lower()]


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming (user_id, event_id, ts, value) → closed sessions.

    ``events`` must be a streaming DataFrame with an event-time ``ts``
    column. Returns an append-mode stream of
    (user_id, session_start, n_events, total_value).

    ``watermark`` defaults to the gap itself. Exact equivalence with the
    batch sessionizer on OUT-OF-ORDER input requires ``watermark >= gap``:
    with a shorter watermark a late event that belongs to a session already
    closed by the gap rule can still arrive and is merged into the newer
    open session instead. A shorter watermark is allowed (cheaper state,
    earlier emission) but a warning is raised.
    """
    if watermark is None:
        watermark = f"{gap_minutes} minutes"
    wm_s = _watermark_seconds(watermark)
    if wm_s is not None and wm_s < gap_minutes * 60.0:
        warnings.warn(
            f"sessionize_stream: watermark {watermark!r} is shorter than the "
            f"session gap ({gap_minutes} min); late events older than the "
            "watermark but within the gap of an already-closed session will "
            "merge into the newer session — use watermark >= gap for exact "
            "batch equivalence on out-of-order input",
            stacklevel=2,
        )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_minutes * 60.0),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
