"""Sessionization on the Spark 4 ``transformWithStateInPandas`` API —
the modern arbitrary-stateful operator (SPARK-49564 "state v2"): typed
state variables (value/list/map), explicit event-time timers, TTL, and
initial-state bootstrap, replacing ``applyInPandasWithState``'s single
state tuple + single timeout.

This is the TWIN of ``stateful.sessionize`` — same gap semantics, same
output schema, same vectorized segment core (``stateful.segment_batch``)
— so the two APIs can be equivalence-tested against each other and the
`stream_sessions` DuckDB oracle verifies both. Differences are mechanical:

- State lives in a named ``ValueState`` (start_us, last_us, n, total)
  instead of the implicit group state tuple.
- The session-finalize timeout is an explicit registered TIMER; stale
  timers from earlier batches are deleted before re-arming (the old API's
  ``setTimeoutTimestamp`` overwrote implicitly — timers don't).
- Timer expiry arrives in ``handleExpiredTimer`` (watermark-driven in
  ``timeMode="EventTime"``), not as a ``hasTimedOut`` input call.

Scale shape is unchanged: state partitioned by user, watermark-bounded,
one output frame per group call.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import _SESSION_US_SCHEMA, STATE_SCHEMA, segment_batch, session_frame

_US = 1_000_000


class SessionProcessor(StatefulProcessor):
    """Gap-delimited sessionizer: one ValueState + one event-time timer
    per user."""

    def __init__(self, gap_seconds: int):
        self._gap_us = gap_seconds * _US
        self._gap_ms = gap_seconds * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", STATE_SCHEMA)

    def _frame(self, user_id, sessions) -> pd.DataFrame:
        return session_frame(user_id, sessions)

    def _rearm_timer(self, last_us: int) -> None:
        # Timers accumulate (unlike setTimeoutTimestamp, which replaced);
        # drop the stale ones so an old expiry can't fire against an
        # extended session. Per-key timer count is O(1) here, so the
        # list-and-delete pass is constant work.
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_us // 1000 + self._gap_ms)

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        frames = [f for f in rows if len(f)]
        if not frames:
            prior = self._state.get()
            if prior is not None:
                self._rearm_timer(prior[1])
            return
        batch = pd.concat(frames) if len(frames) > 1 else frames[0]
        ts = batch["ts_us"].to_numpy(dtype="int64")
        vals = batch["value"].to_numpy(dtype="float64")
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]

        carried = self._state.get()
        closed, open_sess = segment_batch(
            ts, vals, tuple(carried) if carried is not None else None, self._gap_us
        )
        self._state.update(open_sess)
        self._rearm_timer(open_sess[1])
        if closed:
            yield self._frame(
                user_id, [(s, e, n, t, "gap") for s, e, n, t in closed]
            )

    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        sess = self._state.get()
        if sess is None:
            return
        start_us, last_us, n, total = sess
        if last_us // 1000 + self._gap_ms > expiredTimerInfo.getExpiryTimeInMs():
            # Stale timer raced an extension in the same batch; the
            # re-armed timer will finalize later.
            return
        self._state.clear()
        yield self._frame(user_id, [(start_us, last_us, n, total, "timeout")])

    def close(self) -> None:
        pass


def sessionize_tws(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """``stateful.sessionize`` re-expressed on transformWithStateInPandas.

    Input: streaming (user_id, ts, value) with a watermark on ``ts``.
    Output: identical schema/semantics to the applyInPandasWithState
    path — the ``stream_sessions`` oracle checks both.
    """
    return (
        events.select(
            "user_id", "ts", F.unix_micros("ts").alias("ts_us"), "value"
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionProcessor(gap_seconds),
            outputStructType=_SESSION_US_SCHEMA,
            outputMode="append",
            timeMode="EventTime",
        )
        .select(
            "user_id",
            F.timestamp_micros("start_us").alias("session_start"),
            F.timestamp_micros("end_us").alias("session_end"),
            "n_events",
            "sum_value",
            "closed_by",
        )
    )
