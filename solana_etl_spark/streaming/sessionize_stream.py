"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the streaming twin of operators/sessionize.py.

Demonstrates the engine's custom-stateful-operator surface (SURVEY §2.10
extension): per-key state (open session start/end/count) carried across
micro-batches, session rows emitted when the gap timeout closes a session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from solana_etl_spark.operators.sessionize import SESSION_GAP_SECONDS

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, session_end_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stateful(
    events_stream: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """events(user_id, ts, ...) stream → closed-session rows per user.

    State holds the open session; an event past the gap closes it (emits a
    row) and opens a new one. Processing-time timeout flushes idle users.
    """
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, end_us, n = state.get
                state.remove()
                yield _session_row(user_id, start_us, end_us, n)
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()

        if not ts_us:
            return
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = ts_us[0], ts_us[0], 0

        out = []
        for t in ts_us:  # sorted ascending, so t >= end_us within a session
            if n > 0 and t - end_us > gap_us:
                out.append((user_id, start_us, end_us, n))
                start_us, n = t, 0
            end_us = t
            n += 1

        state.update((start_us, end_us, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        for row in out:
            yield _session_row(*row)

    def _session_row(user_id: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
