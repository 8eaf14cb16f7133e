"""Gap-based sessionization over the ``events`` stream table — the batch
form of the custom stateful-streaming operator (SURVEY §2.10 extension).

Batch: lag + cumulative-sum windows (two window functions over one
partition-by-user sort — a single shuffle on user_id).
Streaming: the same semantics run under ``applyInPandasWithState`` in
streaming/sessionize_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_SECONDS = 1800


def assign_sessions(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Events with a per-user ``session_id`` (1-based, by time): a new
    session starts after a gap > gap_seconds. Two window functions over one
    partition-by-user sort — a single shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared in microseconds — sub-second precision, and identical to
    # the DuckDB oracle's epoch_us()
    with_gap = events.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > gap_seconds * 1_000_000
        )
        .cast("int")
        .alias("is_new"),
    ).fillna({"is_new": 1})
    return with_gap.withColumn("session_id", F.sum("is_new").over(w))


def session_intervals(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """One row per (user, session): start/end timestamps and event count —
    the interval table consumed by the range join (operators/rangejoin.py)."""
    return assign_sessions(events, gap_seconds).groupBy("user_id", "session_id").agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Per user: number of sessions and the largest session (events)."""
    per_session = session_intervals(events, gap_seconds)
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )
