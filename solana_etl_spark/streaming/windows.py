"""Event-time windowed aggregation with watermarks — the late-data-tolerant
streaming rollup (beyond the reference's surface; SURVEY §2.10 ST4 notes the
reference has no late-data policy at all).

Batch and streaming share the same expression: ``F.window`` over event time;
in streaming, the watermark bounds state and drops data later than the
allowed lateness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type. Works on a batch
    DataFrame (no-op watermark) and a stream (stateful, bounded by the
    watermark) identically."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark_delay)
    return (
        src.groupBy(
            F.window("ts", window_duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication — the ingest-side member of the dedup
    family (at-least-once sources redeliver; downstream wants exactly-one
    row per event_id).

    Streaming: ``dropDuplicatesWithinWatermark`` keeps per-key state only
    until the watermark passes it — BOUNDED state, unlike plain
    ``dropDuplicates`` on a stream whose state grows forever. Duplicates
    arriving within the delay are dropped; the watermark is the documented
    dedup horizon. Batch: same expression degenerates to ``dropDuplicates``
    (one hash shuffle on the keys).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))
