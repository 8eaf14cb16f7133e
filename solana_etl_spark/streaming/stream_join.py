"""Watermarked stream-stream interval join — the attribution primitive
(impression ⋈ click within a horizon) the batch range join
(`operators/rangejoin.py`) answers offline.

The reference never joins two streams (its streaming loop is one block
source — `/root/reference/src/transform/ExtractStreaming.py`); this is the
charter's streaming surface. Both inputs carry watermarks, and the join
predicate bounds each side's event time against the other's, which is
exactly what lets Spark expire join state: a left row can only ever match
right rows with ts in [left.ts, left.ts + horizon], so once the right
watermark passes left.ts + horizon the left row's state is dropped.
Without the time-range predicate a stream-stream inner join would buffer
both streams forever.

Batch DataFrames run the identical expression (watermarks no-op), so
stream-vs-batch equivalence is directly testable — the same contract every
other dual-mode operator here honors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    horizon: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``key`` where right.ts lands in
    [left.ts, left.ts + horizon]. Each side's columns are prefixed to keep
    the output schema collision-free. State is bounded by
    watermark_delay + horizon per key."""
    l = left
    r = right
    if left.isStreaming:
        l = l.withWatermark("ts", watermark_delay)
    if right.isStreaming:
        r = r.withWatermark("ts", watermark_delay)
    l = l.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    r = r.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    lk, rk = f"{left_prefix}{key}", f"{right_prefix}{key}"
    lts, rts = f"{left_prefix}ts", f"{right_prefix}ts"
    return l.join(
        r,
        (F.col(lk) == F.col(rk))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {horizon}")),
    )
