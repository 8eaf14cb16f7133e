"""Time-series regularization: bucket → gap-fill against a generated time
spine → forward-fill. The standard "make an event stream chartable /
model-ready" transform (DuckDB/Timescale call it gap filling + LOCF).

Scale shape:
* per-key span (min/max bucket) is one map-side-combined aggregate;
* the spine is `sequence(start, end, interval)` EXPLODED per key — rows
  are generated in the executors, never driver-side;
* bucket aggregation and the spine left-join both key on (key, bucket) —
  the same hash partitioning, so AQE/exchange-reuse keeps it to one
  logical repartition of each side;
* forward-fill is `last(value, ignorenulls=True)` over an UNBOUNDED
  PRECEDING window per key — one pass, no self-join.

All values are exact-decimal sums copied (never recomputed) through the
fill, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKET = "1 hour"


def gapfill_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, bucket, bucket_sum, filled, was_gap) per hourly bucket of each
    key's [first, last] event span: ``bucket_sum`` is the exact in-bucket
    aggregate (NULL on gap buckets), ``filled`` carries the last known
    value forward, ``was_gap`` marks generated rows."""
    bucket = F.date_trunc("hour", F.col(ts_col))
    dec = F.round(F.col(value_col), 4).cast("decimal(18,4)")

    sums = (
        events.groupBy(F.col(key_col).alias("_k"), bucket.alias("_b"))
        .agg(F.round(F.sum(dec), 4).cast("double").alias("bucket_sum"))
    )
    spans = events.groupBy(F.col(key_col).alias("key")).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("_hi"),
    )
    spine = spans.select(
        "key",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {BUCKET}"))
        ).alias("bucket"),
    )
    joined = spine.join(
        sums,
        (spine["key"] == sums["_k"]) & (spine["bucket"] == sums["_b"]),
        "left",
    ).select("key", "bucket", "bucket_sum")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket",
        "bucket_sum",
        F.last("bucket_sum", ignorenulls=True).over(w).alias("filled"),
        F.col("bucket_sum").isNull().alias("was_gap"),
    )
