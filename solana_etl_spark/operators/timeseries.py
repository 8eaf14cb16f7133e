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
ROLL_ROWS = 5  # trailing window width (rows, inclusive of current)


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


def ohlc_resample(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_unit: str = "hour",
) -> DataFrame:
    """Downsample an event stream to per-(key, bucket) OHLC bars —
    (open, high, low, close, n_events, volume): the classic resample every
    time-series store provides (candlesticks, sensor rollups).

    One groupBy on (key, bucket) — map-side combined, a single shuffle.
    Open/close resolve deterministically as min/max over (ts, value)
    structs (ties at the same timestamp break by value, identical in both
    engines); high/low/volume are plain min/max/sum. Values carry as exact
    DECIMAL(18,4) and surface as doubles only in the final projection.
    """
    dec = F.round(F.col(value_col), 4).cast("decimal(18,4)")
    tsv = F.struct(F.col(ts_col).alias("t"), dec.alias("v"))
    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.min(tsv).alias("_first"),
            F.max(tsv).alias("_last"),
            F.min(dec).alias("_lo"),
            F.max(dec).alias("_hi"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec), 4).alias("_vol"),
        )
        .select(
            "key",
            "bucket",
            F.col("_first.v").cast("double").alias("open"),
            F.col("_hi").cast("double").alias("high"),
            F.col("_lo").cast("double").alias("low"),
            F.col("_last.v").cast("double").alias("close"),
            "n_events",
            F.col("_vol").cast("double").alias("volume"),
        )
    )


def rolling_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_id_col: str = "event_id",
    n_rows: int = ROLL_ROWS,
) -> DataFrame:
    """Trailing ``n_rows``-row moving aggregates per key — sum/mean/min/max
    plus the actual window population (ramps up at each key's start): the
    moving-average smoother every monitoring/feature pipeline applies
    before thresholding.

    ONE window spec = one shuffle on the key + one in-partition sort by
    (ts, id); every aggregate shares the frame, so Spark evaluates them in
    a single pass (ROWS frames stream in O(1) memory per aggregate — no
    per-row buffer growth at 100 TB partition sizes). Sums stay exact
    DECIMAL inside the frame; the mean is the exact sum converted once to
    double and divided by the exact count — deterministic IEEE ops that
    the DuckDB oracle replays bit-for-bit. The (ts, id) sort key is unique
    by construction so frames are engine-independent.
    """
    dec = F.round(F.col(value_col), 4).cast("decimal(18,4)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_id_col)
        .rowsBetween(-(n_rows - 1), 0)
    )
    sum_dbl = F.sum(dec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    return events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(order_id_col).alias("event_id"),
        sum_dbl.alias("roll_sum"),
        n.alias("n_window"),
        F.round(sum_dbl / n, 6).alias("roll_mean"),
        F.min(dec).over(w).cast("double").alias("roll_min"),
        F.max(dec).over(w).cast("double").alias("roll_max"),
    )
