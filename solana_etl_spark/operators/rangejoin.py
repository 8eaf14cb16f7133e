"""Range (interval-containment) join — absent in the reference (SURVEY.md
§2.3 "Absent: ... range/as-of/interval joins") and not an equi-join Spark
can hash-partition on its own; provided as a first-class operator.

Scale design — bucketized equi-join, NOT an inequality join:

* The naive form (`p JOIN i ON p.ts BETWEEN i.start AND i.end`) has no
  equi-key, so Spark plans a broadcast-nested-loop / cartesian — O(|p|·|i|)
  comparisons, fatal at scale.
* Here time is cut into fixed ``bucket_seconds`` buckets: every interval is
  exploded to the buckets it covers, every point maps to exactly ONE
  bucket, and the join becomes a plain hash equi-join on the bucket id with
  an exact containment post-filter. A point lives in one bucket, so each
  qualifying (point, interval) pair is produced exactly once — no dedup
  pass. This is the same strategy as Databricks' range-join binning and
  Flink's interval-join bucketing.
* Cost: shuffle is keyed by bucket; interval replication factor is
  ceil(duration / bucket_seconds) + 1, so pick bucket_seconds near the
  typical interval duration. Hot buckets (many overlapping intervals) are
  an AQE skew-join case, same as any hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` (bounds inclusive).

    Column names of ``points`` and ``intervals`` must be disjoint (rename
    before calling). Both timestamp columns are compared at microsecond
    precision.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"point/interval columns collide: {sorted(overlap)}")
    b_us = bucket_seconds * 1_000_000
    p = points.withColumn("__bucket", F.floor(F.unix_micros(point_ts) / b_us))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(start_ts) / b_us),
                F.floor(F.unix_micros(end_ts) / b_us),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join every pair of intervals that OVERLAPS
    (``left_start <= right_end AND right_start <= left_end``, bounds
    inclusive) — the interval×interval sibling of
    :func:`interval_point_join` (concurrent sessions, meeting conflicts,
    validity-window reconciliation).

    Scale design: both sides explode to the buckets they cover and hash
    equi-join on the bucket id. An overlapping pair collides in EVERY
    bucket both cover, so exactly-once emission uses the standard
    report-at-first-bucket trick: a pair is kept only where
    ``bucket == bucket(greatest(left_start, right_start))`` — the first
    bucket of the overlap region, which both sides necessarily cover. No
    distinct() over the (quadratic-in-hot-bucket) pair stream.

    Column names must be disjoint (rename before calling). Replication is
    ceil(duration/bucket_seconds)+1 per side — pick bucket_seconds near
    the typical interval length; hot buckets are an AQE skew-join case.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right columns collide: {sorted(overlap)}")
    b_us = bucket_seconds * 1_000_000

    def _explode_buckets(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(start) / b_us),
                    F.floor(F.unix_micros(end) / b_us),
                )
            ),
        )

    first_overlap_bucket = F.floor(
        F.unix_micros(F.greatest(F.col(left_start), F.col(right_start))) / b_us
    )
    return (
        _explode_buckets(left, left_start, left_end)
        .join(_explode_buckets(right, right_start, right_end), "__bucket")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("__bucket") == first_overlap_bucket)
        )
        .drop("__bucket")
    )
