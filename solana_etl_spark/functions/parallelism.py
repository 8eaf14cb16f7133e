"""Input-parallelism guard for compute-heavy per-row operators.

A small parquet input (one file) arrives as one partition; an expression-
heavy operator (minhash over every shingle, per-row hashing) then runs in a
single task regardless of cores. At real scale inputs have many splits and
this is a no-op — the repartition only fires when partitions < cores, so no
shuffle is added on large corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_compute_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
