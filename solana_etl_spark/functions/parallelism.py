"""Input-parallelism guard for compute-heavy per-row operators.

A small parquet input (one file) arrives as one partition; an expression-
heavy operator (minhash over every shingle, per-row hashing) then runs in a
single task regardless of cores. At real scale inputs have many splits and
this is a no-op — the repartition only fires when partitions < cores, so no
shuffle is added on large corpora.

Partition COUNT alone is a false negative on big single-row-group files
(r9, measured): a 178 MB one-row-group parquet scans as 32 byte-range
splits, but a split only yields rows when a row-group START falls inside
it — so every row landed in ONE task and a 20k-clip Python decode stage
ran serially (~52 s instead of ~2 s). Populated tasks can never exceed
total row groups, so when the scan has fewer FILES than target the guard
also counts row groups from the parquet footers (driver-side, metadata
only) and repartitions when those can't fill the cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _parquet_row_groups(files: list[str], target: int) -> int | None:
    """Total row groups across ``files`` (early-exit at ``target``), or
    None when any file isn't local parquet readable via pyarrow — the
    caller then keeps the partition-count answer."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return None
    groups = 0
    for uri in files:
        if not uri.endswith((".parquet", ".pq")):
            return None
        path = uri[7:] if uri.startswith("file://") else uri
        if path.startswith("/") is False:
            return None
        try:
            groups += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return None
        if groups >= target:
            break
    return groups


def ensure_compute_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    try:
        files = df.inputFiles()
    except Exception:
        return df
    # many files -> rows are spread across >= len(files) populated splits;
    # only few-file scans can hide a row-group concentration
    if files and len(files) < target:
        # a plan that already repartitions (or shuffles for a groupBy/join)
        # above the scan has spread its rows — re-shuffling it would tax
        # every composed pipeline (measured: +0.4 s on mm_frame_sample,
        # whose documents_as_media input repartitions right at the source)
        try:
            plan = df._jdf.queryExecution().analyzed().toString()
        except Exception:
            plan = ""
        for spread_node in ("Repartition", "Aggregate", "Join", "Window"):
            if spread_node in plan:
                return df
        groups = _parquet_row_groups(files, target)
        if groups is not None and groups < target:
            return df.repartition(target)
    return df
