"""Physical data layout: clustering, Z-ordering, compaction, and the
parquet min/max report that proves data-skipping.

At 100 TB the scan is the query: a filter on an unclustered table reads
every file; the same filter on a range-clustered table reads the handful
whose footer min/max overlap the predicate (parquet row-group pruning and
any file-skipping catalog both key off those stats). These operators make
the layout step explicit:

* ``cluster_and_compact`` — ``repartitionByRange`` on the sort keys (one
  range-exchange, sampled bounds) + ``sortWithinPartitions``: each output
  file owns a tight, near-disjoint key range, and the file count is chosen
  by the caller (compaction: many small files → few right-sized ones).
* ``zorder_key`` / ``quantize`` — multi-dimensional clustering: interleave
  the bits of k quantized columns so ONE sort order gives every dimension
  locality (a range filter on any single column touches O(N^((k-1)/k)) of
  the files instead of all of them). Pure integer column arithmetic —
  codegen'd, zero shuffle, and bit-identical cross-engine.
* ``parquet_layout_report`` — pyarrow scan of the written footers: per
  file/row-group min/max for the cluster columns. The test asserts the
  ranges are near-disjoint; at scale the same report drives compaction
  scheduling (which files drifted out of their range).

The reference writes one output file per input block file with no layout
control (`/root/reference/src/load/FileOutput.py:40-53`); this is
Spark-first scale machinery per the charter.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Map an integer column in [lo, hi] to [0, 2**bits) by linear scaling
    (clamped). Exact integer arithmetic — reproducible anywhere."""
    span = hi - lo + 1
    scaled = ((col - F.lit(lo)) * F.lit(1 << bits)) / F.lit(span)
    q = F.floor(scaled).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (col0 gets bit
    positions 0, k, 2k, ...). 64-bit result: k * bits must be <= 63."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a 64-bit key")
    terms: list[Column] = []
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zorder_key")


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (for cross-engine oracles)."""
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * len(cols) + j})")
    return " | ".join(terms)


def cluster_and_compact(
    df: DataFrame, sort_cols: list[str], n_files: int
) -> DataFrame:
    """Range-cluster ``df`` into ``n_files`` near-disjoint sorted slices —
    write the result with ``.write.parquet`` and every file's footer
    min/max is a tight range on ``sort_cols`` (data-skipping layout). Also
    the compaction primitive: 10k drifted small files in, ``n_files``
    right-sized files out, one range exchange total."""
    return df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)


def write_clustered(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int
) -> None:
    cluster_and_compact(df, sort_cols, n_files).write.mode("overwrite").parquet(path)


def parquet_layout_report(path: str, cols: list[str]) -> list[dict]:
    """Per-file, per-row-group footer stats for ``cols``: what a scan
    planner would prune with. Driver-side metadata read only (footers, not
    data)."""
    import os

    import pyarrow.parquet as pq

    out: list[dict] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            row: dict = {"file": name, "row_group": rg, "n_rows": md.row_group(rg).num_rows}
            for c in cols:
                stats = md.row_group(rg).column(idx[c]).statistics
                row[f"{c}_min"] = stats.min if stats else None
                row[f"{c}_max"] = stats.max if stats else None
            out.append(row)
    return out


def overlap_fraction(report: list[dict], col: str) -> float:
    """Fraction of file pairs whose [min, max] ranges on ``col`` overlap —
    0.0 is perfectly disjoint clustering, ~1.0 is unclustered. The metric a
    compaction scheduler thresholds on."""
    spans = [
        (r[f"{col}_min"], r[f"{col}_max"])
        for r in report
        if r[f"{col}_min"] is not None
    ]
    n = len(spans)
    if n < 2:
        return 0.0
    pairs = overlapping = 0
    for i in range(n):
        for j in range(i + 1, n):
            pairs += 1
            lo = max(spans[i][0], spans[j][0])
            hi = min(spans[i][1], spans[j][1])
            if lo <= hi:
                overlapping += 1
    return overlapping / pairs


def backfill_partitions(
    df_new: DataFrame, path: str, partition_cols: list[str]
) -> list:
    """Partition-scoped backfill: rewrite ONLY the partitions present in
    ``df_new``, leaving every other partition's files untouched (dynamic
    partition overwrite — the surgical recompute a 100 TB partitioned
    table needs; a plain overwrite would truncate the whole table, a plain
    append would duplicate the recomputed slice).

    Returns the affected partition values (driver-side list — partitions
    are few by definition; the rows are not collected).
    """
    affected = [
        tuple(r) for r in df_new.select(*partition_cols).distinct().collect()
    ]
    (
        df_new.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return affected


def balanced_shard_plan(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n_shards: int = 8,
    n_buckets: int = 256,
) -> DataFrame:
    """Weight-balanced shard assignment without a global sort of the data:
    the write-planning step behind ``sinks.write_corpus_shards`` when
    shards must hold ~equal TOKENS, not ~equal rows (training shards are
    consumed sequentially; a fat shard is a straggler epoch after epoch).

    Hash-sharding alone balances only in expectation, with variance
    carrying the full document-length spread. Instead:

    1. hash rows into ``n_buckets`` deterministic buckets (md5-based
       ``hash64`` — cross-engine reproducible) and aggregate each bucket's
       row count + total weight. This is the only pass over the data —
       one map-side-combined shuffle of ``n_buckets``-bounded state.
    2. sorted round-robin: order the BUCKET AGGREGATE (n_buckets rows —
       bounded regardless of corpus size, so the single-partition window
       is not a scale concern) by weight descending and deal buckets to
       shards ``row_number % n_shards``. Classic longest-first dealing:
       per-shard totals land within one max-bucket-weight of the mean,
       and buckets are ~N/n_buckets docs each, so that bound is tight.

    Returns the per-shard plan: (shard, n_buckets, n_docs, total_weight).
    For row-level sharding use :func:`shard_assignment` — the same
    hash + dealing, returning the ``(bucket, shard)`` map to
    broadcast-join back onto rows (buckets are the unit of movement, as
    in any rendezvous/consistent sharding scheme).
    """
    dealt = shard_assignment(df, key_col, weight_col, n_shards, n_buckets)
    return (
        dealt.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bw").alias("total_weight"),
        )
    )


def shard_assignment(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n_shards: int = 8,
    n_buckets: int = 256,
) -> DataFrame:
    """The bucket→shard map behind :func:`balanced_shard_plan`: one row
    per non-empty bucket — (bucket, shard, n_docs, bw). Broadcast-join it
    back on ``hash64(key) % n_buckets`` to shard rows with the exact same
    dealing the plan reported."""
    from pyspark.sql.window import Window

    from solana_etl_spark.functions.hashing import hash64

    bucket = (hash64(F.col(key_col).cast("string")) % n_buckets).alias("bucket")
    per_bucket = (
        df.select(bucket, F.col(weight_col).alias("w"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("w").alias("bw"))
    )
    return per_bucket.withColumn(
        "shard",
        (
            (F.row_number().over(Window.orderBy(F.desc("bw"), F.asc("bucket"))) - 1)
            % n_shards
        ).cast("long"),
    )
