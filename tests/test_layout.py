"""Layout operators: Z-order bit interleave, range-clustered compaction,
and footer-stat disjointness (the data-skipping proof)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_etl_spark.operators.layout import (
    cluster_and_compact,
    overlap_fraction,
    parquet_layout_report,
    quantize,
    write_clustered,
    zorder_key,
    zorder_key_sql,
)


def test_zorder_interleave_known_values(spark):
    # x=0b11 -> bits 0,2 ; y=0b01 -> bit 1 ; interleaved = 0b0111 = 7
    row = (
        spark.createDataFrame([(3, 1)], "x long, y long")
        .select(zorder_key([F.col("x"), F.col("y")], bits=2))
        .first()
    )
    assert row[0] == 7


def test_zorder_sql_matches_column(spark):
    df = spark.range(0, 500).select(
        (F.col("id") * 7 % 311).alias("x"), (F.col("id") * 13 % 257).alias("y")
    )
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=9)
    ).withColumn("sql_key", F.expr(zorder_key_sql(["x", "y"], bits=9)))
    assert got.filter(F.col("zorder_key") != F.col("sql_key")).count() == 0


def test_quantize_bounds(spark):
    df = spark.range(0, 1000).select(
        quantize(F.col("id"), 0, 999, bits=4).alias("q")
    )
    stats = df.agg(F.min("q"), F.max("q"), F.countDistinct("q")).first()
    assert stats == (0, 15, 16)


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    # 32x32 grid -> 16 files; a single-column sort leaves the other
    # dimension unclustered (every file overlaps every other), the z-order
    # bounds BOTH
    grid = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    zed = grid.withColumn("zk", zorder_key([F.col("x"), F.col("y")], bits=5))

    z_path = str(tmp_path / "zorder")
    write_clustered(zed, z_path, ["zk"], 16)
    z_report = parquet_layout_report(z_path, ["x", "y"])
    assert overlap_fraction(z_report, "x") < 0.4
    assert overlap_fraction(z_report, "y") < 0.4

    x_path = str(tmp_path / "xsort")
    write_clustered(zed, x_path, ["x"], 16)
    x_report = parquet_layout_report(x_path, ["x", "y"])
    assert overlap_fraction(x_report, "y") > 0.9  # unclustered dimension


def test_compaction_file_count_and_content(spark, tmp_path):
    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") * 17 % 1000).alias("k")
    )
    df.repartition(64).write.parquet(src)
    import os

    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 64

    loaded = spark.read.parquet(src)
    write_clustered(loaded, out, ["k"], 4)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4
    re_read = spark.read.parquet(out)
    assert re_read.count() == 10_000
    assert re_read.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
    # compacted files own near-disjoint k ranges
    report = parquet_layout_report(out, ["k"])
    assert overlap_fraction(report, "k") <= 0.2


def test_cluster_plan_is_single_range_exchange(spark):
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    plan = (
        cluster_and_compact(df, ["k"], 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan


def test_zorder_key_rejects_overflow():
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key([F.lit(1), F.lit(2)], bits=32)


def test_backfill_overwrites_only_affected_partitions(spark, tmp_path):
    from solana_etl_spark.operators.layout import backfill_partitions

    path = str(tmp_path / "table")
    full = spark.createDataFrame(
        [(d, i, float(i)) for d in ("d1", "d2", "d3") for i in range(10)],
        "day string, k int, v double",
    )
    full.write.partitionBy("day").parquet(path)

    import os

    d1_files = sorted(os.listdir(f"{path}/day=d1"))
    d1_mtimes = {f: os.path.getmtime(f"{path}/day=d1/{f}") for f in d1_files}

    # recompute only d2 (values doubled) and add a new day d4
    patch = spark.createDataFrame(
        [("d2", i, float(i * 2)) for i in range(10)]
        + [("d4", i, float(i)) for i in range(5)],
        "day string, k int, v double",
    )
    affected = backfill_partitions(patch, path, ["day"])
    assert sorted(affected) == [("d2",), ("d4",)]

    # d1 untouched byte-for-byte (same files, same mtimes)
    assert sorted(os.listdir(f"{path}/day=d1")) == d1_files
    assert {
        f: os.path.getmtime(f"{path}/day=d1/{f}") for f in d1_files
    } == d1_mtimes

    out = spark.read.parquet(path)
    assert out.count() == 35  # 10 + 10 + 10 + 5
    got = {
        (r.day, r.k): r.v
        for r in out.filter("day in ('d1','d2','d4')").collect()
    }
    assert got[("d1", 3)] == 3.0
    assert got[("d2", 3)] == 6.0  # recomputed
    assert got[("d4", 4)] == 4.0  # new partition


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Partition-pruned fact scans under a selective dim join: the scan's
    PartitionFilters must carry a runtime dynamicpruning expression (DPP),
    so at scale the fact side reads only the dim-selected partitions
    instead of the whole table. Results must equal the unpruned join."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    path = str(tmp_path / "fact_part")
    ev = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 20).alias("day"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        spark.range(0, 20)
        .select(F.col("id").alias("day"), (F.col("id") % 5).alias("grp"))
        .filter(F.col("grp") == 0)
    )
    joined = fact.join(dim, fact["day"] == dim["day"]).groupBy(fact["day"]).count()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    assert "dynamicpruning" in buf.getvalue().lower()

    got = {(r[0], r[1]) for r in joined.collect()}
    want = {
        (r[0], r[1])
        for r in ev.join(dim, ev["day"] == dim["day"])
        .groupBy(ev["day"])
        .count()
        .collect()
    }
    assert got == want and len(got) == 4


def test_balanced_shard_plan_balance_and_totals(spark):
    """The dealt plan conserves docs/weight exactly and balances shard
    weights far tighter than the raw document-length spread: every shard
    within ±1 max-bucket-weight of the mean (the dealing bound)."""
    from solana_etl_spark.operators.layout import balanced_shard_plan

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = balanced_shard_plan(
        docs, key_col="doc_id", weight_col="n_chars", n_shards=8, n_buckets=256
    ).collect()
    total_docs = docs.count()
    total_w = docs.agg({"n_chars": "sum"}).first()[0]
    assert sum(r["n_docs"] for r in plan) == total_docs
    assert sum(r["total_weight"] for r in plan) == total_w
    weights = [r["total_weight"] for r in plan]
    mean = total_w / len(weights)
    # dealing bound: deviation from the mean is at most one bucket's weight
    max_bucket = (
        docs.selectExpr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS LONG) % 256 AS bucket",
            "n_chars",
        )
        .groupBy("bucket")
        .agg({"n_chars": "sum"})
        .agg({"sum(n_chars)": "max"})
        .first()[0]
    )
    assert max(abs(w - mean) for w in weights) <= max_bucket
