"""Bucketed co-located join: prove the shuffle disappears."""

from __future__ import annotations

import contextlib
import io
import re

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from solana_etl_spark.operators.bucketing import write_bucketed

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, sort_col="l_orderkey")
    write_bucketed(o, "o_bucketed", "o_orderkey", 8, sort_col="o_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_has_no_shuffle(spark, warehouse, no_broadcast):
    joined = spark.table("li_bucketed").join(
        spark.table("o_bucketed"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = _plan(joined)
    # co-located: SortMergeJoin over bucketed scans, zero Exchange
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "hashpartitioning" not in plan
    # correctness unchanged
    n = joined.count()
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert n == li.join(o, li.l_orderkey == o.o_orderkey).count()


def test_unbucketed_join_does_shuffle(spark, no_broadcast):
    """Control: the same join on raw parquet shuffles both sides."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = _plan(li.join(o, li.l_orderkey == o.o_orderkey))
    assert "hashpartitioning" in plan
