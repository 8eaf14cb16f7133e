"""Batch-sink format matrix: parquet / ORC / JSON / CSV all round-trip the
transactions-task output value-identically (the warehouse-interchange
guarantee a reference user migrating storage formats needs)."""

from __future__ import annotations

import pytest

from solana_etl_spark.sinks import read_table, write_table


@pytest.fixture(scope="module")
def task_out(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )
    df = df.cache()
    df.count()
    return df


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_round_trip_value_identity(spark, task_out, fmt, tmp_path):
    path = str(tmp_path / fmt)
    write_table(task_out, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=task_out.schema)
    assert back.schema == task_out.schema
    assert _sorted_rows(back) == _sorted_rows(task_out)


def test_orc_preserves_predicate_pushdown(spark, task_out, tmp_path):
    path = str(tmp_path / "orc_pushdown")
    write_table(task_out, path, fmt="orc")
    plan = (
        read_table(spark, path, fmt="orc")
        .filter("o_custkey = 7")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # filter reaches the ORC scan and the scan reads only the 2 used columns
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split(
        "PushedFilters"
    )[1][:200]
    assert "o_totalprice" not in plan.split("ReadSchema")[1][:200]


def test_csv_null_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None, ""), (2, "x", None)], ["k", "a", "b"]
    )
    path = str(tmp_path / "csvnull")
    write_table(df, path, fmt="csv")
    back = read_table(spark, path, fmt="csv", schema=df.schema)
    got = {r["k"]: (r["a"], r["b"]) for r in back.collect()}
    assert got[1] == (None, "")   # NULL and empty string stay distinct
    assert got[2] == ("x", None)
