"""Skew-mitigation operators: result parity with the unsalted plans plus
plan-shape assertions (salt in the join keys, no broadcast of the dim side,
value-spread phase-1 aggregate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_etl_spark.operators.skew import (
    SALT_COL,
    hot_keys,
    salted_join,
    two_phase_count_distinct,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k fact rows, 80% on key 7 (the hot key), dims 50 rows
    facts = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 8, F.lit(7))
        .otherwise(F.col("id") % 50)
        .cast("long")
        .alias("k"),
        (F.col("id") * 31 % 97).alias("v"),
    )
    dims = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return facts, dims


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(skewed):
    facts, dims = skewed
    plain = facts.join(dims, ["k"])
    salted = salted_join(facts, dims, ["k"], n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_matches_plain_left(skewed):
    facts, dims = skewed
    # left join with a dim gap: drop half the dims so unmatched facts survive
    dims_half = dims.filter(F.col("k") < 25)
    plain = facts.join(dims_half, ["k"], "left")
    salted = salted_join(facts, dims_half, ["k"], n_salts=4, how="left")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_salts_the_join_key(skewed):
    facts, dims = skewed
    # keep the join a real shuffle join so the salt matters
    spark = facts.sparkSession
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = salted_join(facts, dims, ["k"], n_salts=8)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert SALT_COL in plan  # join keys include the salt


def test_salted_join_rejects_unsupported_how(skewed):
    facts, dims = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dims, ["k"], how="full")


def test_salted_join_deterministic(skewed):
    facts, dims = skewed
    a = _rows(salted_join(facts, dims, ["k"], n_salts=8))
    b = _rows(salted_join(facts, dims, ["k"], n_salts=8))
    assert a == b


def test_two_phase_count_distinct_exact(skewed):
    facts, _ = skewed
    expect = _rows(
        facts.groupBy("k").agg(F.countDistinct("v").alias("n_distinct"))
    )
    got = _rows(two_phase_count_distinct(facts, ["k"], "v"))
    assert got == expect


def test_hot_keys_reports_the_hot_key(skewed):
    facts, _ = skewed
    report = hot_keys(facts, ["k"], min_rows=1000).collect()
    assert report[0]["k"] == 7
    assert report[0]["n_rows"] == 8000


def test_profile_table_stats(spark):
    from solana_etl_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bbbb", 5.0), (3, None, 5.0), (3, "aa", 6.0)],
        "id long, s string, x double",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "x"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["id"]["n_nulls"] == 0 and rows["id"]["n_distinct"] == 3
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["avg_len"] == pytest.approx((2 + 4 + 2) / 3)
    assert rows["x"]["n_nulls"] == 1 and rows["x"]["n_distinct"] == 2
    assert rows["x"]["min_value"] == "5.0" and rows["x"]["max_value"] == "6.0"
    assert rows["x"]["avg_len"] is None


def test_two_phase_count_distinct_null_parity(spark):
    from solana_etl_spark.operators.skew import two_phase_count_distinct

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)],
        "k string, v string",
    )
    expect = sorted(
        tuple(r)
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n_distinct")).collect()
    )
    got = sorted(tuple(r) for r in two_phase_count_distinct(df, ["k"], "v").collect())
    assert got == expect  # a=2, b=0 — NULL not counted, all-null key kept


def test_salted_join_rejects_salt_column_collision(spark):
    from solana_etl_spark.operators.skew import SALT_COL, salted_join

    facts = spark.createDataFrame([(1, 0)], f"k long, {SALT_COL} int")
    dims = spark.createDataFrame([(1, "d")], "k long, label string")
    with pytest.raises(ValueError):
        salted_join(facts, dims, ["k"])


def test_profile_table_hostile_column_names(spark):
    from solana_etl_spark.operators.profile import profile_table

    df = spark.createDataFrame([(1, "x")], ["user name", "it's"])
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"user name", "it's"}
    assert rows["user name"]["n_distinct"] == 1
