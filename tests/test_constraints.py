"""Declarative constraints (operators/constraints.py): violation counts,
single-scan fusion of row-level rules, FK orphan detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_spark.operators import constraints as dq


def _report(df, checks):
    return {
        (r.rule, r.column): (r.n_violations, r.passed)
        for r in dq.validate(df, checks).collect()
    }


def test_row_level_rules(spark):
    df = spark.createDataFrame(
        [(1, 10, "A"), (None, 200, "A"), (3, -5, "X"), (4, 50, None)],
        "k int, v int, s string",
    )
    got = _report(
        df,
        [
            dq.not_null("k"),
            dq.in_range("v", 0, 100),
            dq.accepted_values("s", ["A", "B"]),
            dq.satisfies("even_v", "v", F.col("v") % 2 == 0),
        ],
    )
    assert got[("not_null", "k")] == (1, False)
    assert got[("in_range", "v")] == (2, False)  # 200 and -5
    assert got[("accepted_values", "s")] == (1, False)  # 'X'; NULL not counted
    assert got[("even_v", "v")] == (1, False)  # -5 odd


def test_row_level_rules_share_one_scan(spark):
    df = spark.createDataFrame([(1, 10)], "k int, v int")
    plan = (
        dq.validate(df, [dq.not_null("k"), dq.in_range("v", 0, 5)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") == 1  # fused, not one job per rule


def test_unique_and_fk(spark):
    child = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (9, "orphan"), (None, "nullfk")],
        "fk int, payload string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    got = _report(
        child,
        [dq.unique(["fk"]), dq.foreign_key("fk", parent, "pk")],
    )
    assert got[("unique", "fk")] == (2, False)  # both rows of the dup key
    assert got[("foreign_key", "fk")] == (1, False)  # 9; NULL exempt


def test_all_green(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "k int, v int")
    rep = dq.validate(df, [dq.not_null("k"), dq.unique(["k"])])
    assert all(r.passed for r in rep.collect())
