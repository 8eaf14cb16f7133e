"""Budget selection: parity with the naive window-cumsum at every boundary
shape (exact fit, mid-tier cut, budget-exceeds-total), and partitioning
invariance of the refinement path."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.operators.budget import select_to_budget


def _naive(df, budget):
    w = Window.orderBy(F.desc("s"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return {
        r["id"]
        for r in df.withColumn("_c", F.sum("wt").over(w))
        .filter(F.col("_c") <= budget)
        .collect()
    }


def _df(spark, rows, parts=4):
    return spark.createDataFrame(rows, "id long, s long, wt long").repartition(
        parts
    )


def _got(spark, df, budget):
    return {
        r["id"] for r in select_to_budget(df, "s", "wt", "id", budget).collect()
    }


def test_budget_matches_naive_cumsum(spark):
    rows = [(i, (i * 13) % 50, 5 + (i * 7) % 20) for i in range(300)]
    df = _df(spark, rows)
    for budget in (1, 57, 500, 2000):
        assert _got(spark, df, budget) == _naive(df, budget), budget


def test_budget_cuts_inside_a_tie_tier(spark):
    # every row same score: selection must be a doc-id prefix by cumsum
    rows = [(i, 7, 10) for i in range(20)]
    df = _df(spark, rows)
    assert _got(spark, df, 35) == {0, 1, 2} == _naive(df, 35)


def test_budget_exceeding_total_selects_all(spark):
    rows = [(i, i, 10) for i in range(10)]
    df = _df(spark, rows)
    assert _got(spark, df, 10_000) == set(range(10))


def test_budget_partitioning_invariant(spark):
    rows = [(i, (i * 31) % 11 - 5, 1 + i % 9) for i in range(500)]
    a = _got(spark, _df(spark, rows, parts=1), 700)
    b = _got(spark, _df(spark, rows, parts=32), 700)
    assert a == b
