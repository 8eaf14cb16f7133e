"""Exact quantile refinement: parity with a Python sort at every rank
shape (duplicates, skew, negatives, single-value), partitioning
invariance, and the ceil-rank boundary."""

from __future__ import annotations

import math

import pytest

from solana_etl_spark.operators.quantiles import exact_quantiles


def _py_quantile(values, num, den):
    s = sorted(values)
    rank = max(1, math.ceil(num * len(s) / den))
    return s[rank - 1]


def _check(spark, values, qs, buckets=8):
    # tiny bucket count forces multiple refinement passes
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    got = {
        (r["q_num"], r["q_den"]): r["value"]
        for r in exact_quantiles(df, "x", qs, buckets=buckets).collect()
    }
    want = {(n, d): _py_quantile(values, n, d) for n, d in qs}
    assert got == want


def test_quantiles_wide_domain_multi_pass(spark):
    values = [i * 1_000_003 for i in range(500)] + [7, 7, 7, -40]
    _check(spark, values, [(1, 2), (9, 10), (99, 100), (1, 100)])


def test_quantiles_heavy_duplicates(spark):
    values = [5] * 400 + [9] * 100 + [1] * 3
    _check(spark, values, [(1, 2), (9, 10), (1, 1)])


def test_quantiles_single_value(spark):
    _check(spark, [42] * 10, [(1, 2), (99, 100)])


def test_quantiles_partitioning_invariant(spark):
    values = [(i * 37) % 1000 - 500 for i in range(2000)]
    df1 = spark.createDataFrame([(v,) for v in values], ["x"]).coalesce(1)
    df2 = spark.createDataFrame([(v,) for v in values], ["x"]).repartition(16)
    qs = [(1, 2), (3, 4)]
    a = sorted(map(tuple, exact_quantiles(df1, "x", qs, buckets=16).collect()))
    b = sorted(map(tuple, exact_quantiles(df2, "x", qs, buckets=16).collect()))
    assert a == b


def test_quantiles_empty_raises(spark):
    df = spark.createDataFrame([], "x long")
    with pytest.raises(ValueError, match="empty"):
        exact_quantiles(df, "x", [(1, 2)])


def test_mad_outliers_matches_python_reference(spark):
    from solana_etl_spark.operators.quantiles import mad_outliers

    values = [(i, 100 + (i % 7)) for i in range(60)] + [
        (60, 100000),   # the planted outlier
        (61, None),     # dropped (null column value)
    ]
    df = spark.createDataFrame(values, "id long, x long")
    present = sorted(v for _, v in values if v is not None)
    med = _py_quantile(present, 1, 2)
    mad = _py_quantile(sorted(abs(v - med) for v in present), 1, 2)
    rows = {r.id: r for r in mad_outliers(df, "x").collect()}
    assert len(rows) == 61  # null row excluded
    assert all(r.median == med and r.mad == mad for r in rows.values())
    want_outliers = {
        i for i, v in values if v is not None and abs(v - med) > 3 * mad
    }
    assert {i for i, r in rows.items() if r.is_outlier} == want_outliers
    assert 60 in want_outliers  # the planted outlier is flagged


def test_winsorize_matches_python_clip(spark):
    from solana_etl_spark.operators.quantiles import winsorize

    values = [(i, (i * 37) % 997) for i in range(300)] + [
        (300, -5000),
        (301, 900000),
        (302, None),  # NULLs pass through unclipped
    ]
    df = spark.createDataFrame(values, "id long, x long")
    present = [v for _, v in values if v is not None]
    lo = _py_quantile(present, 1, 100)
    hi = _py_quantile(present, 99, 100)
    got = {r.id: r.x_w for r in winsorize(df, "x").collect()}
    want = {
        i: (None if v is None else max(min(v, hi), lo)) for i, v in values
    }
    assert got == want
    assert got[300] == lo and got[301] == hi  # the planted outliers clip
