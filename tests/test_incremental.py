"""Incremental aggregate state (operators/incremental.py): merge-then-
finalize equals compute-once, merge is associative, KMV error bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_spark.operators.incremental import (
    agg_state,
    kmv_estimate,
    merge_states,
)

KW = dict(
    keys=["g"], sum_cols=["v"], minmax_cols=["v"], kmv_cols=["u"], k=32
)


def _data(spark):
    return spark.range(0, 3000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 7 % 100).cast("double").alias("v"),
        (F.col("id") % 500).alias("u"),  # 500 distinct per... shared
        F.col("id").alias("ts"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merged_state_equals_direct_state(spark):
    df = _data(spark)
    direct = agg_state(df, **KW)
    halves = merge_states(
        agg_state(df.filter(F.col("ts") < 1500), **KW),
        agg_state(df.filter(F.col("ts") >= 1500), **KW),
        **KW,
    )
    assert _rows(direct) == _rows(halves)


def test_merge_is_associative(spark):
    df = _data(spark)
    a = agg_state(df.filter(F.col("ts") < 1000), **KW)
    b = agg_state(df.filter((F.col("ts") >= 1000) & (F.col("ts") < 2000)), **KW)
    c = agg_state(df.filter(F.col("ts") >= 2000), **KW)
    left = merge_states(merge_states(a, b, **KW), c, **KW)
    right = merge_states(a, merge_states(b, c, **KW), **KW)
    assert _rows(left) == _rows(right)


def test_kmv_estimate_bounded_error(spark):
    # one group, exactly 1000 distinct values, k=128
    df = spark.range(0, 5000).select(
        F.lit(0).alias("g"), (F.col("id") % 1000).alias("u")
    )
    state = agg_state(df, keys=["g"], kmv_cols=["u"], k=128)
    est = state.select(kmv_estimate("u_kmv", k=128)).first()[0]
    assert abs(est - 1000) / 1000 < 0.25  # ~1/sqrt(128) expected error


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 20).alias("u")
    )
    state = agg_state(df, keys=["g"], kmv_cols=["u"], k=64)
    for r in state.select(kmv_estimate("u_kmv", k=64)).collect():
        assert r[0] == 10.0  # 10 distinct per group, exact


def test_join_maintenance_equals_full_recompute(spark):
    """Delta-rule join maintenance over crafted snapshots: the incremental
    union must equal the recompute on the combined tables — including
    delta-delta matches (a new order matched only by a new lineitem)."""
    from solana_etl_spark.operators.incremental import maintain_join_append

    a_old = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "a"])
    da = spark.createDataFrame([(3, "z")], ["k", "a"])
    b_old = spark.createDataFrame([(1, 10), (3, 30)], ["k", "b"])
    db = spark.createDataFrame([(2, 20), (3, 31)], ["k", "b"])

    old = a_old.join(b_old, ["k"])
    inc = maintain_join_append(old, a_old, b_old, da, db, ["k"])
    full = (
        a_old.unionByName(da).join(b_old.unionByName(db), ["k"])
    )
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )
    # the delta-delta pair (3, z, 31) must be present
    assert (3, "z", 31) in {tuple(r) for r in inc.collect()}
