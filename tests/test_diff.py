"""Snapshot diff: added/removed/changed classification on a crafted pair
of versions, and boundary-collision safety of the field separator."""

from __future__ import annotations

from solana_etl_spark.operators.diff import snapshot_diff


def test_diff_classifies_all_three(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], ["k", "s", "v"]
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, "k", ["s", "v"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}
    # unchanged key 2 is absent entirely


def test_diff_separator_prevents_boundary_collisions(spark):
    # ("ab", "c") and ("a", "bc") concatenate identically without a
    # separator — the \x01 field separator must keep them distinct
    old = spark.createDataFrame([(1, "ab", "c")], ["k", "x", "y"])
    new = spark.createDataFrame([(1, "a", "bc")], ["k", "x", "y"])
    got = [
        r["status"]
        for r in snapshot_diff(old, new, "k", ["x", "y"]).collect()
    ]
    assert got == ["changed"]


def test_diff_null_position_shift_is_detected(spark):
    # concat_ws drops NULLs: without the sentinel, ('a', NULL) and
    # (NULL, 'a') hash identically and the change disappears
    old = spark.createDataFrame([(1, "a", None)], "k long, x string, y string")
    new = spark.createDataFrame([(1, None, "a")], "k long, x string, y string")
    got = [
        r["status"]
        for r in snapshot_diff(old, new, "k", ["x", "y"]).collect()
    ]
    assert got == ["changed"]


def test_diff_null_to_value_is_detected(spark):
    old = spark.createDataFrame([(1, "a", None)], "k long, x string, y string")
    new = spark.createDataFrame([(1, "a", "b")], "k long, x string, y string")
    got = [
        r["status"]
        for r in snapshot_diff(old, new, "k", ["x", "y"]).collect()
    ]
    assert got == ["changed"]


def test_diff_merge_roundtrip_reconstructs_new_snapshot(spark):
    """Integration: snapshot_diff DERIVES the changes that merge_snapshot
    APPLIES — old ⊕ diff(old, new) == new. The two operators are inverse
    halves of the same CDC contract."""
    from pyspark.sql import functions as F

    from solana_etl_spark.operators.merge import merge_snapshot

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, "e", 50)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40), (5, None, 50)],
        "k long, s string, v long",
    )
    d = snapshot_diff(old, new, "k", ["s", "v"])
    # turn the diff into a merge changeset: upserts carry the NEW payload,
    # removals become deletes
    upserts = (
        d.filter(F.col("status").isin("added", "changed"))
        .select("k")
        .join(new, "k")
        .select("k", "s", "v", F.lit("U").alias("op"), F.lit(1).alias("version"))
    )
    deletes = (
        d.filter(F.col("status") == "removed")
        .select(
            "k",
            F.lit(None).cast("string").alias("s"),
            F.lit(None).cast("long").alias("v"),
            F.lit("D").alias("op"),
            F.lit(1).alias("version"),
        )
    )
    rebuilt = merge_snapshot(old, upserts.unionByName(deletes), ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
