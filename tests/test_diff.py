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
