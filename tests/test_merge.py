"""CDC MERGE/upsert (operators/merge.py): latest-writer-wins semantics,
broadcast/shuffle strategy equivalence, and the plan-shape guarantee that
the broadcast strategy never shuffles the base side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_etl_spark.operators.merge import merge_snapshot


@pytest.fixture(scope="module")
def snapshot(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, payload string, price double",
    )
    # k=1: update v1 then update v2 (v2 wins); k=2: delete; k=3: update v2
    # and delete v2 (same-version tie -> delete wins); k=5: insert; k=4
    # untouched
    changes = spark.createDataFrame(
        [
            (1, "a1", 11.0, "U", 1),
            (1, "a2", 12.0, "U", 2),
            (2, "b", 20.0, "D", 1),
            (3, "c9", 39.0, "U", 2),
            (3, "c", 30.0, "D", 2),
            (5, "e", 50.0, "U", 1),
        ],
        "k long, payload string, price double, op string, version int",
    )
    return base, changes


EXPECT = [(1, "a2", 12.0), (4, "d", 40.0), (5, "e", 50.0)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_broadcast_semantics(snapshot):
    base, changes = snapshot
    out = merge_snapshot(base, changes, ["k"])
    assert out.columns == base.columns
    assert _rows(out) == EXPECT


def test_merge_shuffle_strategy_identical(snapshot):
    base, changes = snapshot
    out = merge_snapshot(base, changes, ["k"], strategy="shuffle")
    assert out.columns == base.columns
    assert _rows(out) == EXPECT


def test_merge_broadcast_never_shuffles_base(snapshot):
    base, changes = snapshot
    out = merge_snapshot(base, changes, ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # survivors come from a broadcast left-anti join -- the 100 TB side
    # reads straight into the join with no exchange
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the streamed (base) side of the anti join is everything between the
    # join and its BroadcastExchange build side: no shuffle there
    lines = plan.splitlines()
    start = next(i for i, l in enumerate(lines) if "LeftAnti" in l)
    stop = next(i for i in range(start, len(lines)) if "BroadcastExchange" in lines[i])
    assert not any("Exchange hashpartitioning" in l for l in lines[start:stop])


def test_merge_validates_inputs(snapshot):
    base, changes = snapshot
    with pytest.raises(ValueError, match="strategy"):
        merge_snapshot(base, changes, ["k"], strategy="sort")
    with pytest.raises(ValueError, match="missing columns"):
        merge_snapshot(base, changes.drop("version"), ["k"])
