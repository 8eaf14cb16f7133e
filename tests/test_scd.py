"""SCD2 history: interval chaining, tie handling, as-of lookup, and
replay determinism of the hash tie-break."""

from __future__ import annotations

from datetime import datetime

from solana_etl_spark.operators.scd import as_of, scd2_history


def _changes(spark):
    rows = [
        (1, datetime(2024, 1, 1), "a"),
        (1, datetime(2024, 2, 1), "b"),
        (1, datetime(2024, 3, 1), "c"),
        (2, datetime(2024, 1, 15), "x"),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, v string")


def test_intervals_chain_per_key(spark):
    hist = scd2_history(_changes(spark), key="k").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    k1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert [r["v"] for r in k1] == ["a", "b", "c"]
    # each valid_to == next valid_from; only the last is open/current
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    assert k1[2]["valid_to"] is None
    assert [r["is_current"] for r in k1] == [False, False, True]
    assert by_key[2][0]["is_current"]


def test_as_of_returns_one_version_per_key(spark):
    hist = scd2_history(_changes(spark), key="k")
    snap = {r["k"]: r["v"] for r in as_of(hist, "2024-02-10 00:00:00").collect()}
    assert snap == {1: "b", 2: "x"}
    # before key 2 existed
    early = {r["k"]: r["v"] for r in as_of(hist, "2024-01-05 00:00:00").collect()}
    assert early == {1: "a"}


def test_same_ts_ties_deterministic_under_replay(spark):
    rows = [
        (1, datetime(2024, 1, 1), "p"),
        (1, datetime(2024, 1, 1), "q"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string")
    a = sorted(
        (r["v"], r["is_current"]) for r in scd2_history(df, key="k").collect()
    )
    b = sorted(
        (r["v"], r["is_current"])
        for r in scd2_history(df.repartition(8), key="k").collect()
    )
    assert a == b
    assert sum(1 for _, cur in a if cur) == 1


def test_explicit_tiebreak_order(spark):
    rows = [
        (1, datetime(2024, 1, 1), 2, "later"),
        (1, datetime(2024, 1, 1), 1, "earlier"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, seq long, v string")
    hist = {
        r["v"]: r["is_current"]
        for r in scd2_history(df, key="k", tiebreak=["seq"]).collect()
    }
    assert hist == {"earlier": False, "later": True}
