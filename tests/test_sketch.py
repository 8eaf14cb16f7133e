"""Heavy hitters: exact output equivalence vs plain groupBy, the MG
superset guarantee under adversarial partitioning, and the phi-boundary
guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from solana_etl_spark.operators.sketch import frequent_items


def _skewed_df(spark, parts):
    # one hot key (40%), one warm key (10%), long uniform tail
    rows = (
        [("hot",)] * 400
        + [("warm",)] * 100
        + [(f"tail{i}",) for i in range(500)]
    )
    return spark.createDataFrame(rows, ["k"]).repartition(parts)


def test_frequent_items_matches_exact_groupby(spark):
    df = _skewed_df(spark, 8)
    got = sorted(map(tuple, frequent_items(df, "k", 5, 100).collect()))
    want = sorted(
        map(
            tuple,
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .filter(F.col("n_rows") >= 50)
            .collect(),
        )
    )
    assert got == want == [("hot", 400), ("warm", 100)]


def test_frequent_items_partitioning_invariant(spark):
    # the sketch differs per partitioning; the verified OUTPUT must not
    one = sorted(
        map(tuple, frequent_items(_skewed_df(spark, 1), "k", 5, 100).collect())
    )
    many = sorted(
        map(
            tuple, frequent_items(_skewed_df(spark, 16), "k", 5, 100).collect()
        )
    )
    assert one == many


def test_frequent_items_explicit_min_count_above_boundary(spark):
    df = _skewed_df(spark, 4)
    got = frequent_items(df, "k", 5, 100, min_count=300).collect()
    assert [(r["k"], r["n_rows"]) for r in got] == [("hot", 400)]


def test_frequent_items_rejects_min_count_below_boundary(spark):
    df = _skewed_df(spark, 4)
    # boundary = ceil(0.05 * 1000) = 50
    with pytest.raises(ValueError, match="guarantee boundary"):
        frequent_items(df, "k", 5, 100, min_count=10)


def test_frequent_items_shuffle_fallback_same_result(spark):
    """broadcast_cap below the candidate count forces the shuffled
    semi-join (no driver-side candidate broadcast); results identical."""
    df = _skewed_df(spark, 8)
    fallback = frequent_items(df, "k", 5, 100, broadcast_cap=1)
    got = sorted(map(tuple, fallback.collect()))
    want = sorted(
        map(tuple, frequent_items(df, "k", 5, 100).collect())
    )
    assert got == want == [("hot", 400), ("warm", 100)]
    # the static plan must not FORCE a broadcast (AQE may still choose
    # one at runtime when it measures the candidate set is small — the
    # cap only removes the unconditional driver-side broadcast hint)
    plan = fallback._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" not in plan
    forced = frequent_items(df, "k", 5, 100)
    assert (
        "BroadcastHashJoin"
        in forced._jdf.queryExecution().sparkPlan().toString()
    )


def test_hll_distinct_accuracy_and_merge(spark):
    from solana_etl_spark.operators.sketch import hll_distinct, hll_registers

    df = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 2).alias("g"),
    )
    est = hll_distinct(df, "k").collect()[0]["hll_estimate"]
    assert abs(est - 5000) / 5000 < 0.1  # ~3.25% stderr at p=10
    # registers merge by max: union registers == max of split registers
    a = hll_registers(df.filter("g = 0"), "k")
    b = hll_registers(df.filter("g = 1"), "k")
    merged = {
        (r["bucket"],): r["reg"]
        for r in a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .collect()
    }
    whole = {
        (r["bucket"],): r["reg"] for r in hll_registers(df, "k").collect()
    }
    assert merged == whole
    # small-range linear counting: tiny set estimates near-exact
    tiny = spark.range(0, 30).select(F.concat(F.lit("t"), F.col("id")).alias("k"))
    est_tiny = hll_distinct(tiny, "k").collect()[0]["hll_estimate"]
    assert abs(est_tiny - 30) < 2


def test_streaming_hll_replay_converges_to_batch(spark, tmp_path):
    """Replayed/retried micro-batches converge to the batch registers
    (max-merge is idempotent and order-free), and only two state
    versions survive pruning."""
    from solana_etl_spark.operators.sketch import hll_registers
    from solana_etl_spark.streaming.hll_stream import (
        read_hll_state,
        update_hll_batch,
    )

    df = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    a = df.filter("id < 1200")
    b = df.filter("id >= 800")  # overlaps a: replayed rows
    for order in ([(0, a), (1, b)], [(0, b), (1, a)], [(0, a), (1, b), (1, b)]):
        state = tmp_path / f"s{hash(str(order)) % 10**6}"
        for bid, batch in order:
            update_hll_batch(spark, batch, str(state), bid, key_col="k")
        got = {
            (r["bucket"],): r["reg"]
            for r in read_hll_state(spark, str(state)).collect()
        }
        want = {
            (r["bucket"],): r["reg"] for r in hll_registers(df, "k").collect()
        }
        assert got == want
        kept = [p.name for p in state.iterdir() if p.name.startswith("batch=")]
        assert sorted(kept) == ["batch=0", "batch=1"]


def test_streaming_hll_int_group_key(spark, tmp_path):
    """Non-string group keys (int tenant id) must round-trip through the
    empty no-state-yet frame: the first batch's unionByName used to hit
    the hardcoded-string state schema."""
    from solana_etl_spark.operators.sketch import hll_registers
    from solana_etl_spark.streaming.hll_stream import (
        read_hll_state,
        update_hll_batch,
    )

    df = spark.range(0, 600).select(
        (F.col("id") % 3).cast("int").alias("tenant"),
        F.concat(F.lit("k"), F.col("id")).alias("k"),
    )
    state = tmp_path / "s_int"
    for bid, batch in [(0, df.filter("id < 300")), (1, df.filter("id >= 300"))]:
        update_hll_batch(
            spark, batch, str(state), bid, key_col="k", group_cols=("tenant",)
        )
    got_df = read_hll_state(spark, str(state), group_cols=("tenant",))
    assert got_df.schema["tenant"].dataType.simpleString() == "int"
    got = {(r["tenant"], r["bucket"]): r["reg"] for r in got_df.collect()}
    want = {
        (r["tenant"], r["bucket"]): r["reg"]
        for r in hll_registers(df, "k", ("tenant",)).collect()
    }
    assert got == want
