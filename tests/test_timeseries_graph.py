"""Gap-fill/forward-fill and triangle counting on hand-built inputs with
known answers."""

from __future__ import annotations

from datetime import datetime

from solana_etl_spark.operators.graph import triangle_count
from solana_etl_spark.operators.timeseries import gapfill_ffill


def test_gapfill_generates_missing_buckets_and_ffills(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 15), 10.0),
        (1, datetime(2024, 1, 1, 0, 45), 5.0),   # same bucket -> sum 15
        (1, datetime(2024, 1, 1, 3, 10), 7.0),   # 2-hour gap (01:00, 02:00)
        (2, datetime(2024, 1, 1, 5, 0), 1.0),    # single-bucket key
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["key"], r["bucket"].hour): (
            r["bucket_sum"],
            r["filled"],
            r["was_gap"],
        )
        for r in gapfill_ffill(df).collect()
    }
    assert got[(1, 0)] == (15.0, 15.0, False)
    assert got[(1, 1)] == (None, 15.0, True)   # gap forward-filled
    assert got[(1, 2)] == (None, 15.0, True)
    assert got[(1, 3)] == (7.0, 7.0, False)
    assert got[(2, 5)] == (1.0, 1.0, False)
    assert len(got) == 5  # spine covers exactly each key's span


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) + pendant edge 4-5 (no new triangle)
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5),
        (2, 1),  # duplicate in reverse orientation: must not double-count
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4


def test_triangle_count_star_has_none(spark):
    # star graph: hub 0 to 1..6 — zero triangles, and the degree
    # orientation keeps every edge pointing AT the hub (no hub wedges)
    df = spark.createDataFrame([(0, i) for i in range(1, 7)], ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_edges"] == 6


def test_gapfill_empty_input(spark):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.createDataFrame([], schema)
    assert gapfill_ffill(df).count() == 0


def test_triangle_count_empty_and_selfloop(spark):
    df = spark.createDataFrame([(1, 1)], ["src", "dst"])  # self-loop only
    row = triangle_count(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (0, 0, 0)
