"""Watermarked windowed aggregation: batch/stream equivalence and late-data
dropping."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from solana_etl_spark.streaming.windows import windowed_event_counts


def _write_events(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_batch_and_stream_agree(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"event_id": i, "ts": f"2024-01-01T{h:02d}:15:00", "user_id": 1,
         "event_type": t, "value": 1.5}
        for i, (h, t) in enumerate(
            [(0, "view"), (0, "view"), (1, "click"), (2, "view"), (2, "click")]
        )
    ]
    _write_events(src / "e.json", rows)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    batch = windowed_event_counts(spark.read.schema(schema).json(str(src)))
    batch_rows = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert batch_rows[("2024-01-01 00:00:00", "view")] == (2, 3.0)
    assert batch_rows[("2024-01-01 02:00:00", "click")] == (1, 1.5)

    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert stream_rows == batch_rows
