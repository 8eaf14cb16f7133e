"""Sinks (CSV append header semantics, task-output writing) and the
streaming pipeline (foreachBatch reuse of batch tasks) + stateful
sessionization."""

from __future__ import annotations

import glob
import os
import time

import pyspark.sql.functions as F
import pytest

from solana_etl_spark.sinks import append_csv, write_task_outputs
from tests.conftest import BLOCK_110130000


def _csv_rows(path):
    # recursive: the exactly-once streaming sink writes per-batch subdirs
    rows = []
    for f in sorted(glob.glob(os.path.join(path, "**", "*.csv"), recursive=True)):
        with open(f) as fh:
            rows.extend(line.rstrip("\n") for line in fh if line.strip())
    return rows


def test_append_csv_header_only_on_create(spark, tmp_path):
    path = str(tmp_path / "out")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    append_csv(df, path)
    append_csv(spark.createDataFrame([(2, "b")], ["id", "v"]), path)
    rows = _csv_rows(path)
    # exactly one header line despite two appends (ExtractStreaming.py:28-33)
    assert sum(1 for r in rows if r == "id,v") == 1
    assert len(rows) == 3


def test_write_task_outputs_csv(spark, tmp_path, blocks_raw):
    from solana_etl_spark.plans.tasks import run_all_tasks

    out = run_all_tasks(blocks_raw)
    write_task_outputs(out, str(tmp_path), fmt="csv")
    for name in ("transactions", "transfers", "blocks", "errors"):
        assert glob.glob(str(tmp_path / name / "*.csv")), name
    # e2e shape parity: 394+194 transfer rows + 1 header
    assert len(_csv_rows(str(tmp_path / "transfers"))) == 588 + 1


def test_streaming_load_matches_batch(spark, tmp_path):
    """ST2 parity: the streaming path produces the same rows as batch."""
    import shutil

    from solana_etl_spark.streaming.pipeline import start_streaming_load

    blocks_dir = tmp_path / "blocks"
    blocks_dir.mkdir()
    shutil.copy(BLOCK_110130000, blocks_dir / "110130000.json.gz")

    dest = str(tmp_path / "dest")
    q = start_streaming_load(spark, str(blocks_dir), dest)
    q.awaitTermination(120)
    assert not q.isActive or q.awaitTermination(60)

    transfers = _csv_rows(os.path.join(dest, "transfers"))
    assert len(transfers) == 394 + 1
    transactions = _csv_rows(os.path.join(dest, "transactions"))
    assert len(transactions) == 3439 + 1


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization over a rate-limited file stream:
    closed sessions are emitted with correct event counts."""
    import pandas as pd

    from solana_etl_spark.streaming.sessionize_stream import sessionize_stateful

    src = tmp_path / "events"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1: two sessions (gap 1h between event 2 and 3); user 2: one session
    for uid, offsets in ((1, [0, 60, 7200, 7260]), (2, [0, 30])):
        for off in offsets:
            rows.append(
                {
                    "user_id": uid,
                    "ts": (base + pd.Timedelta(seconds=off)).isoformat(),
                }
            )
    pd.DataFrame(rows).to_json(src / "events.json", orient="records", lines=True)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(src))
    )
    sessions = sessionize_stateful(stream, gap_seconds=1800)
    query = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # the query services processing-time state timeouts, so it does not
    # self-terminate under availableNow — poll for the expected emission
    # (same 120 s worst-case the old blind awaitTermination(120) had, but
    # ~seconds in practice) and stop the query explicitly
    import time as _time

    got: set = set()
    deadline = _time.time() + 120
    while _time.time() < deadline:
        got = {
            (r.user_id, r.n_events)
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
        if (1, 2) in got:
            break
        _time.sleep(0.5)
    query.stop()
    # only user 1's FIRST session closes within the batch (second stays open
    # in state awaiting timeout; user 2's single session also stays open)
    assert (1, 2) in got


def test_write_corpus_shards_layout_and_manifest(spark, tmp_path):
    from solana_etl_spark.sinks import write_corpus_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_corpus_shards(
        docs, out, partition_cols=("lang",), max_rows_per_file=20
    ).collect()

    # hive layout per lang
    import glob as _glob
    import os as _os

    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for lang in langs:
        assert _os.path.isdir(f"{out}/lang={lang}")
    # file size bound respected
    assert all(r.rows <= 20 for r in manifest)
    # manifest row count equals corpus row count, nothing lost
    assert sum(r.rows for r in manifest) == docs.count()
    # manifest persisted for the data loader
    assert _glob.glob(f"{out}/_manifest/*.json")
    # round-trip: written shards contain exactly the input rows
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_write_task_outputs_orc_and_jsonl(spark, tmp_path):
    """Beyond-reference sink formats: ORC and JSONL round-trip the task
    outputs with identical rows."""
    from solana_etl_spark.sinks import write_task_outputs

    df = spark.createDataFrame(
        [(1, "a", True), (2, "b", False)], "id long, s string, ok boolean"
    )
    for fmt, reader in (("orc", "orc"), ("json", "json")):
        out = str(tmp_path / fmt)
        write_task_outputs({"t": df}, out, fmt=fmt, single_file=False)
        back = getattr(spark.read, reader)(f"{out}/t")
        assert sorted(tuple(r) for r in back.select("id", "s", "ok").collect()) == [
            (1, "a", True),
            (2, "b", False),
        ]
