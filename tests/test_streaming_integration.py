"""ST1/ST2 integration: the extract loop lands block files; the streaming
load tails the directory incrementally, appending outputs exactly once per
block across restarts (checkpointed)."""

from __future__ import annotations

import glob
import os
import shutil

from solana_etl_spark.sources.extract import extract_batch
from solana_etl_spark.streaming.pipeline import start_streaming_load
from tests.conftest import BLOCK_110130000


def _count_rows(path):
    n = 0
    for f in glob.glob(os.path.join(path, "*.csv")):
        with open(f) as fh:
            n += sum(1 for line in fh if line.strip())
    return n


def test_extract_then_incremental_stream(spark, tmp_path):
    blocks_dir = tmp_path / "blocks"
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: extract two synthetic slots via the extract loop
    fixture_fetch = lambda slot: {  # noqa: E731
        "jsonrpc": "2.0",
        "result": {
            "blockHeight": slot,
            "blockTime": 1700000000 + slot,
            "blockhash": f"H{slot}",
            "parentSlot": slot - 1,
            "previousBlockhash": f"H{slot - 1}",
            "transactions": [],
        },
    }
    extract_batch(
        fixture_fetch, blocks_dir / "0", 1, 2, sleep=lambda _: None, log=lambda _: None
    )
    q = start_streaming_load(spark, f"{blocks_dir}/*", dest, ckpt)
    q.awaitTermination(120)

    blocks_rows_1 = _count_rows(os.path.join(dest, "blocks"))
    assert blocks_rows_1 == 2 + 1  # two empty blocks + header

    # batch 2: a real fixture block arrives later; restart picks up ONLY it
    shutil.copy(BLOCK_110130000, blocks_dir / "0" / "110130000.json.gz")
    q2 = start_streaming_load(spark, f"{blocks_dir}/*", dest, ckpt)
    q2.awaitTermination(180)

    assert _count_rows(os.path.join(dest, "blocks")) == blocks_rows_1 + 1
    assert _count_rows(os.path.join(dest, "transfers")) == 394 + 1
    assert _count_rows(os.path.join(dest, "transactions")) == 3439 + 1

    # restart with NO new files: checkpoint prevents reprocessing
    q3 = start_streaming_load(spark, f"{blocks_dir}/*", dest, ckpt)
    q3.awaitTermination(60)
    assert _count_rows(os.path.join(dest, "transfers")) == 394 + 1
