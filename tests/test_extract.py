"""Unit tests for the extract loop: backoff, slot ranges, file layout
(reference parity: src/extract/Extract.py, ExtractBatch.py)."""

from __future__ import annotations

import gzip
import itertools
import json

import pytest

from solana_etl_spark.sources.extract import (
    BlockException,
    execute_with_backoff,
    extract_batch,
    slot_range,
    write_block_file,
)


def test_slot_ranges():
    assert list(slot_range(5, 8)) == [5, 6, 7, 8]
    assert list(slot_range(8, 5)) == [8, 7, 6, 5]  # descending inclusive
    assert list(itertools.islice(slot_range(3, None), 4)) == [3, 4, 5, 6]


def test_backoff_retries_then_succeeds():
    sleeps = []
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return {"ok": True}

    r = execute_with_backoff(flaky, sleep=sleeps.append)
    assert r.response == {"ok": True}
    assert sleeps == [5, 10]  # doubled each retry


def test_backoff_gives_up_past_max():
    sleeps = []

    def always_fails():
        raise RuntimeError("broken")

    r = execute_with_backoff(always_fails, sleep=sleeps.append)
    assert r.response is None
    # 5,10,20,40 slept; next wait 80 > 60 → stop
    assert sleeps == [5, 10, 20, 40]


def test_block_not_available_is_retryable():
    e = BlockException({"code": -32004, "message": "not yet available"})
    assert e.should_retry()
    assert not BlockException({"code": -32009, "message": "skipped"}).should_retry()


def test_nonretryable_block_exception_stops_immediately():
    sleeps = []

    def skipped_slot():
        raise BlockException({"code": -32009, "message": "slot skipped"})

    r = execute_with_backoff(skipped_slot, sleep=sleeps.append)
    assert r.response is None
    assert sleeps == []


def test_extract_batch_layout(tmp_path):
    blocks = {s: {"jsonrpc": "2.0", "result": {"blockTime": s}} for s in (9_999, 10_000, 10_001)}
    n = extract_batch(
        blocks.__getitem__, tmp_path, 9_999, 10_001, slots_per_dir=10_000,
        sleep=lambda _: None, log=lambda _: None,
    )
    assert n == 3
    # bucket layout: slot // N * N
    assert (tmp_path / "0" / "9999.json.gz").exists()
    assert (tmp_path / "10000" / "10000.json.gz").exists()
    assert (tmp_path / "10000" / "10001.json.gz").exists()
    with gzip.open(tmp_path / "10000" / "10001.json.gz") as f:
        assert json.load(f)["result"]["blockTime"] == 10_001


def test_extract_skips_failed_slots(tmp_path):
    def fetch(slot):
        if slot == 2:
            raise BlockException({"code": -32009, "message": "skipped"})
        return {"result": {"blockTime": slot}}

    n = extract_batch(fetch, tmp_path, 1, 3, sleep=lambda _: None, log=lambda _: None)
    assert n == 2
    assert not (tmp_path / "0" / "2.json.gz").exists()


def test_cli_task_expansion():
    from solana_etl_spark.cli import expand_tasks

    assert expand_tasks(["ALL"]) == {"transactions", "transfers", "blocks"}
    assert expand_tasks(["Transfers", "blocks"]) == {"transfers", "blocks"}
    with pytest.raises(KeyError):
        expand_tasks(["nope"])


def test_cli_single_file_flag_parses():
    """--single_file defaults on; --no-single_file turns it off (the r1 flag
    was store_true with default=True — a no-op)."""
    import argparse

    from solana_etl_spark import cli as cli_mod

    p = argparse.ArgumentParser()
    p.add_argument(
        "--single_file", action=argparse.BooleanOptionalAction, default=True
    )
    assert p.parse_args([]).single_file is True
    assert p.parse_args(["--no-single_file"]).single_file is False
    # the real parser accepts the negative form without error
    import inspect

    src = inspect.getsource(cli_mod.cmd_load_file)
    assert "BooleanOptionalAction" in src


def test_cli_load_file_no_single_file(tmp_path, spark):
    """load-file with --no-single_file writes many-part CSV outputs."""
    import glob as _glob
    import shutil

    from tests.conftest import BLOCK_110130000

    blocks = tmp_path / "blocks" / "0"
    blocks.mkdir(parents=True)
    shutil.copy(BLOCK_110130000, blocks / "110130000.json.gz")
    dest = tmp_path / "out"

    from solana_etl_spark.cli import cmd_load_file

    rc = cmd_load_file(
        [
            "all",
            str(tmp_path / "blocks"),
            str(dest),
            "--no-single_file",
        ]
    )
    assert rc == 0
    files = _glob.glob(str(dest / "transactions" / "*.csv"))
    assert files  # output exists; many-part layout allowed
