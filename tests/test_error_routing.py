"""Error side-channel fidelity (§7.4): semantic transfer failures become
error rows instead of exceptions, and keep_subdirs partitions outputs."""

from __future__ import annotations

import glob
import gzip
import json

import pyspark.sql.functions as F

from solana_etl_spark.sources import read_blocks
from solana_etl_spark.plans.tasks import run_all_tasks

# token transfer whose source AND destination have no token-balance entry →
# the reference raises a bare Exception (Transfer.py:55); we emit an error row
BROKEN_TOKEN_TRANSFER_BLOCK = {
    "jsonrpc": "2.0",
    "id": 1,
    "result": {
        "blockHeight": 7,
        "blockTime": 1700000001,
        "blockhash": "HASH7",
        "parentSlot": 6,
        "previousBlockhash": "HASH6",
        "transactions": [
            {
                "meta": {
                    "err": None,
                    "fee": 5000,
                    "preBalances": [10, 10, 10, 10],
                    "postBalances": [10, 10, 10, 10],
                    "preTokenBalances": [],  # ← no balance info at all
                    "postTokenBalances": [],
                    "innerInstructions": [],
                },
                "transaction": {
                    "signatures": ["SIGBROKEN"],
                    "message": {
                        "accountKeys": [
                            {"pubkey": "SRC", "signer": True, "writable": True},
                            {"pubkey": "DST", "signer": False, "writable": True},
                            {"pubkey": "AUTH", "signer": True, "writable": False},
                            {
                                "pubkey": "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA",
                                "signer": False,
                                "writable": False,
                            },
                        ],
                        "recentBlockhash": "RBH",
                        "instructions": [
                            {
                                "program": "spl-token",
                                "programId": "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA",
                                "parsed": {
                                    "type": "transfer",
                                    "info": {
                                        "source": "SRC",
                                        "destination": "DST",
                                        "amount": "12345",
                                        "authority": "AUTH",
                                    },
                                },
                            }
                        ],
                    },
                },
            }
        ],
    },
}


def test_semantic_transfer_failure_becomes_error_row(spark, tmp_path):
    with gzip.open(tmp_path / "7.json.gz", "w") as f:
        f.write(json.dumps(BROKEN_TOKEN_TRANSFER_BLOCK).encode())
    out = run_all_tasks(read_blocks(spark, str(tmp_path / "*.json.gz")))
    assert out["transfers"].count() == 0
    errors = out["errors"].collect()
    assert len(errors) == 1
    assert errors[0].name == "blocks_to_transfers"
    assert errors[0].block == "7.json.gz"
    assert "no token balance change" in errors[0].message
    # the job itself never failed; other tables fine
    assert out["transactions"].count() == 1
    assert out["blocks"].count() == 1


def test_keep_subdirs_partitions_outputs(spark, tmp_path, blocks_raw):
    from solana_etl_spark.sinks import write_task_outputs

    out = run_all_tasks(blocks_raw)
    write_task_outputs(
        {"transfers": out["transfers"]}, str(tmp_path), keep_subdirs=True
    )
    parts = sorted(
        p.split("=")[-1]
        for p in glob.glob(str(tmp_path / "transfers" / "slot_bucket=*"))
    )
    assert parts == ["110130000", "110360000"]
