"""Instruction-tree goldens from reference test/transform/test_Instruction.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from solana_etl_spark.plans.instructions import filter_instructions
from tests.conftest import INTERESTING_TX


def _tx(txs):
    return txs.filter(F.col("signature") == INTERESTING_TX)


def test_count_and_programs(txs_110130000):
    row = _tx(txs_110130000).select("num_instructions", "programs").first()
    assert row.num_instructions == 21
    assert set(row.programs) == {
        "11111111111111111111111111111111",
        "ATokenGPvbdGVxr1b2hvZbsiqW5xWH25efTNsLJA8knL",
        "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA",
        "cndyAnrLdpjq1Ssp1z8xxDsB8dxe7u4HL5Nxi2K5WXZ",
        "metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s",
    }


def test_flatten_gen_ids(txs_110130000):
    """Preorder flatten with hierarchical gen_ids (T1/T2)."""
    row = _tx(txs_110130000).select(
        F.transform("instructions", lambda x: x["gen_id"]).alias("ids")
    ).first()
    assert row.ids == [
        "0",
        "1",
        "2", "2.0", "2.1", "2.2", "2.3",
        "3",
        "4", "4.0", "4.1", "4.2", "4.3", "4.4", "4.5", "4.6", "4.7", "4.8",
        "4.9", "4.10", "4.11",
    ]


def _filtered_ids(txs, program, itype, flatten):
    df = filter_instructions(
        _tx(txs), program, itype, flatten=flatten, output_col="filtered"
    )
    return df.select(
        F.transform("filtered", lambda x: x["gen_id"]).alias("ids")
    ).first().ids


def test_hierarchical_filter_system(txs_110130000):
    assert _filtered_ids(txs_110130000, "system", None, False) == [
        "0",
        "2", "2.0", "2.1", "2.2",
        "4", "4.0", "4.2", "4.3", "4.4", "4.6", "4.7", "4.8",
    ]


def test_hierarchical_filter_system_transfer(txs_110130000):
    ids = _filtered_ids(txs_110130000, "system", "transfer", False)
    assert ids == ["2", "2.0", "4", "4.0", "4.2", "4.6"]
    assert len(ids) == 6


def test_flattened_filter_system_transfer(txs_110130000):
    """flatten=True drops non-matching outers (keeps only self-matches)."""
    ids = _filtered_ids(txs_110130000, "system", "transfer", True)
    assert ids == ["2.0", "4.0", "4.2", "4.6"]
    assert len(ids) == 4


def test_instructions_view_f12_split(txs_110130000):
    """info_accounts vs info_values split (F12): a system transfer's source/
    destination are account args; lamports is a value arg."""
    from solana_etl_spark.plans.views import instructions_view

    ins = instructions_view(_tx(txs_110130000))
    row = ins.filter(
        (F.col("program_name") == "system") & (F.col("instruction_type") == "transfer")
    ).first()
    assert "source" in row.info_accounts and "destination" in row.info_accounts
    assert "lamports" in row.info_values
    assert "lamports" not in row.info_accounts
