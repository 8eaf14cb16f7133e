"""API facade parity: the reference's combinator goldens through the
user-facing surface (mirrors test_Transactions.py via api.Transactions)."""

from __future__ import annotations

import pyspark.sql.functions as F

from solana_etl_spark.api import (
    BalanceChangeAgg,
    Interactions,
    Transactions,
    coin_transfer_edges,
)
from tests.conftest import INTERESTING_TX


def _block(blocks_raw):
    return blocks_raw.filter(F.col("path").contains("110130000"))


def test_combinators(blocks_raw):
    txs = Transactions.from_blocks(_block(blocks_raw))
    assert len(txs.only_fee) == 3439
    assert len(txs.successful.only_fee) == 3185
    assert len(txs.votes) == 2677
    assert len(txs.successful.votes) == 2531
    assert txs.fees == 17420000
    assert txs.successful.fees == 16000000
    assert txs.errors.balance_change(BalanceChangeAgg.OUT) == -1420000
    assert txs.successful.balance_change(BalanceChangeAgg.OUT) == -149885890118570


def test_accounts_by_type_counts(blocks_raw):
    by_type = Transactions.from_blocks(_block(blocks_raw)).accounts_by_type()
    assert {k: len(v) for k, v in by_type.items()} == {
        "SYSVAR": 4,
        "PROGRAM": 27,
        "TOKEN": 211,
        "COIN": 3480,
    }


def test_find_by_signature(blocks_raw):
    txs = Transactions.from_blocks(_block(blocks_raw))
    assert txs.find(INTERESTING_TX).count() == 1
    assert txs.find("nonexistent-signature").count() == 0


def test_interactions_by_type(blocks_raw):
    inter = Interactions(_block(blocks_raw))
    by_type = inter.by_type()
    assert by_type["coin"].count() == 321
    assert by_type["token"].count() == 73
    assert len(inter) == 394


def test_coin_transfer_edges(blocks_raw):
    edges = coin_transfer_edges(_block(blocks_raw)).cache()
    assert edges.columns == ["source", "destination", "value", "scale", "n_transfers"]
    # edges aggregate the 321 coin transfers; every edge has positive count
    assert edges.agg(F.sum("n_transfers")).first()[0] == 321
    assert edges.filter("n_transfers < 1").count() == 0