"""Collection-level goldens from reference test/transform/test_Transactions.py
over fixture block 110130000."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_counts_and_only_fee(txs_110130000):
    t = txs_110130000
    assert t.count() == 3439
    assert t.filter("is_only_fee").count() == 3439
    assert t.filter("is_successful and is_only_fee").count() == 3185
    # partition completeness: more_than_fee ∪ only_fee = all
    assert t.filter("is_only_fee or not is_only_fee").count() == t.count()


def test_votes(txs_110130000):
    t = txs_110130000
    assert t.filter("is_vote").count() == 2677
    assert t.filter("is_successful and is_vote").count() == 2531


def test_fees(txs_110130000):
    t = txs_110130000
    total, successful = t.agg(
        F.sum("fee"), F.sum(F.when(F.col("is_successful"), F.col("fee")))
    ).first()
    assert total == 17420000
    assert successful == 16000000


def test_balance_change_out(txs_110130000):
    t = txs_110130000
    err_out, ok_out = t.agg(
        F.sum(F.when(~F.col("is_successful"), F.col("lamports_out"))),
        F.sum(F.when(F.col("is_successful"), F.col("lamports_out"))),
    ).first()
    assert err_out == -1420000
    assert ok_out == -149885890118570


def test_accounts_by_type_counts(txs_110130000):
    """Distinct accounts per type across all transactions (A7):
    SYSVAR 4, PROGRAM 27, TOKEN 211, COIN 3480."""
    t = txs_110130000
    coin = F.transform(
        F.filter(
            "account_types",
            lambda a: ~a["is_sysvar"] & ~a["is_program"] & ~a["is_token"],
        ),
        lambda a: a["pubkey"],
    )
    sysvar = F.transform(
        F.filter("account_types", lambda a: a["is_sysvar"]), lambda a: a["pubkey"]
    )
    row = t.agg(
        F.size(F.array_distinct(F.flatten(F.collect_list(sysvar)))).alias("sysvar"),
        F.size(F.array_distinct(F.flatten(F.collect_list("programs")))).alias("program"),
        F.size(F.array_distinct(F.flatten(F.collect_list("token_pubkeys")))).alias(
            "token"
        ),
        F.size(F.array_distinct(F.flatten(F.collect_list(coin)))).alias("coin"),
    ).first()
    assert (row.sysvar, row.program, row.token, row.coin) == (4, 27, 211, 3480)
