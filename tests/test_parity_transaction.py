"""Per-transaction goldens from reference test/transform/test_Transaction.py."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from tests.conftest import INTERESTING_TX, TOKEN_TX


def _tx(txs, signature):
    return txs.filter(F.col("signature") == signature)


def test_balance_changes_map(txs_110130000):
    rows = (
        _tx(txs_110130000, INTERESTING_TX)
        .select(F.explode("balance_changes").alias("c"))
        .select("c.pubkey", "c.change")
        .collect()
    )
    got = {r.pubkey: r.change / 1e9 for r in rows}
    assert got == {
        "11111111111111111111111111111111": 0.0,
        "4QuHa8NuHCFvx2XgYG5F5LyG8CpaHXXaDbn3ouv9khxh": 0.0,
        "5KFsC5mLg6d2MbJgCs4k2qJVampgPoZFeuSwsUjSN2gJ": 0.00203928,
        "6DLUecp4G13R4BCANcYZm3W3A55vm8ith7VscMAr8wV3": -0.0119812,
        "6vV7x9Gzrkd7HGds9JyQ3NuMNao3aVBJtyL1aJLM5CKY": 0.0028536,
        "7WK1nq1iCw6W2Da5PM5dihn8iCEvjBC3QAzEHKYFGfNY": 0.00561672,
        "7zAhomM86b2LCtRniiSUor1qEYSH2LWUBB4WJXCzeEts": 0.0,
        "ATokenGPvbdGVxr1b2hvZbsiqW5xWH25efTNsLJA8knL": 0.0,
        "E2HeNtruwL6bcd6XSqKGk5ucw43jrNsThFHoSmTNeSbi": 0.0014616,
        "SysvarC1ock11111111111111111111111111111111": 0.0,
        "SysvarRent111111111111111111111111111111111": 0.0,
        "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA": 0.0,
        "cndyAnrLdpjq1Ssp1z8xxDsB8dxe7u4HL5Nxi2K5WXZ": 0.0,
        "metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s": 0.0,
    }


def test_balance_change_modes(txs_110130000):
    """ALL = −fee; ABS / OUT / IN goldens (BalanceChangeAgg modes M1)."""
    abs_change = F.aggregate(
        "balance_changes",
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.abs(x["change"]),
    )
    row = (
        _tx(txs_110130000, INTERESTING_TX)
        .select(
            "net_balance_change",
            abs_change.alias("abs_change"),
            "lamports_out",
            "lamports_in",
        )
        .first()
    )
    assert row.net_balance_change / 1e9 == -0.00001
    assert row.abs_change / 1e9 == 0.0239524
    assert row.lamports_out / 1e9 == -0.0119812
    assert row.lamports_in / 1e9 == 0.0119712


def test_token_balance_changes_map(txs_110130000):
    rows = (
        _tx(txs_110130000, TOKEN_TX)
        .select(F.explode("token_changes").alias("c"))
        .select("c.pubkey", "c.change", "c.scale")
        .collect()
    )
    got = {r.pubkey: float(r.change) / 10**r.scale for r in rows}
    assert got == pytest.approx(
        {
            "5cR1yJcjMaHLAPMqXEZc6zaTazn1fiDctXG39crTUfq3": 0.284203,
            "6H4TkDcHEWkyM2LVNkHdmBsZym4b7Hf5SYfq4HRMbtHR": 4839.201077,
            "6rQjE7ve9vmZw2L988mRCgWUJAeBGKLJHjq1oeFbf7Fb": 24.317978,
            "7jMC3ZYQtRQycDwSTVKxyXhvpoU5C1T4ENJoYNjWLJ6T": 0.0,
            "8fEdArAuMR3b44WQK1UL1fDLB3kDK2N9whhDRP4sWP5v": -4863.519055,
            "9BnkuYqwYdrp7A8kV8V3uPRb21Kjihc7C8eg6jmMz1dm": 12.5874,
            "AqWzsrvrTumzGNgLadaiu5Bz46xE4q3CZApQRUqsbbu9": 0.012599,
            "DmmSN7NH3FpKSkfNuE2MbbWPoW1uVrFdJDVtrCeuo5Wi": -12.884202,
            "GjKZHWYCikFFMLUozYLzCnR5kJp61LqQkLPEtv5aJB4k": 0.0,
        }
    )


def _token_totals(txs, signature, mode):
    """total_token_changes per mint via the exploded view (A4)."""
    mode_expr = {
        "ALL": lambda c: c,
        "ABS": lambda c: F.abs(c),
        "IN": lambda c: F.when(c > 0, c).otherwise(F.lit(0)),
        "OUT": lambda c: F.when(c < 0, c).otherwise(F.lit(0)),
    }[mode]
    rows = (
        _tx(txs, signature)
        .select(F.explode("token_changes").alias("c"))
        .groupBy("c.mint")
        .agg(
            F.sum(mode_expr(F.col("c.change"))).alias("v"),
            F.first("c.scale").alias("scale"),
        )
        .collect()
    )
    return {r.mint: float(r.v) / 10**r.scale for r in rows}


def test_total_token_changes_modes(txs_110130000):
    usdc = "EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v"
    other = "EWS2ATMt5fQk89NWLJYNRmGaNoji8MhFZkUB4DiWCCcz"
    assert _token_totals(txs_110130000, TOKEN_TX, "ALL") == {usdc: 0.0, other: 0.0}
    assert _token_totals(txs_110130000, TOKEN_TX, "ABS") == pytest.approx(
        {usdc: 25.768404, other: 9727.03811}
    )
    assert _token_totals(txs_110130000, TOKEN_TX, "OUT") == pytest.approx(
        {usdc: -12.884202, other: -4863.519055}
    )
    assert _token_totals(txs_110130000, TOKEN_TX, "IN") == pytest.approx(
        {usdc: 12.884202, other: 4863.519055}
    )


def test_mints(txs_110130000):
    row = _tx(txs_110130000, TOKEN_TX).select("mints").first()
    assert set(row.mints) == {
        "EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v",
        "EWS2ATMt5fQk89NWLJYNRmGaNoji8MhFZkUB4DiWCCcz",
    }


def _account_types(txs, signature):
    row = txs.filter(F.col("signature") == signature).select(
        "account_types", "programs", "token_pubkeys"
    ).first()
    sysvar = {a.pubkey for a in row.account_types if a.is_sysvar}
    coin = {
        a.pubkey
        for a in row.account_types
        if not (a.is_sysvar or a.is_program or a.is_token)
    }
    return {
        "SYSVAR": sysvar,
        "PROGRAM": set(row.programs),
        "TOKEN": set(row.token_pubkeys),
        "COIN": coin,
    }


def test_account_types_interesting(txs_110130000):
    got = _account_types(txs_110130000, INTERESTING_TX)
    assert got == {
        "SYSVAR": {
            "SysvarC1ock11111111111111111111111111111111",
            "SysvarRent111111111111111111111111111111111",
        },
        "PROGRAM": {
            "11111111111111111111111111111111",
            "ATokenGPvbdGVxr1b2hvZbsiqW5xWH25efTNsLJA8knL",
            "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA",
            "cndyAnrLdpjq1Ssp1z8xxDsB8dxe7u4HL5Nxi2K5WXZ",
            "metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s",
        },
        "TOKEN": {"5KFsC5mLg6d2MbJgCs4k2qJVampgPoZFeuSwsUjSN2gJ"},
        "COIN": {
            "4QuHa8NuHCFvx2XgYG5F5LyG8CpaHXXaDbn3ouv9khxh",
            "6DLUecp4G13R4BCANcYZm3W3A55vm8ith7VscMAr8wV3",
            "6vV7x9Gzrkd7HGds9JyQ3NuMNao3aVBJtyL1aJLM5CKY",
            "7WK1nq1iCw6W2Da5PM5dihn8iCEvjBC3QAzEHKYFGfNY",
            "7zAhomM86b2LCtRniiSUor1qEYSH2LWUBB4WJXCzeEts",
            "E2HeNtruwL6bcd6XSqKGk5ucw43jrNsThFHoSmTNeSbi",
        },
    }
    # completeness: every account classified (type sets overlap-free here)
    n_accounts = (
        txs_110130000.filter(F.col("signature") == INTERESTING_TX)
        .select(F.size("accounts"))
        .first()[0]
    )
    assert sum(len(v) for v in got.values()) == n_accounts


def test_account_types_token_tx(txs_110130000):
    got = _account_types(txs_110130000, TOKEN_TX)
    assert got["SYSVAR"] == set()
    assert got["PROGRAM"] == {
        "675kPX9MHTjS2zt1qfr1NYHuzeLXfQM9H24wFSUt1Mp8",
        "CTMAxxk34HjKWxQ3QLZK1HpaLXmBveao3ESePXbiyfzh",
        "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA",
    }
    assert len(got["TOKEN"]) == 9
    assert len(got["COIN"]) == 15
