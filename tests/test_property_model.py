"""Property-based reference-model equivalence (hypothesis).

An independent pure-Python model of the reference's per-transaction
semantics (balance zip J1, token full-outer J2 with post-precedence,
balance modes M1, only-fee flag F5/F6) is compared against the Spark view
on randomized transactions — including u64-boundary token amounts, token
accounts only in pre (closed) or only in post (created), and duplicate
accountIndex entries (dict last-wins).
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from solana_etl_spark.schemas import block_schema
from solana_etl_spark.plans.views import transactions_view

KEYS = [f"K{i}" for i in range(8)]
MINTS = ["MINT_A", "MINT_B"]


@st.composite
def transaction(draw):
    n_accounts = draw(st.integers(2, len(KEYS)))
    accounts = KEYS[:n_accounts]
    pre = [draw(st.integers(0, 10**12)) for _ in accounts]
    post = [draw(st.integers(0, 10**12)) for _ in accounts]
    fee = draw(st.integers(0, 10**7))

    def token_balances():
        entries = []
        for idx in draw(
            st.lists(st.integers(0, n_accounts - 1), max_size=4)
        ):
            entries.append(
                {
                    "accountIndex": idx,
                    "mint": draw(st.sampled_from(MINTS)),
                    "uiTokenAmount": {
                        # u64 decimal-strings, incl. beyond int64
                        "amount": str(draw(st.integers(0, 2**64 - 1))),
                        "decimals": draw(st.integers(0, 9)),
                        "uiAmountString": "0",
                    },
                }
            )
        return entries

    return {
        "meta": {
            "err": draw(st.sampled_from([None, '{"InstructionError":[0,"Custom"]}'])),
            "fee": fee,
            "preBalances": pre,
            "postBalances": post,
            "preTokenBalances": token_balances(),
            "postTokenBalances": token_balances(),
            "innerInstructions": [],
        },
        "transaction": {
            "signatures": [f"SIG{draw(st.integers(0, 10**9))}"],
            "message": {
                "accountKeys": [
                    {"pubkey": k, "signer": False, "writable": True}
                    for k in accounts
                ],
                "recentBlockhash": "RBH",
                "instructions": [],
            },
        },
    }


def model_token_changes(meta, accounts):
    """Independent reimplementation of reference Transaction.py:106-143."""
    pre = {}
    for b in meta["preTokenBalances"]:
        pre[b["accountIndex"]] = b  # dict assignment: last wins
    post = {}
    for b in meta["postTokenBalances"]:
        post[b["accountIndex"]] = b
    changes = {}
    for idx in pre.keys() | post.keys():
        start = int(pre[idx]["uiTokenAmount"]["amount"]) if idx in pre else 0
        end = int(post[idx]["uiTokenAmount"]["amount"]) if idx in post else 0
        balance = post[idx] if idx in post else pre[idx]  # post-precedence
        changes[idx] = {
            "pubkey": accounts[idx],
            "mint": balance["mint"],
            "pre": start,
            "post": end,
            "change": end - start,
            "scale": balance["uiTokenAmount"]["decimals"],
        }
    return changes


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(txs=st.lists(transaction(), min_size=1, max_size=6))
def test_view_matches_model(spark, txs):
    # the comparison below keys rows by signature, so make them unique per
    # tx (hypothesis shrinks the drawn signature integers to 0, colliding
    # every tx onto 'SIG0' — the engine itself never dedups by signature)
    for i, tx in enumerate(txs):
        tx["transaction"]["signatures"] = [f"SIG{i}"]
    block = {
        "path": "/synth/1.json",
        "missing": False,
        "_corrupt_record": None,
        "result": {
            "blockHeight": 1,
            "blockTime": 1700000000,
            "blockhash": "H",
            "parentSlot": 0,
            "previousBlockhash": "H0",
            "transactions": txs,
        },
    }
    import copy

    schema = (
        "path string, missing boolean, _corrupt_record string, result "
        + block_schema()["result"].dataType.simpleString()
    )
    blocks_df = spark.createDataFrame([copy.deepcopy(block)], schema=schema)
    rows = {
        r.signature: r
        for r in transactions_view(blocks_df).collect()
    }

    for tx in txs:
        sig = tx["transaction"]["signatures"][0]
        got = rows[sig]
        meta = tx["meta"]
        accounts = [a["pubkey"] for a in tx["transaction"]["message"]["accountKeys"]]

        # J1 / M1 modes
        diffs = [p - q for p, q in zip(meta["postBalances"], meta["preBalances"])]
        assert got.net_balance_change == sum(diffs)
        assert got.lamports_in == sum(d for d in diffs if d > 0)
        assert got.lamports_out == sum(d for d in diffs if d < 0)
        assert got.is_only_fee == (sum(diffs) == -meta["fee"])
        assert got.is_successful == (meta["err"] is None)

        # J2 full-outer with post-precedence
        want = model_token_changes(meta, accounts)
        got_changes = {c.account_index: c for c in got.token_changes}
        assert set(got_changes) == set(want)
        for idx, w in want.items():
            g = got_changes[idx]
            assert g.pubkey == w["pubkey"]
            assert g.mint == w["mint"]
            assert int(g.pre) == w["pre"]
            assert int(g.post) == w["post"]
            assert int(g.change) == w["change"]
            assert g.scale == w["scale"]
        assert set(got.mints) == {w["mint"] for w in want.values()}
