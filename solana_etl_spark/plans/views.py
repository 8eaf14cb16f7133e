"""Normalized views over raw block documents.

Design principle (the scale story): every computation the reference performs
is *intra-transaction* — balance zips, the token pre/post full-outer join,
inner↔outer instruction assembly, account classification. We therefore
express all of it as **array expressions on a single row** (``transform`` /
``filter`` / ``aggregate`` / ``map_from_entries``), so the entire transform
stage is shuffle-free and whole-stage-codegen'd: a 100 TB corpus maps through
these views with no exchange until an explicit cross-block rollup asks for
one.

Semantics are parity-checked against the reference (citations per view);
golden tests in tests/ assert the reference's own fixture values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from solana_etl_spark.schemas import INSTRUCTION_TYPE

# program/type constants (reference src/transform/ProgramInstruction.py:7-34)
SYSTEM_PROGRAM = "system"
SPL_TOKEN_PROGRAM = "spl-token"
TRANSFER_TYPE = "transfer"
VOTE_PROGRAM = "vote"
LAMPORT_SCALE = 9  # reference src/transform/NumberWithScale.py:17-19


def _sum_long(arr: Column, value: Column) -> Column:
    """SUM over an array column without exploding (keeps the row intact)."""
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.coalesce(value(x), F.lit(0))
    )


def transactions_view(blocks_raw: DataFrame) -> DataFrame:
    """One row per transaction, with every per-tx derived quantity as a
    column. All expressions are intra-row; no shuffle.

    Parity:
    * identity = first signature — reference src/transform/Transaction.py:30
    * success ⟺ ``meta.err`` null — Transaction.py:42-44
    * balance change = positional zip of accountKeys × pre/postBalances at
      lamport scale 9 — Transaction.py:84-93
    * token changes = full-outer of pre/post token balances on accountIndex,
      missing side → 0, **mint/decimals take the post side when present**
      (the reference's last-assigned ``balance`` variable) —
      Transaction.py:106-143
    * flattened instruction tree with hierarchical gen_ids ``i`` / ``i.j``
      preorder — Instruction.py:253-258,282-288,65-76
    * ``is_vote`` checks **outer** instructions only (``has_instruction_of``
      iterates the outer list, not descendants) — Transaction.py:181-187
    * account classification: SYSVAR test first, PROGRAM = recursive program
      set, TOKEN = token-balance accounts, COIN = the rest —
      Transaction.py:162-179
    """
    keys_are_strings = _account_keys_are_strings(blocks_raw)

    # Two-step select: block scalars become top-level columns in the Generate
    # node's *child* projection, so no operator above the explode ever
    # references the giant `result` struct. (With a single fused select,
    # a filter pushed between Project and Generate defeats Catalyst's
    # GeneratorNestedColumnAliasing and the exploded rows drag the whole
    # multi-MB block struct along — catastrophic for cache/shuffle copies.)
    pre = blocks_raw.filter(~F.col("missing")).select(
        "path",
        F.col("result.blockTime").alias("block_time"),
        F.col("result.blockhash").alias("blockhash"),
        F.col("result.transactions").alias("_txs"),
    )
    txs = pre.select(
        "path", "block_time", "blockhash", F.explode("_txs").alias("t")
    )

    raw_keys = F.col("t.transaction.message.accountKeys")
    if keys_are_strings:
        accounts = F.transform(
            raw_keys,
            lambda k: F.struct(
                k.alias("pubkey"),
                F.lit(None).cast("boolean").alias("signer"),
                F.lit(None).cast("boolean").alias("writable"),
            ),
        )
    else:
        accounts = raw_keys

    txs = txs.select(
        "path",
        "block_time",
        "blockhash",
        F.element_at("t.transaction.signatures", 1).alias("signature"),
        F.col("t.transaction.signatures").alias("signatures"),
        F.col("t.meta.fee").alias("fee"),
        F.col("t.meta.err").alias("err"),
        F.col("t.meta.err").isNull().alias("is_successful"),
        accounts.alias("accounts"),
        F.col("t.meta.preBalances").alias("pre_balances"),
        F.col("t.meta.postBalances").alias("post_balances"),
        F.col("t.meta.preTokenBalances").alias("pre_token_balances"),
        F.col("t.meta.postTokenBalances").alias("post_token_balances"),
        F.col("t.meta.innerInstructions").alias("inner_instructions"),
        F.col("t.transaction.message.instructions").alias("outer_instructions"),
    )

    # -- J1: positional balance zip (scale 9) ------------------------------
    balance_changes = F.transform(
        F.col("accounts"),
        lambda a, i: F.struct(
            i.cast("int").alias("account_index"),
            a["pubkey"].alias("pubkey"),
            F.element_at(F.col("pre_balances"), i + 1).alias("pre"),
            F.element_at(F.col("post_balances"), i + 1).alias("post"),
            (
                F.element_at(F.col("post_balances"), i + 1)
                - F.element_at(F.col("pre_balances"), i + 1)
            ).alias("change"),
        ),
    )

    # -- J2: token pre/post full-outer on accountIndex, post-precedence ----
    pre_map = F.map_from_entries(
        F.transform(
            F.col("pre_token_balances"), lambda b: F.struct(b["accountIndex"], b)
        )
    )
    post_map = F.map_from_entries(
        F.transform(
            F.col("post_token_balances"), lambda b: F.struct(b["accountIndex"], b)
        )
    )
    indices = F.array_union(
        F.transform(F.col("pre_token_balances"), lambda b: b["accountIndex"]),
        F.transform(F.col("post_token_balances"), lambda b: b["accountIndex"]),
    )

    def _token_change(idx: Column) -> Column:
        pre_b = F.element_at(F.col("_pre_map"), idx)
        post_b = F.element_at(F.col("_post_map"), idx)
        # amounts are u64 decimal-strings; decimal(20,0) holds the full u64
        # range (int64 would overflow — the reference's Python ints are
        # unbounded, SURVEY §7.5). Deltas are cast back to long.
        pre_amt = F.coalesce(
            pre_b["uiTokenAmount"]["amount"].cast("decimal(20,0)"),
            F.lit(0).cast("decimal(20,0)"),
        )
        post_amt = F.coalesce(
            post_b["uiTokenAmount"]["amount"].cast("decimal(20,0)"),
            F.lit(0).cast("decimal(20,0)"),
        )
        return F.struct(
            idx.alias("account_index"),
            F.element_at(F.col("accounts"), idx + 1)["pubkey"].alias("pubkey"),
            # post-precedence: reference's `balance` var is last assigned from
            # post when present (Transaction.py:131-141)
            F.coalesce(post_b["mint"], pre_b["mint"]).alias("mint"),
            pre_amt.alias("pre"),
            post_amt.alias("post"),
            # u64 − u64 spans ±2^64: decimal(21,0) keeps it exact (a long
            # would wrap — found by the hypothesis model-equivalence test)
            (post_amt - pre_amt).alias("change"),
            F.coalesce(
                post_b["uiTokenAmount"]["decimals"], pre_b["uiTokenAmount"]["decimals"]
            )
            .cast("int")
            .alias("scale"),
        )

    # -- J3 + T1/T2: flatten outer+inner instructions, preorder gen_ids ----
    inner_map = F.map_from_entries(
        F.transform(
            F.col("inner_instructions"), lambda x: F.struct(x["index"], x["instructions"])
        )
    )

    def _node(ins: Column, gen_id: Column, parent_id: Column, outer_pos: Column, inner_pos: Column) -> Column:
        return F.struct(
            gen_id.alias("gen_id"),
            parent_id.alias("parent_id"),
            outer_pos.cast("int").alias("outer_pos"),
            inner_pos.cast("int").alias("inner_pos"),
            ins["program"].alias("program"),
            ins["programId"].alias("program_id"),
            ins["parsed"].alias("parsed"),
            ins["accounts"].alias("accounts"),
            ins["data"].alias("data"),
        )

    # The inner-instruction map is bound ONCE per row by a one-element
    # transform (r9): a plain `_inner_map` projection column is referenced
    # only once here, so CollapseProject inlines the map_from_entries back
    # into the lambda body — and HOF lambdas are interpreted, so the map
    # would be rebuilt for EVERY outer instruction. The explicit lambda
    # binding is immune to inlining.
    def _flatten_with_map(m: Column) -> Column:
        return F.flatten(
            F.transform(
                F.col("outer_instructions"),
                lambda ins, i: F.concat(
                    F.array(
                        _node(ins, i.cast("string"), F.lit(None).cast("string"), i, F.lit(None))
                    ),
                    F.transform(
                        F.coalesce(
                            F.element_at(m, i.cast("int")),
                            F.array().cast(ArrayType(INSTRUCTION_TYPE)),
                        ),
                        lambda inr, j: _node(
                            inr,
                            F.concat_ws(".", i.cast("string"), j.cast("string")),
                            i.cast("string"),
                            i,
                            j,
                        ),
                    ),
                ),
            )
        )

    instructions_flat = F.element_at(
        F.transform(F.array(inner_map), _flatten_with_map), 1
    )

    txs = (
        txs.withColumn("_pre_map", pre_map)
        .withColumn("_post_map", post_map)
        .withColumn("balance_changes", balance_changes)
        .withColumn("token_changes", F.transform(indices, _token_change))
        .withColumn("instructions", instructions_flat)
        .drop("_pre_map", "_post_map")
    )

    # -- per-tx scalars / sets ---------------------------------------------
    change = lambda x: x["change"]  # noqa: E731
    txs = (
        txs.withColumn("num_accounts", F.size("accounts"))
        .withColumn("net_balance_change", _sum_long(F.col("balance_changes"), change))
        .withColumn(
            "lamports_in",
            _sum_long(
                F.col("balance_changes"),
                lambda x: F.when(x["change"] > 0, x["change"]).otherwise(F.lit(0)),
            ),
        )
        .withColumn(
            "lamports_out",
            _sum_long(
                F.col("balance_changes"),
                lambda x: F.when(x["change"] < 0, x["change"]).otherwise(F.lit(0)),
            ),
        )
        .withColumn("num_instructions", F.size("instructions"))
        .withColumn(
            "programs",
            F.array_distinct(F.transform("instructions", lambda x: x["program_id"])),
        )
        .withColumn(
            "is_vote",
            F.exists("outer_instructions", lambda x: x["program"] == F.lit(VOTE_PROGRAM)),
        )
        .withColumn(
            "token_pubkeys",
            F.array_distinct(F.transform("token_changes", lambda x: x["pubkey"])),
        )
        .withColumn(
            "mints",
            F.array_distinct(F.transform("token_changes", lambda x: x["mint"])),
        )
        .withColumn(
            "account_types",
            F.transform(
                "accounts",
                lambda a: F.struct(
                    a["pubkey"].alias("pubkey"),
                    F.lower(a["pubkey"]).startswith("sysvar").alias("is_sysvar"),
                    F.array_contains(F.col("programs"), a["pubkey"]).alias("is_program"),
                    F.array_contains(F.col("token_pubkeys"), a["pubkey"]).alias(
                        "is_token"
                    ),
                ),
            ),
        )
        # only_fee / more_than_fee (reference src/transform/Transactions.py:63-71)
        .withColumn("is_only_fee", F.col("net_balance_change") == -F.col("fee"))
        # per-row validity (reference wraps EVERY row build in try/except —
        # src/load/TransformTask.py:24-50; a malformed tx becomes an error
        # row, never a null-poisoned output row). Each branch mirrors the
        # exception the reference would raise while building the row.
        .withColumn(
            "tx_error",
            F.when(
                F.col("signature").isNull(),
                F.lit("transaction has no signatures"),
            )
            .when(F.col("fee").isNull(), F.lit("transaction has no meta fee"))
            .when(
                F.col("accounts").isNull() | F.exists("accounts", lambda a: a["pubkey"].isNull()),
                F.lit("transaction has malformed account keys"),
            ),
        )
    )

    return txs.drop(
        "pre_balances",
        "post_balances",
        "pre_token_balances",
        "post_token_balances",
        "inner_instructions",
    )


def _account_keys_are_strings(blocks_raw: DataFrame) -> bool:
    msg = (
        blocks_raw.schema["result"]
        .dataType["transactions"]
        .dataType.elementType["transaction"]
        .dataType["message"]
        .dataType
    )
    keys = msg["accountKeys"].dataType
    return isinstance(keys, ArrayType) and isinstance(keys.elementType, StringType)


# --------------------------------------------------------------------------
# Exploded relational views (FIXTURES.md §2 shapes)
# --------------------------------------------------------------------------


def balance_changes_view(txs: DataFrame) -> DataFrame:
    """``balance_changes(signature, account_index, pubkey, pre, post, change,
    scale=9)`` — one row per (tx, account)."""
    return txs.select(
        "signature", F.explode("balance_changes").alias("c")
    ).select(
        "signature",
        "c.account_index",
        "c.pubkey",
        "c.pre",
        "c.post",
        "c.change",
        F.lit(LAMPORT_SCALE).cast("tinyint").alias("scale"),
    )


def token_balance_changes_view(txs: DataFrame) -> DataFrame:
    """``token_balance_changes(signature, account_index, pubkey, mint, pre,
    post, change, scale)`` — one row per (tx, token account)."""
    return txs.select(
        "signature", F.explode("token_changes").alias("c")
    ).select("signature", "c.*")


def instructions_view(txs: DataFrame) -> DataFrame:
    """``instructions_flat`` — one row per instruction node (outer and inner,
    preorder), with parsed fields split per F12 semantics:

    an ``info`` value is an *account argument* iff it is a string equal to
    one of the transaction's account keys, else a *value argument*
    (reference src/transform/Instruction.py:156-175). ``parsed`` scalars
    (spl-memo) yield ``instruction_type`` NULL and the raw scalar under the
    ``memo`` value key (reference stores it under the ``None`` key, which has
    no map equivalent).
    """
    parsed_struct = F.from_json(
        F.col("i.parsed"), "struct<type:string, info:map<string,string>>"
    )
    exploded = txs.select(
        "signature",
        F.col("accounts"),
        F.explode("instructions").alias("i"),
    ).withColumn("_parsed", parsed_struct)

    info = F.col("_parsed.info")
    is_parsed = F.col("i.parsed").isNotNull()
    is_scalar_parsed = is_parsed & F.col("_parsed").isNull() | (
        is_parsed & F.col("_parsed.type").isNull() & F.col("_parsed.info").isNull()
    )
    key_set = F.transform("accounts", lambda a: a["pubkey"])

    return exploded.select(
        "signature",
        F.col("i.gen_id").alias("gen_id"),
        F.col("i.parent_id").alias("parent_id"),
        F.col("i.outer_pos").alias("outer_pos"),
        F.col("i.inner_pos").alias("inner_pos"),
        F.col("i.program_id").alias("program_id"),
        F.when(is_parsed, F.col("i.program")).alias("program_name"),
        F.col("_parsed.type").alias("instruction_type"),
        F.when(
            info.isNotNull(),
            F.map_filter(info, lambda k, v: F.array_contains(key_set, v)),
        ).alias("info_accounts"),
        F.when(
            is_scalar_parsed,
            F.create_map(F.lit("memo"), F.col("i.parsed")),
        )
        .when(
            info.isNotNull(),
            F.map_filter(info, lambda k, v: ~F.array_contains(key_set, v)),
        )
        .alias("info_values"),
        F.col("i.accounts").alias("accounts"),
        F.col("i.data").alias("data"),
    )


def transfers_view(txs: DataFrame) -> DataFrame:
    """Semantic transfer extraction (X1–X3) + J4/J5 enrichment.

    Parity (reference src/transform/Interactions.py:23-37,
    src/transform/Transfer.py:22-72):
    * source rows: **successful** transactions only
    * flatten-filter: every node (outer or inner) matching
      (system, transfer) → CoinTransfer; (spl-token, transfer) → TokenTransfer
    * coin: value = info.lamports at scale 9, mint literal ``'sol'``
    * token: value = int(info.amount) at the mint's decimals; mint/scale from
      the token-balance-change of the **source** account, else destination,
      else error (reference raises a bare Exception at Transfer.py:55)
    * authority = info.authority else info.multisigAuthority (J5)

    Returns transfer rows with an ``error`` column; callers split rows where
    ``error IS NOT NULL`` into the errors side-channel (§7.4).
    """
    token_info = F.map_from_entries(
        F.transform(
            "token_changes",
            lambda c: F.struct(
                c["pubkey"], F.struct(c["mint"].alias("mint"), c["scale"].alias("scale"))
            ),
        )
    )

    base = (
        txs.filter("is_successful")
        .withColumn("_token_info", token_info)
        .select(
            "path",
            "block_time",
            "blockhash",
            "signature",
            "_token_info",
            F.transform("accounts", lambda a: a["pubkey"]).alias("_keys"),
            F.explode("instructions").alias("i"),
        )
        .withColumn("_type", F.get_json_object("i.parsed", "$.type"))
        .filter(
            (F.col("_type") == TRANSFER_TYPE)
            & F.col("i.program").isin(SYSTEM_PROGRAM, SPL_TOKEN_PROGRAM)
        )
    )

    def acct(path: str) -> Column:
        """info value resolved as an account key (F12 membership test)."""
        v = F.get_json_object("i.parsed", f"$.info.{path}")
        return F.when(F.array_contains(F.col("_keys"), v), v)

    is_coin = F.col("i.program") == SYSTEM_PROGRAM
    source = acct("source")
    destination = acct("destination")
    authority = acct("authority")
    multisig_authority = acct("multisigAuthority")

    src_info = F.element_at(F.col("_token_info"), F.col("source"))
    dst_info = F.element_at(F.col("_token_info"), F.col("destination"))

    out = (
        base.withColumn("source", source)
        .withColumn("destination", destination)
        .withColumn("transfer_type", F.when(is_coin, "coin").otherwise("token"))
        .withColumn(
            "mint",
            F.when(is_coin, F.lit("sol")).otherwise(
                F.coalesce(src_info["mint"], dst_info["mint"])
            ),
        )
        # amounts are u64 decimal-strings: parse through decimal(20,0) (full
        # u64 range) and only then narrow to the reference's declared int64.
        # A value that parses but exceeds int64 must NOT silently become NULL
        # in the good output (the reference raises and routes to errors).
        .withColumn(
            "_value_raw",
            F.when(
                is_coin, F.get_json_object("i.parsed", "$.info.lamports")
            ).otherwise(F.get_json_object("i.parsed", "$.info.amount")),
        )
        .withColumn("_value_dec", F.col("_value_raw").cast("decimal(20,0)"))
        .withColumn("value", F.col("_value_dec").cast("long"))
        .withColumn(
            "scale",
            F.when(is_coin, F.lit(LAMPORT_SCALE)).otherwise(
                F.coalesce(src_info["scale"], dst_info["scale"])
            ),
        )
        .withColumn(
            "authority", F.when(~is_coin, F.coalesce(authority, multisig_authority))
        )
        .withColumn(
            "multisig",
            F.when(~is_coin, authority.isNull() & multisig_authority.isNotNull()),
        )
        .withColumn(
            "error",
            # J4 failure: token transfer whose source AND destination have no
            # token balance change (reference Transfer.py:55) — or an info
            # account arg that is not a known account key (KeyError in
            # reference Transfer.py:29-30,44-45,57-61).
            F.when(
                F.col("source").isNull() | F.col("destination").isNull(),
                F.lit("info account not in transaction accounts"),
            ).when(
                # reference KeyErrors on a missing lamports/amount key
                # (Transfer.py:29,69) → error row, never a null-valued output
                F.col("_value_raw").isNull(),
                F.lit("transfer amount missing"),
            ).when(
                # non-numeric (decimal cast nulls) OR beyond int64 (non-ANSI
                # decimal→long WRAPS, so detect via decimal != narrowed value)
                F.col("_value_raw").isNotNull()
                & (
                    F.col("_value_dec").isNull()
                    | (F.col("_value_dec") != F.col("value"))
                ),
                F.lit("transfer amount not int64-representable"),
            ).when(
                ~is_coin & F.col("mint").isNull(),
                F.lit("no token balance change for source or destination"),
            ).when(
                ~is_coin & F.col("authority").isNull(),
                F.lit("no authority or multisigAuthority account"),
            ),
        )
    )

    return out.select(
        "path",
        "block_time",
        "blockhash",
        "signature",
        "transfer_type",
        "source",
        "destination",
        "mint",
        "value",
        "scale",
        "authority",
        "multisig",
        F.col("i.gen_id").alias("gen_id"),
        "error",
    )
