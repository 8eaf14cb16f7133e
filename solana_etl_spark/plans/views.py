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


# --------------------------------------------------------------------------
# Expression texts (r9): every derived column is ONE SQL string handed to the
# JVM parser in a single py4j call. The previous Column-API construction made
# ~4,400 py4j round trips per transactions_view+transactions_task build
# (~2 s of DRIVER time per query build / per streaming micro-batch, measured
# with cProfile: 2.6 s in socket recv for solana_e2e); the SQL strings build
# the identical expression trees JVM-side (~0.2 s). Row-level equality of
# every task output over the reference fixture blocks AND the 240-block
# corpus was asserted against the old construction before the swap, plus the
# registry oracle hashes. The trees keep the r9 one-element-HOF binding
# shapes (element_at(transform(array(<inv>), v -> <body>), 1)) — HOF lambdas
# are interpreted, so loop-invariant inputs must be bound once per row.
# --------------------------------------------------------------------------

_ACCOUNTS_FROM_STRINGS = (
    "transform(t.transaction.message.accountKeys, k -> named_struct("
    "'pubkey', k, 'signer', CAST(NULL AS BOOLEAN), 'writable', CAST(NULL AS BOOLEAN)))"
)

# J1: positional balance zip (scale 9) — reference Transaction.py:84-93
_BALANCE_CHANGES = """
transform(accounts, (a, i) -> named_struct(
  'account_index', CAST(i AS INT),
  'pubkey', a.pubkey,
  'pre', element_at(pre_balances, i + 1),
  'post', element_at(post_balances, i + 1),
  'change', element_at(post_balances, i + 1) - element_at(pre_balances, i + 1)))
"""

# J2: token pre/post keyed by accountIndex (map semantics = reference dict,
# LAST_WIN dedup policy set in session.py)
_PRE_MAP = (
    "map_from_entries(transform(pre_token_balances, b -> struct(b.accountIndex, b)))"
)
_POST_MAP = (
    "map_from_entries(transform(post_token_balances, b -> struct(b.accountIndex, b)))"
)

# J2: full-outer of pre/post on accountIndex; missing side → 0;
# mint/decimals take the post side when present (the reference's
# last-assigned `balance` variable, Transaction.py:106-143). Amounts are
# u64 decimal-strings: DECIMAL(20,0) holds the full u64 range (int64 would
# overflow); the delta spans ±2^64 so its type is DECIMAL(21,0).
_TOKEN_CHANGES = """
transform(
  array_union(
    transform(pre_token_balances, b -> b.accountIndex),
    transform(post_token_balances, b -> b.accountIndex)),
  idx -> named_struct(
    'account_index', idx,
    'pubkey', element_at(accounts, idx + 1).pubkey,
    'mint', coalesce(element_at(_post_map, idx).mint, element_at(_pre_map, idx).mint),
    'pre', coalesce(CAST(element_at(_pre_map, idx).uiTokenAmount.amount AS DECIMAL(20,0)),
                    CAST(0 AS DECIMAL(20,0))),
    'post', coalesce(CAST(element_at(_post_map, idx).uiTokenAmount.amount AS DECIMAL(20,0)),
                     CAST(0 AS DECIMAL(20,0))),
    'change', coalesce(CAST(element_at(_post_map, idx).uiTokenAmount.amount AS DECIMAL(20,0)),
                       CAST(0 AS DECIMAL(20,0)))
            - coalesce(CAST(element_at(_pre_map, idx).uiTokenAmount.amount AS DECIMAL(20,0)),
                       CAST(0 AS DECIMAL(20,0))),
    'scale', CAST(coalesce(element_at(_post_map, idx).uiTokenAmount.decimals,
                           element_at(_pre_map, idx).uiTokenAmount.decimals) AS INT)))
"""


def _instructions_flat_sql() -> str:
    # J3 + T1/T2: flatten outer+inner instructions, preorder gen_ids i / i.j
    # (reference Instruction.py:253-258,282-288,65-76). The inner-instruction
    # map is bound ONCE per row by the one-element transform: a plain
    # projection column would be inlined back into the (interpreted) lambda
    # by CollapseProject and rebuilt for EVERY outer instruction.
    empty = f"CAST(array() AS array<{INSTRUCTION_TYPE.simpleString()}>)"
    return f"""
element_at(transform(
  array(map_from_entries(transform(inner_instructions,
                                   x -> struct(x.index, x.instructions)))),
  m -> flatten(transform(outer_instructions, (ins, i) -> concat(
    array(named_struct(
      'gen_id', CAST(i AS STRING), 'parent_id', CAST(NULL AS STRING),
      'outer_pos', CAST(i AS INT), 'inner_pos', CAST(NULL AS INT),
      'program', ins.program, 'program_id', ins.programId,
      'parsed', ins.parsed, 'accounts', ins.accounts, 'data', ins.data)),
    transform(coalesce(element_at(m, CAST(i AS INT)), {empty}),
              (inr, j) -> named_struct(
      'gen_id', concat_ws('.', CAST(i AS STRING), CAST(j AS STRING)),
      'parent_id', CAST(i AS STRING),
      'outer_pos', CAST(i AS INT), 'inner_pos', CAST(j AS INT),
      'program', inr.program, 'program_id', inr.programId,
      'parsed', inr.parsed, 'accounts', inr.accounts, 'data', inr.data))))))
, 1)
"""


# per-tx scalars / sets; aggregate() = SUM over an array column without
# exploding (keeps the row intact)
_TX_SCALARS = {
    "num_accounts": "size(accounts)",
    "net_balance_change": (
        "aggregate(balance_changes, CAST(0 AS BIGINT),"
        " (acc, x) -> acc + coalesce(x.change, 0))"
    ),
    "lamports_in": (
        "aggregate(balance_changes, CAST(0 AS BIGINT), (acc, x) -> acc +"
        " coalesce(CASE WHEN x.change > 0 THEN x.change ELSE 0 END, 0))"
    ),
    "lamports_out": (
        "aggregate(balance_changes, CAST(0 AS BIGINT), (acc, x) -> acc +"
        " coalesce(CASE WHEN x.change < 0 THEN x.change ELSE 0 END, 0))"
    ),
    "num_instructions": "size(instructions)",
    "programs": "array_distinct(transform(instructions, x -> x.program_id))",
    # is_vote checks OUTER instructions only (has_instruction_of iterates
    # the outer list, not descendants) — Transaction.py:181-187
    "is_vote": "exists(outer_instructions, x -> x.program = 'vote')",
    "token_pubkeys": "array_distinct(transform(token_changes, x -> x.pubkey))",
    "mints": "array_distinct(transform(token_changes, x -> x.mint))",
}

# account classification: SYSVAR test first, PROGRAM = recursive program set,
# TOKEN = token-balance accounts, COIN = the rest — Transaction.py:162-179
_ACCOUNT_TYPES = """
transform(accounts, a -> named_struct(
  'pubkey', a.pubkey,
  'is_sysvar', startswith(lower(a.pubkey), 'sysvar'),
  'is_program', array_contains(programs, a.pubkey),
  'is_token', array_contains(token_pubkeys, a.pubkey)))
"""

# per-row validity (reference wraps EVERY row build in try/except —
# src/load/TransformTask.py:24-50; a malformed tx becomes an error row,
# never a null-poisoned output row). Each branch mirrors the exception the
# reference would raise while building the row.
_TX_ERROR = """
CASE
  WHEN signature IS NULL THEN 'transaction has no signatures'
  WHEN fee IS NULL THEN 'transaction has no meta fee'
  WHEN accounts IS NULL OR exists(accounts, a -> a.pubkey IS NULL)
    THEN 'transaction has malformed account keys'
END
"""


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

    accounts_sql = (
        _ACCOUNTS_FROM_STRINGS
        if keys_are_strings
        else "t.transaction.message.accountKeys"
    )
    txs = txs.selectExpr(
        "path",
        "block_time",
        "blockhash",
        "element_at(t.transaction.signatures, 1) AS signature",
        "t.transaction.signatures AS signatures",
        "t.meta.fee AS fee",
        "t.meta.err AS err",
        "t.meta.err IS NULL AS is_successful",
        f"{accounts_sql} AS accounts",
        "t.meta.preBalances AS pre_balances",
        "t.meta.postBalances AS post_balances",
        "t.meta.preTokenBalances AS pre_token_balances",
        "t.meta.postTokenBalances AS post_token_balances",
        "t.meta.innerInstructions AS inner_instructions",
        "t.transaction.message.instructions AS outer_instructions",
    )

    txs = (
        txs.withColumn("_pre_map", F.expr(_PRE_MAP))
        .withColumn("_post_map", F.expr(_POST_MAP))
        .withColumn("balance_changes", F.expr(_BALANCE_CHANGES))
        .withColumn("token_changes", F.expr(_TOKEN_CHANGES))
        .withColumn("instructions", F.expr(_instructions_flat_sql()))
        .drop("_pre_map", "_post_map")
    )

    for name, sql in _TX_SCALARS.items():
        txs = txs.withColumn(name, F.expr(sql))
    txs = (
        txs.withColumn("account_types", F.expr(_ACCOUNT_TYPES))
        # only_fee / more_than_fee (reference src/transform/Transactions.py:63-71)
        .withColumn("is_only_fee", F.expr("net_balance_change = -fee"))
        .withColumn("tx_error", F.expr(_TX_ERROR))
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


# per-account (mint, scale) lookup from the tx's token balance changes
_TOKEN_INFO = """
map_from_entries(transform(token_changes,
  c -> struct(c.pubkey, named_struct('mint', c.mint, 'scale', c.scale))))
"""


def _acct_sql(path: str) -> str:
    """info value resolved as an account key (F12 membership test)."""
    v = f"get_json_object(i.parsed, '$.info.{path}')"
    return f"CASE WHEN array_contains(_keys, {v}) THEN {v} END"


_IS_COIN = "i.program = 'system'"

# Ordered withColumn chain: later columns reference earlier ones by name.
# amounts are u64 decimal-strings: parse through decimal(20,0) (full u64
# range) and only then narrow to the reference's declared int64. A value
# that parses but exceeds int64 must NOT silently become NULL in the good
# output (the reference raises and routes to errors). The error CASE: J4
# failure = token transfer whose source AND destination have no token
# balance change (reference Transfer.py:55), or an info account arg that is
# not a known account key (KeyError in reference Transfer.py:29-30,44-45,
# 57-61); a missing lamports/amount key (Transfer.py:29,69) → error row;
# non-numeric (decimal cast nulls) OR beyond int64 (non-ANSI decimal→long
# WRAPS, so detect via decimal != narrowed value) → error row.
_TRANSFER_COLS = [
    ("source", _acct_sql("source")),
    ("destination", _acct_sql("destination")),
    ("transfer_type", f"CASE WHEN {_IS_COIN} THEN 'coin' ELSE 'token' END"),
    (
        "mint",
        f"CASE WHEN {_IS_COIN} THEN 'sol' ELSE"
        " coalesce(element_at(_token_info, source).mint,"
        " element_at(_token_info, destination).mint) END",
    ),
    (
        "_value_raw",
        f"CASE WHEN {_IS_COIN} THEN get_json_object(i.parsed, '$.info.lamports')"
        " ELSE get_json_object(i.parsed, '$.info.amount') END",
    ),
    ("_value_dec", "CAST(_value_raw AS DECIMAL(20,0))"),
    ("value", "CAST(_value_dec AS BIGINT)"),
    (
        "scale",
        f"CASE WHEN {_IS_COIN} THEN {LAMPORT_SCALE} ELSE"
        " coalesce(element_at(_token_info, source).scale,"
        " element_at(_token_info, destination).scale) END",
    ),
    (
        "authority",
        f"CASE WHEN NOT ({_IS_COIN}) THEN"
        f" coalesce({_acct_sql('authority')}, {_acct_sql('multisigAuthority')}) END",
    ),
    (
        "multisig",
        f"CASE WHEN NOT ({_IS_COIN}) THEN"
        f" (({_acct_sql('authority')}) IS NULL"
        f" AND ({_acct_sql('multisigAuthority')}) IS NOT NULL) END",
    ),
    (
        "error",
        f"""CASE
          WHEN source IS NULL OR destination IS NULL
            THEN 'info account not in transaction accounts'
          WHEN _value_raw IS NULL THEN 'transfer amount missing'
          WHEN _value_raw IS NOT NULL
               AND (_value_dec IS NULL OR NOT (_value_dec = value))
            THEN 'transfer amount not int64-representable'
          WHEN NOT ({_IS_COIN}) AND mint IS NULL
            THEN 'no token balance change for source or destination'
          WHEN NOT ({_IS_COIN}) AND authority IS NULL
            THEN 'no authority or multisigAuthority account'
        END""",
    ),
]


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
    base = (
        txs.filter("is_successful")
        .withColumn("_token_info", F.expr(_TOKEN_INFO))
        .select(
            "path",
            "block_time",
            "blockhash",
            "signature",
            "_token_info",
            F.expr("transform(accounts, a -> a.pubkey)").alias("_keys"),
            F.explode("instructions").alias("i"),
        )
        .withColumn("_type", F.expr("get_json_object(i.parsed, '$.type')"))
        .filter("_type = 'transfer' AND i.program IN ('system', 'spl-token')")
    )

    out = base
    for name, sql in _TRANSFER_COLS:
        out = out.withColumn(name, F.expr(sql))

    return out.selectExpr(
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
        "i.gen_id AS gen_id",
        "error",
    )
