"""Explicit StructTypes for raw Solana ``getBlock`` JSON and the three output
tables.

Never inferred: the raw document has two polymorphic spots that inference
would get wrong (reference tolerates both at
src/transform/Instruction.py:30-40 and src/transform/Account.py:20-26):

* ``parsed`` on an instruction is a struct for most programs but a bare
  base64 string for e.g. spl-memo — we ingest it as ``StringType`` (Spark's
  JSON parser captures the raw token text for any shape) and re-parse with
  ``get_json_object`` / ``from_json`` downstream.
* ``meta.err`` is null or an arbitrary object — ingested as raw-JSON string;
  success ⟺ NULL (reference src/transform/Transaction.py:42-44).
* ``accountKeys`` is an array of ``{pubkey, signer, writable}`` structs in
  ``jsonParsed`` encoding but can be an array of plain strings in older
  extracts — ``block_schema(account_keys_as_strings=True)`` selects the
  alternate shape.

Fields the transforms never consume (``logMessages``, ``rewards``,
``status``) are deliberately absent: for the JSON datasource, omitting a
field from the read schema IS column pruning — the parser skips those
subtrees entirely.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# Raw block document (input)
# --------------------------------------------------------------------------

# One instruction node, outer or inner (reference src/transform/Instruction.py:101-184):
#   parsed-struct   {program, programId, parsed:{type, info}}
#   parsed-scalar   {program, programId, parsed:"<base64>"}   (spl-memo)
#   partially-parsed{programId, accounts:[pubkey], data:"<base58>"}
# One nullable-field union covers all three; `parsed` held as raw JSON text.
INSTRUCTION_TYPE = StructType(
    [
        StructField("program", StringType()),
        StructField("programId", StringType()),
        StructField("parsed", StringType()),  # raw JSON: object OR scalar
        StructField("accounts", ArrayType(StringType())),
        StructField("data", StringType()),
        StructField("stackHeight", IntegerType()),
    ]
)

TOKEN_BALANCE_TYPE = StructType(
    [
        StructField("accountIndex", IntegerType()),
        StructField("mint", StringType()),
        StructField("owner", StringType()),
        StructField("programId", StringType()),
        StructField(
            "uiTokenAmount",
            StructType(
                [
                    # u64 decimal-string on chain (reference parses with int():
                    # src/transform/Transaction.py:133,137)
                    StructField("amount", StringType()),
                    StructField("decimals", IntegerType()),
                    StructField("uiAmountString", StringType()),
                ]
            ),
        ),
    ]
)

ACCOUNT_KEY_STRUCT = StructType(
    [
        StructField("pubkey", StringType()),
        StructField("signer", BooleanType()),
        StructField("writable", BooleanType()),
    ]
)


def _message_type(account_keys_as_strings: bool) -> StructType:
    keys_type = (
        ArrayType(StringType())
        if account_keys_as_strings
        else ArrayType(ACCOUNT_KEY_STRUCT)
    )
    return StructType(
        [
            StructField("accountKeys", keys_type),
            StructField("recentBlockhash", StringType()),
            StructField("instructions", ArrayType(INSTRUCTION_TYPE)),
        ]
    )


def _transaction_type(account_keys_as_strings: bool) -> StructType:
    return StructType(
        [
            StructField(
                "meta",
                StructType(
                    [
                        StructField("err", StringType()),  # raw JSON or null
                        StructField("fee", LongType()),
                        StructField("preBalances", ArrayType(LongType())),
                        StructField("postBalances", ArrayType(LongType())),
                        StructField("preTokenBalances", ArrayType(TOKEN_BALANCE_TYPE)),
                        StructField("postTokenBalances", ArrayType(TOKEN_BALANCE_TYPE)),
                        StructField(
                            "innerInstructions",
                            ArrayType(
                                StructType(
                                    [
                                        # position of the parent outer instruction
                                        StructField("index", IntegerType()),
                                        StructField(
                                            "instructions", ArrayType(INSTRUCTION_TYPE)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                ),
            ),
            StructField(
                "transaction",
                StructType(
                    [
                        StructField("signatures", ArrayType(StringType())),
                        StructField("message", _message_type(account_keys_as_strings)),
                    ]
                ),
            ),
        ]
    )


def block_schema(account_keys_as_strings: bool = False) -> StructType:
    """Envelope schema for one ``getBlock`` JSON document.

    A document without ``result`` is a missing block
    (reference src/transform/Block.py:36-44).
    """
    return StructType(
        [
            StructField("jsonrpc", StringType()),
            StructField("id", LongType()),
            StructField(
                "result",
                StructType(
                    [
                        StructField("blockHeight", LongType()),
                        StructField("blockTime", LongType()),
                        StructField("blockhash", StringType()),
                        StructField("parentSlot", LongType()),
                        StructField("previousBlockhash", StringType()),
                        StructField(
                            "transactions",
                            ArrayType(_transaction_type(account_keys_as_strings)),
                        ),
                    ]
                ),
            ),
            StructField("_corrupt_record", StringType()),
        ]
    )


BLOCK_SCHEMA = block_schema()

# --------------------------------------------------------------------------
# Output tables (reference src/load/TransformTask.py:114-176, verbatim names)
# --------------------------------------------------------------------------

TRANSACTIONS_OUT_SCHEMA = StructType(
    [
        StructField("time", LongType()),
        StructField("signature", StringType()),
        StructField("fee", LongType()),
        StructField("isSuccessful", BooleanType()),
        # int8 in the reference meta; counts can exceed 127 in pathological
        # blocks — we keep ByteType for declared parity (SURVEY §7.5).
        StructField("numInstructions", ByteType()),
        StructField("programs", StringType()),  # JSON array of pubkeys
        StructField("numAccounts", ByteType()),
        StructField("accountsByType", StringType()),  # JSON map type -> [pubkey]
        StructField("lamportsOut", LongType()),
        StructField("lamportsIn", LongType()),
        StructField("numMints", ByteType()),
        StructField("mints", StringType()),  # JSON array
        StructField("tokensOut", StringType()),  # JSON map mint -> float
        StructField("tokensIn", StringType()),  # JSON map mint -> float
        StructField("blockhash", StringType()),
        StructField("path", StringType()),
    ]
)

TRANSFERS_OUT_SCHEMA = StructType(
    [
        StructField("time", LongType()),
        StructField("source", StringType()),
        StructField("destination", StringType()),
        StructField("mint", StringType()),  # 'sol' for coin transfers
        StructField("value", LongType()),  # unscaled fixed-point
        StructField("scale", ByteType()),
        StructField("transaction", StringType()),
        StructField("blockhash", StringType()),
        StructField("path", StringType()),
    ]
)

_BLOCKS_PARTITION_COLS = (
    "Votes",
    "TransactionsMoreThanFee",
    "TransactionsOnlyFee",
    "Fees",
    "BalanceChange",
    "ProgramAccounts",
    "CoinAccounts",
    "TokenAccounts",
)

BLOCKS_OUT_SCHEMA = StructType(
    [
        StructField("time", LongType()),
        StructField("hash", StringType()),
        StructField("path", StringType()),
        StructField("numTransactions", LongType()),
        StructField("numSuccessful", LongType()),
    ]
    + [StructField(f"successful{name}", LongType()) for name in _BLOCKS_PARTITION_COLS]
    + [StructField("numErrors", LongType())]
    + [StructField(f"error{name}", LongType()) for name in _BLOCKS_PARTITION_COLS]
)

ERRORS_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("block", StringType()),
        StructField("message", StringType()),
    ]
)
