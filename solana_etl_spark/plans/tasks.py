"""The three reference output tables as DataFrame pipelines, plus the errors
side-channel.

Reference task definitions: src/load/TransformTask.py:19-105 (row builders)
and :114-176 (declared schemas — reproduced in schemas.py). The ``path``
column carries the block-file *basename* (reference src/load/FileOutput.py:74
``Path(json_and_path[1]).name``).

Scale notes:
* ``transactions`` / ``transfers`` are shuffle-free maps over the
  transactions view.
* ``blocks`` is one hash aggregation keyed by block path — partial (map-side)
  aggregation applies to every measure; the distinct-account counts use
  per-tx pre-deduplicated arrays so the exchange carries only small per-tx
  summaries, never raw JSON.
* callers processing many files should ``.persist()`` the transactions view
  before fanning out to the three sinks (the dask reference computes the
  shared bag once for all outputs — src/load/FileOutput.py:167-169; Spark
  re-scans per action unless persisted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.plans.views import transactions_view, transfers_view


def _source(path_col: Column) -> Column:
    return F.element_at(F.split(path_col, "/"), -1)


def _json_int_map(txs: DataFrame, mode_expr) -> Column:
    """Per-mint aggregated token change as a JSON map mint → float.

    Mirrors ``total_token_changes`` (reference src/transform/Transaction.py:
    145-155): group the tx's token changes by mint, sum the mode-projected
    change (all changes of one mint share a scale, so the equal-scale
    invariant of NumberWithScale holds by construction), then scale to float.
    """
    del txs  # documentation-only parameter

    def per_mint(m: Column) -> Column:
        # bind the filtered per-mint change list ONCE (r9): it is used by
        # both the sum and the scale lookup, and HOF lambdas are
        # interpreted, so an unbound reference re-runs the filter per use
        def _entry(cm: Column) -> Column:
            total = F.aggregate(
                cm,
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, c: acc + mode_expr(c["change"]),
            )
            scale = F.element_at(cm, 1)["scale"]
            return F.struct(
                m.alias("key"), (total / F.pow(F.lit(10.0), scale)).alias("value")
            )

        return F.element_at(
            F.transform(
                F.array(F.filter(F.col("token_changes"), lambda c: c["mint"] == m)),
                _entry,
            ),
            1,
        )

    return F.to_json(F.map_from_entries(F.transform(F.col("mints"), per_mint)))


def transactions_task(txs: DataFrame) -> DataFrame:
    """16-column ``transactions`` table (reference block_to_transactions,
    src/load/TransformTask.py:19-52)."""
    out_mode = lambda v: F.when(v < 0, v).otherwise(F.lit(0))  # noqa: E731
    in_mode = lambda v: F.when(v > 0, v).otherwise(F.lit(0))  # noqa: E731

    sysvar_accounts = F.transform(
        F.filter("account_types", lambda a: a["is_sysvar"]), lambda a: a["pubkey"]
    )
    coin_accounts = F.transform(
        F.filter(
            "account_types",
            lambda a: ~a["is_sysvar"] & ~a["is_program"] & ~a["is_token"],
        ),
        lambda a: a["pubkey"],
    )

    return txs.filter(F.col("tx_error").isNull()).select(
        F.col("block_time").alias("time"),
        "signature",
        "fee",
        F.col("is_successful").alias("isSuccessful"),
        F.col("num_instructions").cast("tinyint").alias("numInstructions"),
        F.to_json("programs").alias("programs"),
        F.col("num_accounts").cast("tinyint").alias("numAccounts"),
        F.to_json(
            F.struct(
                sysvar_accounts.alias("SYSVAR"),
                F.col("programs").alias("PROGRAM"),
                F.col("token_pubkeys").alias("TOKEN"),
                coin_accounts.alias("COIN"),
            )
        ).alias("accountsByType"),
        F.col("lamports_out").alias("lamportsOut"),
        F.col("lamports_in").alias("lamportsIn"),
        F.size("mints").cast("tinyint").alias("numMints"),
        F.to_json("mints").alias("mints"),
        _json_int_map(txs, out_mode).alias("tokensOut"),
        _json_int_map(txs, in_mode).alias("tokensIn"),
        "blockhash",
        _source(F.col("path")).alias("path"),
    )


def transaction_errors(txs: DataFrame) -> DataFrame:
    """Per-row failures inside otherwise-good blocks → error rows (reference
    wraps each transactions-row build in try/except —
    src/load/TransformTask.py:24-50; row shape mirrors
    src/load/FileOutput.py:157-166)."""
    return txs.filter(F.col("tx_error").isNotNull()).select(
        F.lit("blocks_to_transactions").alias("name"),
        _source(F.col("path")).alias("block"),
        F.col("tx_error").alias("message"),
    )


def transfers_task(txs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """9-column ``transfers`` table + error rows (reference
    block_to_transfers, src/load/TransformTask.py:55-80)."""
    t = transfers_view(txs)
    good = t.filter(F.col("error").isNull()).select(
        F.col("block_time").alias("time"),
        "source",
        "destination",
        "mint",
        "value",
        F.col("scale").cast("tinyint").alias("scale"),
        F.col("signature").alias("transaction"),
        "blockhash",
        _source(F.col("path")).alias("path"),
    )
    errors = t.filter(F.col("error").isNotNull()).select(
        F.lit("blocks_to_transfers").alias("name"),
        _source(F.col("path")).alias("block"),
        F.col("error").alias("message"),
    )
    return good, errors


def blocks_task(txs: DataFrame, blocks_raw: DataFrame) -> DataFrame:
    """22-column per-block rollup (reference block_info,
    src/load/TransformTask.py:83-105).

    One hash aggregation; distinct-account measures union per-tx
    already-distinct arrays, so partial aggregation keeps the shuffle small.
    Blocks with zero transactions still emit a row (reference emits
    unconditionally).

    Documented divergence (SURVEY §7.5 spirit): a malformed transaction
    inside the block is counted by these null-tolerant aggregates, whereas
    the reference's block_info would raise and turn the WHOLE block into an
    error row — per-row isolation is strictly more informative, so the
    rollup keeps the block.
    """
    coin_accounts = F.transform(
        F.filter(
            "account_types",
            lambda a: ~a["is_sysvar"] & ~a["is_program"] & ~a["is_token"],
        ),
        lambda a: a["pubkey"],
    )
    per_tx = txs.withColumn("coin_pubkeys", coin_accounts)

    def partition_aggs(flag: Column, prefix: str, num_name: str) -> list[Column]:
        cnt = lambda cond: F.coalesce(  # noqa: E731
            F.count_if(flag & cond), F.lit(0)
        ).cast("long")
        distinct_accounts = lambda col: F.size(  # noqa: E731
            F.array_distinct(
                F.flatten(F.collect_list(F.when(flag, F.col(col))))
            )
        ).cast("long")
        return [
            F.count_if(flag).cast("long").alias(num_name),
            cnt(F.col("is_vote")).alias(f"{prefix}Votes"),
            cnt(~F.col("is_only_fee")).alias(f"{prefix}TransactionsMoreThanFee"),
            cnt(F.col("is_only_fee")).alias(f"{prefix}TransactionsOnlyFee"),
            F.coalesce(F.sum(F.when(flag, F.col("fee"))), F.lit(0))
            .cast("long")
            .alias(f"{prefix}Fees"),
            F.coalesce(F.sum(F.when(flag, F.col("lamports_out"))), F.lit(0))
            .cast("long")
            .alias(f"{prefix}BalanceChange"),
            distinct_accounts("programs").alias(f"{prefix}ProgramAccounts"),
            distinct_accounts("coin_pubkeys").alias(f"{prefix}CoinAccounts"),
            distinct_accounts("token_pubkeys").alias(f"{prefix}TokenAccounts"),
        ]

    ok = F.col("is_successful")
    # group by path ONLY (unique per block): getBlock may return a null
    # blockTime, and null join keys never match — grouping on (path,
    # block_time, blockhash) made such blocks emit a zero-filled row even
    # though their transactions were aggregated. block_time/blockhash come
    # from the roster side.
    agg = per_tx.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("numTransactions"),
        *partition_aggs(ok, "successful", "numSuccessful"),
        *partition_aggs(~ok, "error", "numErrors"),
    )

    # keep empty blocks: left join from the block roster, zero-fill measures
    roster = blocks_raw.filter(~F.col("missing") & F.col("_corrupt_record").isNull()).select(
        "path",
        F.col("result.blockTime").alias("block_time"),
        F.col("result.blockhash").alias("blockhash"),
    )
    joined = roster.join(agg, ["path"], "left")
    measures = [c for c in agg.columns if c != "path"]
    joined = joined.select(
        F.col("block_time").alias("time"),
        F.col("blockhash").alias("hash"),
        _source(F.col("path")).alias("path"),
        *[F.coalesce(F.col(m), F.lit(0)).alias(m) for m in measures],
    )
    return joined


def ingest_errors(blocks_raw: DataFrame) -> DataFrame:
    """Block-level failures → error rows (reference
    src/load/FileOutput.py:80-91 ``json_to_blocks`` rows): malformed JSON and
    missing blocks (no ``result`` key → downstream field access raises)."""
    bad = blocks_raw.filter(F.col("missing") | F.col("_corrupt_record").isNotNull())
    return bad.select(
        F.lit("json_to_blocks").alias("name"),
        _source(F.col("path")).alias("block"),
        F.when(F.col("_corrupt_record").isNotNull(), F.lit("malformed block json"))
        .otherwise(F.lit("missing block result"))
        .alias("message"),
    )


def run_all_tasks_with_handle(
    blocks_raw: DataFrame, persist: bool = True
) -> tuple[dict[str, DataFrame], DataFrame | None]:
    """All three task tables + the errors table from one pass over the raw
    blocks, plus the persisted transactions view (or None) so long-running
    callers (streaming micro-batches) can unpersist after their writes.
    Persisting the transactions view mirrors the reference's compute-once
    fan-out (src/load/FileOutput.py:167-169)."""
    good_blocks = blocks_raw.filter(F.col("_corrupt_record").isNull())
    txs = transactions_view(good_blocks)
    if persist:
        txs = txs.persist()
    transfers, transfer_errors = transfers_task(txs)
    outputs = {
        "transactions": transactions_task(txs),
        "transfers": transfers,
        "blocks": blocks_task(txs, blocks_raw),
        "errors": ingest_errors(blocks_raw)
        .unionByName(transaction_errors(txs))
        .unionByName(transfer_errors),
    }
    return outputs, (txs if persist else None)


def run_all_tasks(blocks_raw: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
    outputs, _ = run_all_tasks_with_handle(blocks_raw, persist)
    return outputs
