"""Streaming tokenizer-vocabulary maintenance: the (word, freq) table IS
the state — Zipf-bounded (10^6-10^8 rows at any corpus size, the
operators/lm.py argument), so a stream can keep it current per
micro-batch and re-train a BPE/WordPiece vocabulary on demand with the
driver-side hybrid trainer (operators/vocab_driver.py) in seconds,
without ever re-scanning the corpus.

State recipe: versioned snapshots exactly like streaming/sample_stream
and streaming/hll_stream — ``batch=k`` holds the word counts AFTER
batch k; a foreachBatch retry re-reads its predecessor (batch < current)
and overwrites only its own partition, so at-least-once replays converge
(word-count summation is not an idempotent merge, but the version chain
makes each batch's fold exactly-once); versions older than the
predecessor are pruned after each successful write.

Because counts are additive, the maintained table over a stream equals
``word_freq_table`` over the same rows as one batch — bit-exactly. So a
vocabulary trained from the stream state equals the batch-trained one,
and the whole family sits under the cross-engine TRAINING oracle
(queries.text_bpe_vocab_train's unrolled merge loop): the eleventh
stream-equals-batch gate family, and the streaming completion of the r8
hybrid trainer — ingest maintains the bounded state, training is a
seconds-scale driver pass over it.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from solana_etl_spark.operators.vocab import word_freq_table
from solana_etl_spark.streaming.sample_stream import _prune_state

_STATE_SCHEMA = "word string, freq long"


def read_word_state(
    spark: SparkSession,
    state_dir: str,
    before_batch: int | None = None,
) -> DataFrame:
    """The current (word, freq) table: newest committed ``batch=k`` (or
    the newest below ``before_batch`` for a retrying batch)."""
    try:
        df = spark.read.option("basePath", state_dir).parquet(state_dir)
    except AnalysisException as e:
        if (
            "PATH_NOT_FOUND" in str(e)
            or "Path does not exist" in str(e)
            or "UNABLE_TO_INFER_SCHEMA" in str(e)
        ):
            return spark.createDataFrame([], _STATE_SCHEMA)
        raise
    if before_batch is not None:
        df = df.filter(F.col("batch") < before_batch)
    latest = df.agg(F.max("batch")).first()[0]
    if latest is None:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return df.filter(F.col("batch") == latest).select("word", "freq")


def update_word_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch into the word table: count the batch's
    words, union the predecessor state, sum per word."""
    batch_counts = word_freq_table(batch_df, text_col).select(
        "word", F.col("freq").cast("long").alias("freq")
    )
    prev = read_word_state(spark, state_dir, before_batch=batch_id)
    new_state = (
        batch_counts.unionByName(prev)
        .groupBy("word")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
    new_state.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )
    _prune_state(spark, state_dir, keep_from=batch_id - 1)


def start_streaming_word_counts(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> StreamingQuery:
    """stream → maintained (word, freq) state (train from it with
    :func:`train_bpe_from_state` / :func:`train_wordpiece_from_state`)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        update_word_batch(spark, batch_df, state_dir, batch_id, text_col)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _collect_state(
    spark: SparkSession, state_dir: str, word_cap: int
) -> list[tuple[str, int]]:
    rows = read_word_state(spark, state_dir).limit(word_cap + 1).collect()
    if len(rows) > word_cap:
        raise ValueError(
            f"streamed word table exceeds word_cap={word_cap}; raise the "
            "cap or train with the distributed loop over read_word_state"
        )
    return [(r["word"], r["freq"]) for r in rows]


def train_bpe_from_state(
    spark: SparkSession,
    state_dir: str,
    n_merges: int,
    append_eow: bool = True,
    word_cap: int | None = None,
) -> list[tuple[str, str]]:
    """BPE merges from the maintained word state — bit-equal to batch
    training over the same streamed rows (counts are additive)."""
    from solana_etl_spark.operators.vocab_driver import (
        DRIVER_WORD_TABLE_CAP,
        bpe_merges_from_word_freqs,
    )

    cap = DRIVER_WORD_TABLE_CAP if word_cap is None else word_cap
    return bpe_merges_from_word_freqs(
        _collect_state(spark, state_dir, cap), n_merges, append_eow
    )


def train_wordpiece_from_state(
    spark: SparkSession,
    state_dir: str,
    n_merges: int,
    max_piece_len: int = 12,
    word_cap: int | None = None,
) -> list[str]:
    """WordPiece vocabulary from the maintained word state."""
    from solana_etl_spark.operators.vocab_driver import (
        DRIVER_WORD_TABLE_CAP,
        wordpiece_vocab_from_word_freqs,
    )

    cap = DRIVER_WORD_TABLE_CAP if word_cap is None else word_cap
    return wordpiece_vocab_from_word_freqs(
        _collect_state(spark, state_dir, cap), n_merges, max_piece_len
    )
