"""Streaming deterministic sampling: a hash-rank "reservoir" whose state
is the sample itself.

Classic reservoir sampling is ORDER-dependent — replays, retries, and file
reordering all shift which rows survive, so an at-least-once stream cannot
reproduce it. Ranking every row by the cross-engine content hash and
keeping the n SMALLEST ranks instead makes the sample a pure function of
the SET of rows seen so far: min-n is idempotent and commutative under
union, so

* a micro-batch replayed after a crash converges to the same sample,
* the file/batch arrival order never matters, and
* the streaming result equals the batch ``ORDER BY rank LIMIT n`` —
  batch-SQL-expressible, hence value-hash oracle-checkable.

State is versioned per micro-batch (``batch=k`` = the sample AFTER batch
k, a pure function of the batch prefix) and discovered through Spark's
partition mechanism — no filesystem listing, so any object store works;
a retry re-reads its predecessor's state (``batch < current``), recomputes
the same output, and overwrites only its own partition — the same
convergence recipe as the streaming dedup index. At 100 TB the state is
n rows regardless of corpus size and the per-batch cost is one
TakeOrderedAndProject over (batch ∪ n state rows).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from solana_etl_spark.functions.hashing import hash64

SAMPLE_N = 100


def _state_schema(key_type: str) -> str:
    return f"doc_id {key_type}, sample_rank long"


def sample_rank(key: Column) -> Column:
    """The rank every engine agrees on: hash64 of the salted key string."""
    return hash64(F.concat(F.lit("sample|"), key.cast("string")))


def read_sample(
    spark: SparkSession,
    state_dir: str,
    before_batch: int | None = None,
    key_type: str = "long",
) -> DataFrame:
    """The current sample: the newest committed ``batch=k`` state (or the
    newest with k < before_batch, which a retrying batch uses so it never
    reads its own first attempt). Only the nonexistence of the state dir
    is tolerated (first batch); the max-batch probe is a 1-row driver
    scalar, like every bounded-state collect in this repo. ``key_type``
    shapes the empty no-state-yet frame so non-long keys (string ids)
    union cleanly with their first batch."""
    try:
        df = spark.read.option("basePath", state_dir).parquet(state_dir)
    except AnalysisException as e:
        # missing dir (first batch) OR an existing dir with ZERO committed
        # files (crash during the very first state write — _temporary only,
        # which reads as UNABLE_TO_INFER_SCHEMA): both genuinely mean "no
        # state yet"; the parquet commit protocol guarantees uncommitted
        # files are never readable, so treating this as empty is safe and
        # keeps the retry loop convergent instead of permanently wedged
        if (
            "PATH_NOT_FOUND" in str(e)
            or "Path does not exist" in str(e)
            or "UNABLE_TO_INFER_SCHEMA" in str(e)
        ):
            return spark.createDataFrame([], _state_schema(key_type))
        raise
    if before_batch is not None:
        df = df.filter(F.col("batch") < before_batch)
    latest = df.agg(F.max("batch")).first()[0]
    if latest is None:
        return spark.createDataFrame([], _state_schema(key_type))
    return df.filter(F.col("batch") == latest).select(
        "doc_id", "sample_rank"
    )


def _prune_state(spark: SparkSession, state_dir: str, keep_from: int) -> None:
    """Delete ``batch=k`` state versions with k < keep_from. Called after
    a successful write with keep_from = batch_id − 1: the predecessor
    stays (a retry of batch_id re-reads it and converges), everything
    older is dead weight — without this a long-running stream accumulates
    one partition per micro-batch and read_sample's listing cost grows
    without bound. Hadoop FS API so any object store works."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not name.startswith("batch="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b < keep_from:
            fs.delete(status.getPath(), True)


def update_sample_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    key_col: str = "doc_id",
    n: int = SAMPLE_N,
) -> None:
    """Fold one micro-batch into the sample: rank the batch's keys, union
    the predecessor state, keep the n smallest (key tie-break is moot —
    the rank is a function of the key — but distinct() collapses re-seen
    keys so replayed rows can't occupy two slots)."""
    ranked = batch_df.select(
        F.col(key_col).alias("doc_id"),
        sample_rank(F.col(key_col)).alias("sample_rank"),
    )
    key_type = batch_df.schema[key_col].dataType.simpleString()
    prev = read_sample(
        spark, state_dir, before_batch=batch_id, key_type=key_type
    )
    new_state = (
        ranked.unionByName(prev)
        .distinct()
        .orderBy("sample_rank", "doc_id")
        .limit(n)
    )
    new_state.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )
    _prune_state(spark, state_dir, keep_from=batch_id - 1)


def start_streaming_sample(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    n: int = SAMPLE_N,
) -> StreamingQuery:
    """documents stream → maintained n-row deterministic sample."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        update_sample_batch(
            spark, batch_df, state_dir, batch_id, key_col=key_col, n=n
        )

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
