"""Streaming corpus ingest with incremental dedup against a PERSISTED index.

``dropDuplicatesWithinWatermark`` (streaming/windows.py) bounds exact-dedup
state by TIME — right for event streams, wrong for corpus ingest, where a
document seen six months ago must still suppress today's copy. This wiring
keeps the dedup state in the warehouse instead of the stream: the
(content-hash, LSH-bucket) index tables from ``operators/dedup.dedup_index``
are loaded per micro-batch, the batch is filtered with
``operators/dedup.incremental_dedup`` (plus an in-batch exact pass), and the
survivors + their index rows are appended idempotently (per-batch
subdirectories keyed by batch_id, the ``append_csv_exactly_once`` pattern),
so a foreachBatch retry after a crash rewrites the same paths instead of
duplicating rows.

At 100 TB the index tables are small-by-construction (16-byte hashes and
band keys, not documents); per-batch cost is two anti-joins keyed on narrow
values with the batch side broadcast — no corpus re-scan, unbounded history,
bounded state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from solana_etl_spark.operators.dedup import (
    dedup_index,
    exact_dedup,
    incremental_dedup,
)


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def dedup_batch_against_index(
    spark: SparkSession, batch_df: DataFrame, index_dir: str
) -> DataFrame:
    """One micro-batch's survivors: in-batch exact dedup (keep min doc_id),
    then drop anything exact- or near-duplicating the persisted index."""
    keepers = exact_dedup(batch_df).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    in_batch_unique = batch_df.join(keepers, "doc_id", "left_semi")
    exact_idx = _read_or_empty(
        spark, os.path.join(index_dir, "exact"), "content_hash long"
    )
    band_idx = _read_or_empty(
        spark, os.path.join(index_dir, "bands"), "band int, sig string"
    )
    return incremental_dedup(in_batch_unique, exact_idx, band_idx)


def start_streaming_corpus_ingest(
    spark: SparkSession,
    docs_stream: DataFrame,
    survivors_dir: str,
    index_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """documents stream → deduped corpus + updated index, exactly-once.

    Idempotence: every write lands in ``.../batch={batch_id}`` with
    overwrite, so Structured Streaming's at-least-once foreachBatch retries
    converge; readers glob the parent directory.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors = dedup_batch_against_index(spark, batch_df, index_dir)
        survivors.write.mode("overwrite").parquet(
            os.path.join(survivors_dir, f"batch={batch_id}")
        )
        written = spark.read.parquet(
            os.path.join(survivors_dir, f"batch={batch_id}")
        )
        new_exact, new_bands = dedup_index(written)
        new_exact.write.mode("overwrite").parquet(
            os.path.join(index_dir, "exact", f"batch={batch_id}")
        )
        new_bands.write.mode("overwrite").parquet(
            os.path.join(index_dir, "bands", f"batch={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
