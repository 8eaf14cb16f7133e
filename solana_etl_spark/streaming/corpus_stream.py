"""The full CorpusPipeline cleaning chain under Structured Streaming:
quality → exact-dedup → near-dedup (vs the PERSISTED warehouse index) →
n-gram decontamination, per micro-batch, converging to exactly the batch
pipeline's output.

Stage-by-stage streaming semantics:

* quality / repetition — bare per-row predicates, batch-independent by
  construction: apply directly to the micro-batch.
* exact + near dedup — the one genuinely stateful stage; delegated to
  ``streaming/dedup_stream.dedup_batch_against_index`` (in-batch passes
  first so results don't depend on stream chunking, then the warehouse
  index; per-batch partition writes + current-batch index exclusion make
  foreachBatch's at-least-once retries converge).
* decontamination — the eval corpus is STATIC model-side state (like a
  vocabulary or rate map): a per-batch anti-join against the same eval
  set the batch pipeline uses, stateless across batches.

The dedup index is updated from the WRITTEN survivors (post-
decontamination): a contaminated document never enters the index, and a
later copy of it is re-dropped by the same deterministic decontamination
predicate rather than by the index — batch/stream equivalence holds
either way, and the index stays a pure content index of the corpus that
actually survived.

At 100 TB the per-batch cost is the pipeline's own linear stages plus
two narrow index anti-joins — no corpus re-scan, no unbounded stream
state (the index lives in the warehouse, time-unbounded by design).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from solana_etl_spark.operators.dedup import dedup_index
from solana_etl_spark.operators.text import quality_predicate
from solana_etl_spark.streaming.dedup_stream import dedup_batch_against_index


def clean_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    eval_docs: DataFrame | None,
    index_dir: str,
    exclude_batch: int | None = None,
) -> DataFrame:
    """One micro-batch through the cleaning chain — the deterministic
    function both the streaming wiring and its tests share."""
    from solana_etl_spark.operators.decontam import contamination

    cleaned = batch_df.filter(quality_predicate())
    survivors = dedup_batch_against_index(
        spark, cleaned, index_dir, exclude_batch=exclude_batch
    )
    if eval_docs is not None:
        bad = (
            contamination(survivors, eval_docs)
            .filter(F.col("is_contaminated"))
            .select("doc_id")
        )
        survivors = survivors.join(bad, "doc_id", "left_anti")
    return survivors


def start_streaming_corpus_pipeline(
    spark: SparkSession,
    docs_stream: DataFrame,
    eval_docs: DataFrame | None,
    survivors_dir: str,
    index_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """documents stream → cleaned corpus + updated dedup index,
    exactly-once (per-batch subdirectory overwrites keyed by batch_id;
    the index loader excludes the in-flight batch_id, so at-least-once
    retries and kill/restart runs converge — same contract as
    ``start_streaming_corpus_ingest``)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors = clean_batch(
            spark, batch_df, eval_docs, index_dir, exclude_batch=batch_id
        )
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
