"""Streaming materialized JOIN view: one event stream continuously
maintains signups ⋈ purchases (per-user attribution history) with the
append-only delta rule — the streaming face of
``operators/incremental.maintain_join_append``.

Per micro-batch N:

* the batch splits into side deltas (ΔA = signups, ΔB = purchases), each
  written to an idempotent per-batch directory (``a/batch=N``,
  ``b/batch=N`` — a foreachBatch retry overwrites the same paths);
* the view advances by the delta rule only::

      v=N  =  parent ∪ ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB

  where ``parent`` is the newest committed view version < N and
  A_old/B_old are the committed side batches < N — the dominant
  A_old⋈B_old term is carried forward verbatim, never recomputed;
* ``v=N`` is a pure function of committed state strictly below N, so
  at-least-once redelivery converges (same inputs → same overwrite) —
  the same exactly-once recipe as the CDC merge stream, with the
  ``_SUCCESS``-gated version/batch directories standing in for a
  transaction log.

Scale: per batch, only delta-sized joins run (each delta side broadcasts
against the accumulated other side); the view grows append-only, so the
"write v=N" full rewrite should become a partition append
(``partitionBy(batch)``) once the view outgrows directory rewrites — the
delta terms ARE the new partition.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from solana_etl_spark.operators.incremental import maintain_join_append

_BDIR = re.compile(r"^batch=(\d+)$")
_VDIR = re.compile(r"^v=(\d+)$")


def _committed(dir_path: str, pattern: re.Pattern) -> list[int]:
    if not os.path.isdir(dir_path):
        return []
    out = []
    for name in os.listdir(dir_path):
        m = pattern.match(name)
        if m and os.path.exists(os.path.join(dir_path, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def _side_union(
    spark: SparkSession, side_dir: str, below: int, schema
) -> DataFrame:
    batches = [b for b in _committed(side_dir, _BDIR) if b < below]
    if not batches:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(
        *[os.path.join(side_dir, f"batch={b}") for b in batches]
    )


def _split_sides(batch_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    da = batch_df.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    db = batch_df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    return da, db


def apply_view_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
) -> None:
    """Advance the attribution view to ``v=batch_id`` from one micro-batch
    of raw events. Pure function of committed state < batch_id →
    redelivery-convergent."""
    da, db = _split_sides(batch_df)
    a_dir = os.path.join(state_dir, "a")
    b_dir = os.path.join(state_dir, "b")
    da.write.mode("overwrite").parquet(
        os.path.join(a_dir, f"batch={batch_id}")
    )
    db.write.mode("overwrite").parquet(
        os.path.join(b_dir, f"batch={batch_id}")
    )
    a_old = _side_union(spark, a_dir, batch_id, da.schema)
    b_old = _side_union(spark, b_dir, batch_id, db.schema)

    view_dir = os.path.join(state_dir, "view")
    parents = [v for v in _committed(view_dir, _VDIR) if v < batch_id]
    cols = ["user_id", "signup_ts", "purchase_ts", "value"]
    if parents:
        parent = spark.read.parquet(
            os.path.join(view_dir, f"v={parents[-1]}")
        )
    else:
        parent = spark.createDataFrame(
            [], a_old.join(db, "user_id").select(*cols).schema
        )
    # one shared implementation of the delta rule (batch + streaming)
    new_view = maintain_join_append(
        parent, a_old, b_old, da, db, ["user_id"]
    ).select(*cols)
    new_view.write.mode("overwrite").parquet(
        os.path.join(view_dir, f"v={batch_id}")
    )


def prune_view_versions(state_dir: str, retain: int = 3) -> None:
    """Drop all but the newest ``retain`` committed view versions. Without
    pruning, every micro-batch rewrites the FULL view into a fresh ``v=N``
    directory and storage grows quadratically in batch count (the same
    guard :func:`merge_stream.prune_snapshots` applies to CDC snapshots)."""
    view_dir = os.path.join(state_dir, "view")
    for v in _committed(view_dir, _VDIR)[:-retain]:
        shutil.rmtree(os.path.join(view_dir, f"v={v}"), ignore_errors=True)


def current_view(spark: SparkSession, state_dir: str) -> DataFrame:
    view_dir = os.path.join(state_dir, "view")
    versions = _committed(view_dir, _VDIR)
    if not versions:
        raise FileNotFoundError(f"no committed view under {view_dir}")
    return spark.read.parquet(os.path.join(view_dir, f"v={versions[-1]}"))


def start_view_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    retain: int | None = 3,
) -> StreamingQuery:
    """Maintain the attribution view from an event stream. ``retain`` prunes
    old view versions after each batch (None keeps all — full time travel,
    at quadratic storage in batch count)."""
    if retain is not None and retain < 2:
        # a foreachBatch retry of batch N re-joins onto the newest version
        # < N; pruning that parent away would silently restart from empty
        raise ValueError("retain must be >= 2 (retry needs the parent view)")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_view_batch(spark, batch_df, state_dir, batch_id)
        if retain is not None:
            prune_view_versions(state_dir, retain)

    return (
        events_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
