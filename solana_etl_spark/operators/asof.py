"""As-of (time-travel) join — absent in the reference (SURVEY.md §2.3
"Absent: ... range/as-of ... joins") and in Spark's built-in join types;
provided here as a first-class operator because it is the workhorse of
event-stream enrichment (attribute each event to the most recent earlier
fact with the same key).

Scale design — the union + running-window formulation, NOT a range join:

* A naive formulation (`l JOIN r ON l.key = r.key AND r.ts <= l.ts` +
  keep max r.ts) explodes to O(|matches|) intermediate rows per key before
  pruning — quadratic on hot keys, fatal at 100 TB.
* Here both sides are unioned into one stream, shuffled ONCE by key, sorted
  by (ts, side), and each left row picks up the running ``last`` right
  payload. Cost is one shuffle + one sort per key group — the same shape as
  any windowed aggregation, linear in input size. Skewed keys behave no
  worse than any window over the same key.

DuckDB's native ``ASOF JOIN`` provides the value-exact oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach one right row within the same ``keys``
    group, chosen by ``direction``:

    * ``backward`` (default): the greatest ``right_ts <= left_ts`` — the
      classic "most recent earlier fact".
    * ``forward``: the smallest ``right_ts >= left_ts`` — next-event
      attribution (DuckDB mirrors it with ``ASOF JOIN ... ON l.ts <= r.ts``).

    Both run as the same single-shuffle union + running-window plan — the
    forward pass just orders the merged stream by descending timestamp.

    Non-key, non-ts right columns are carried over under their own names
    (they must not collide with left column names). ``how`` is ``inner``
    (drop unmatched left rows — DuckDB ASOF JOIN default) or ``left``.

    Ties: right rows sort before left rows at an identical timestamp
    (inclusive bound), and among right rows with identical (key, ts) the
    one later in ``right``'s deterministic ordering wins — callers wanting
    full determinism should pre-dedupe right to one row per (key, ts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")
    keys = list(keys)
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*right_payload).alias("__rpay"),
    )
    l = left.select(  # noqa: E741
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
        F.struct(*left.columns).alias("__lpay"),
    )
    r = r.withColumn("__lpay", F.lit(None).cast(l.schema["__lpay"].dataType))

    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__rpay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    return matched.select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )
