"""Slowly-changing-dimension (SCD type 2) history build + point-in-time
lookup — the warehouse-side complement to the CDC upsert
(`operators/merge.py` keeps only the LATEST row per key; SCD2 keeps every
version as a [valid_from, valid_to) interval so any past state is
queryable).

Scale shape: the history build is ONE window over (key) ordered by event
time — a single hash shuffle on the key, no self-join (the naive
"match each version to the next" formulation is a range self-join that
explodes on hot keys). Point-in-time lookup is a pure per-row filter on
the interval columns — pushdown-friendly, and with the history stored
range-clustered on valid_from (`operators/layout.py`) the parquet
min/max footers skip every file whose interval span misses the asked
timestamp.

Determinism: ties on (key, ts) are ordered by the version payload's
xxhash64 (the same whole-row tie-break discipline as merge.py), so
replays and retries produce identical intervals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame, key: str, ts: str = "ts", tiebreak: list[str] | None = None
) -> DataFrame:
    """Every change row becomes a version interval: valid_from = its own
    ``ts``, valid_to = the next version's ``ts`` (NULL while current),
    is_current flag on the open interval.

    ``tiebreak`` orders same-timestamp versions by the named columns
    (cross-engine reproducible); default is the payload's xxhash64 —
    deterministic under replay, but engine-specific."""
    payload = [c for c in changes.columns if c not in (key, ts)]
    tie = (
        [F.col(c) for c in tiebreak]
        if tiebreak
        else [F.xxhash64(*[F.col(c) for c in payload])]
    )
    w = Window.partitionBy(key).orderBy(F.col(ts), *tie)
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts)
    )


def as_of(history: DataFrame, at: Column | str) -> DataFrame:
    """The dimension exactly as it was at ``at``: valid_from <= at < valid_to
    (open interval = still current). Per-row filter, zero shuffle."""
    at_col = F.lit(at).cast("timestamp") if isinstance(at, str) else at
    return history.filter(
        (F.col("valid_from") <= at_col)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_col))
    ).drop("is_current")
