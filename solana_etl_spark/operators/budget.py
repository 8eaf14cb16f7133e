"""Budget-constrained corpus selection: take the highest-scoring documents
until a token budget is exhausted — the data-selection step of every
"train on the best N-billion tokens" pipeline — WITHOUT globally sorting
the corpus.

Semantics (exact, total-order): rows ranked by (score DESC, id ASC); a row
is selected iff the running weight total INCLUDING it is <= budget. That
is the plain window-cumsum definition — and the oracle runs exactly that
SQL. The sort-free evaluation:

1. **threshold refinement** — find the score tier t where the cumulative
   weight from the top crosses the budget, by iterative bucket refinement
   over the score domain (`operators/quantiles.py`'s machinery, summing
   WEIGHT instead of counting rows): O(log_B(domain)) passes, each one
   histogram aggregate, shuffling only (bucket, weight-sum) rows.
2. **select** — everything with score > t is in (pure filter, no sort);
   the boundary tier (score == t) gets the remaining budget by a window
   cumsum over ONLY that tier — a filtered sliver of the corpus, not a
   global sort.

All arithmetic is int64 (scores and weights integerized by the caller, the
same fixed-point discipline as every money column here), so the selected
set is bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKETS = 1024


def _tier_weights(vals: DataFrame, lo: int, hi: int, w: int) -> list:
    """One histogram pass: per-bucket weight sums over score range [lo, hi]."""
    return (
        vals.filter((F.col("s") >= lo) & (F.col("s") <= hi))
        .groupBy(F.expr(f"(s - {lo}) div {w}").alias("b"))
        .agg(F.sum("wt").alias("wsum"))
        .collect()
    )


def select_to_budget(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    id_col: str,
    budget: int,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Rows whose running ``weight_col`` total (ranked by score DESC, id
    ASC) stays within ``budget``. Scores and weights must be int64;
    weights must be positive."""
    vals = df.select(
        F.col(id_col).alias("_id"),
        F.col(score_col).cast("long").alias("s"),
        F.col(weight_col).cast("long").alias("wt"),
    )
    first = vals.agg(
        F.min("s").alias("lo"),
        F.max("s").alias("hi"),
        F.sum("wt").alias("total"),
    ).collect()[0]
    if first["total"] is None or first["total"] <= budget:
        return df  # everything fits (or empty)

    # refine the crossing tier from the TOP: walk buckets high→low
    # accumulating weight; recurse into the bucket where the budget runs out
    lo, hi, remaining = first["lo"], first["hi"], budget
    while lo < hi:
        w = max(1, (hi - lo + buckets) // buckets)
        by_b = {r["b"]: r["wsum"] for r in _tier_weights(vals, lo, hi, w)}
        for b in sorted(by_b, reverse=True):
            if by_b[b] > remaining:
                lo, hi = lo + b * w, min(hi, lo + (b + 1) * w - 1)
                break
            remaining -= by_b[b]
        else:  # pragma: no cover — guarded by the total<=budget early out
            raise AssertionError("budget not exhausted inside range")
    t = lo  # the boundary tier: score > t fully selected, == t partial

    above = df.filter(F.col(score_col) > t)
    tier = df.filter(F.col(score_col) == t)
    tier_cum = tier.withColumn(
        "_cum",
        F.sum(F.col(weight_col).cast("long")).over(
            Window.orderBy(F.col(id_col)).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return above.unionByName(
        tier_cum.filter(F.col("_cum") <= remaining).drop("_cum")
    )
