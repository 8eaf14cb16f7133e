"""Exact distributed quantiles WITHOUT a global sort: iterative bucket
refinement (the classic distributed-selection algorithm).

``sampling.quantile_bins`` (s4) ranks every row with NTILE — exact, but a
full sort of the column: the right plan until the sort itself is the
bottleneck. At 100 TB a global sort is a terabyte-scale shuffle; exact
selection only needs the VALUE at a rank, not an order for every row.

This operator finds exact order statistics in O(log_B(domain)) passes:

1. one aggregate → N, min, max; target rank = ceil(q*N) (q an exact
   rational — integer math, any engine).
2. each pass histograms the still-active value range into B integer
   buckets — ONE scan for ALL active quantiles (each row explodes into
   the ≤|Q| quantile ranges containing it; the shuffle is the tiny
   (quantile, bucket) histogram, map-side combined) — then narrows each
   quantile to the bucket containing its rank.
3. a range of width ≤ B resolves exactly (width-1 buckets).

Passes are driver-coordinated (the per-pass result is a ≤ |Q|*B-row
histogram — driver-small by construction, like the BPE argmax loop);
every arithmetic step is int64, so the result is the unique exact order
statistic — bit-identical on any engine/partitioning, with a plain
ROW_NUMBER oracle.

Domain: int64 columns. Fixed-point reals scale in (cents, micros) first —
explicit, like every other money column in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKETS = 1024


def exact_quantiles(
    df: DataFrame, col: str, qs: list[tuple[int, int]], buckets: int = BUCKETS
) -> DataFrame:
    """Exact order statistics for each q = (num, den) in ``qs`` over int64
    ``col`` (nulls ignored). Returns (q_num, q_den, value) — value is the
    element at 1-indexed rank ceil(q*N) in sorted order.
    """
    vals = df.select(F.col(col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    first = vals.agg(
        F.count("v").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    n, glo, ghi = first["n"], first["lo"], first["hi"]
    if n == 0:
        raise ValueError("exact_quantiles on an empty/all-null column")

    # state per quantile: value range [lo, hi] and rank within it
    state = {}
    for num, den in qs:
        rank = max(1, -(-num * n // den))  # ceil(num*n/den), exact ints
        state[(num, den)] = (glo, ghi, rank)

    spark: SparkSession = df.sparkSession
    while any(lo < hi for lo, hi, _ in state.values()):
        active = [(q, s) for q, s in state.items() if s[0] < s[1]]
        # one scan: explode each row into the active quantile ranges that
        # contain it, histogram on integer bucket index
        probes = F.array(
            *[
                F.struct(
                    F.lit(num).alias("qn"),
                    F.lit(den).alias("qd"),
                    F.lit(lo).alias("lo"),
                    F.lit(hi).alias("hi"),
                    F.lit(max(1, (hi - lo + buckets) // buckets)).alias("w"),
                )
                for (num, den), (lo, hi, _) in active
            ]
        )
        hist = (
            vals.select("v", F.explode(probes).alias("p"))
            .filter((F.col("v") >= F.col("p.lo")) & (F.col("v") <= F.col("p.hi")))
            .groupBy(
                F.col("p.qn").alias("qn"),
                F.col("p.qd").alias("qd"),
                F.expr("(v - p.lo) div p.w").alias("b"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_q: dict = {}
        for row in hist:
            by_q.setdefault((row["qn"], row["qd"]), {})[row["b"]] = row["c"]
        for (num, den), (lo, hi, rank) in active:
            w = max(1, (hi - lo + buckets) // buckets)
            cum = 0
            for b in sorted(by_q.get((num, den), {})):
                c = by_q[(num, den)][b]
                if cum + c >= rank:
                    state[(num, den)] = (
                        lo + b * w,
                        min(hi, lo + (b + 1) * w - 1),
                        rank - cum,
                    )
                    break
                cum += c

    rows = [(num, den, state[(num, den)][0]) for num, den in qs]
    return spark.createDataFrame(rows, "q_num int, q_den int, value long")


def mad_outliers(
    df: DataFrame, col: str, k: int = 3, out_col: str = "is_outlier"
) -> DataFrame:
    """Robust outlier flags via median absolute deviation: a row is an
    outlier when |x − median| > k·MAD, both statistics EXACT order
    statistics (ceil-rank, matching :func:`exact_quantiles`). Unlike the
    mean/std z-score, a few huge values cannot drag the threshold — the
    robust detector a heavy-tailed quality distribution needs.

    Adds (abs_dev, median, mad, out_col) to the non-null rows of ``col``.
    All-integer math (no 1.4826 normal-consistency scaling — k is the raw
    MAD multiple; document the convention where thresholds are shared).
    Scale shape: two bounded histogram-refinement passes (driver state =
    two int64 cut points), then a pure per-row flag."""
    vals = df.filter(F.col(col).isNotNull()).withColumn(
        col, F.col(col).cast("long")
    )
    med = exact_quantiles(vals, col, [(1, 2)]).collect()[0]["value"]
    devs = vals.withColumn("abs_dev", F.abs(F.col(col) - F.lit(med)))
    mad = exact_quantiles(devs, "abs_dev", [(1, 2)]).collect()[0]["value"]
    return devs.select(
        *df.columns,
        "abs_dev",
        F.lit(med).alias("median"),
        F.lit(mad).alias("mad"),
        (F.col("abs_dev") > k * mad).alias(out_col),
    )


def winsorize(
    df: DataFrame,
    col: str,
    lower: tuple[int, int] = (1, 100),
    upper: tuple[int, int] = (99, 100),
    out_col: str | None = None,
) -> DataFrame:
    """Clip int64 ``col`` at its EXACT lower/upper order statistics (the
    outlier treatment quality-score pipelines apply before thresholding —
    winsorization). Adds ``out_col`` (default ``{col}_w``) with values
    clamped into [p_lower, p_upper]; all other columns pass through.

    Scale shape: the two cut points come from :func:`exact_quantiles`
    (histogram refinement — no global sort; the only driver state is the
    two boundary values), then the clip is a pure per-row expression over
    the original frame. NULLs stay NULL."""
    out_col = out_col or f"{col}_w"
    cuts = {
        (r["q_num"], r["q_den"]): r["value"]
        for r in exact_quantiles(df, col, [lower, upper]).collect()
    }
    lo, hi = cuts[lower], cuts[upper]
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNull(), F.lit(None).cast("long")).otherwise(
            F.greatest(F.least(F.col(col).cast("long"), F.lit(hi)), F.lit(lo))
        ),
    )
