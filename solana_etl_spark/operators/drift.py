"""Distribution-drift monitoring between two dataset slices: PSI and the
KS statistic over a shared fixed-width binning.

A training corpus is re-ingested continuously; the question "did this
week's data shift?" is answered by comparing per-feature distributions of
the new slice against a reference slice. Standard monitoring metrics:

* **PSI** (population stability index): Σ (p_i − q_i) · ln(p_i / q_i)
  over histogram bins — the symmetric KL-style score ops teams threshold
  at 0.1 (drifting) / 0.25 (shifted).
* **KS statistic**: max_i |CDF_ref(i) − CDF_cur(i)| over the same bins —
  the sup-norm gap, sensitive to location shifts PSI can smear.

Scale shape: ONE aggregate pass per slice (map-side-combined histogram of
``n_bins``-bounded state), a broadcast 1-row join for the bin bounds, and
a window over the ``n_bins``-row histogram — no per-row window, no sort
of the data, no driver collect. Bin bounds come from the REFERENCE
slice's min/max (the monitoring convention: the reference defines the
binning; out-of-range current values clamp into the edge bins), kept
in-plan via a broadcast cross join so the operator stays one lazy
DataFrame. Bin assignment is exact integer arithmetic, so the histogram
is bit-identical cross-engine; the PSI/KS doubles round to 6 places.

Zero-count bins are floored at ``EPS`` before the PSI log — the standard
guard (a bin present in one slice and empty in the other would otherwise
send PSI to ±inf).

Charter extension (SURVEY §2.11 family: data-quality / governance); the
reference has no monitoring surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_BINS = 16
EPS = 1e-6


def _binned_hist(
    ref: DataFrame, cur: DataFrame, value_col: str, n_bins: int
) -> DataFrame:
    """(bin, ref_cnt, cur_cnt): the shared reference-defined fixed-width
    binning every binned drift metric (PSI / binned-KS / chi²) runs on —
    bounds from the REFERENCE slice, out-of-range current values clamp
    into the edge bins, exact integer bin assignment."""
    bounds = ref.agg(
        F.min(F.col(value_col).cast("long")).alias("_lo"),
        F.max(F.col(value_col).cast("long")).alias("_hi"),
    )

    def hist(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("long")
        span = F.col("_hi") - F.col("_lo") + 1
        raw = F.floor(((v - F.col("_lo")) * n_bins) / span)
        bin_ = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
        return (
            df.select(v.alias(value_col))
            .filter(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(bounds))
            .select(bin_.cast("long").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    h = hist(ref, "ref_cnt").join(hist(cur, "cur_cnt"), "bin", "full_outer")
    return h.select(
        "bin",
        F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
        F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
    )


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    feature: str | None = None,
    n_bins: int = N_BINS,
) -> DataFrame:
    """One-row drift report comparing ``cur`` against ``ref`` on integer
    column ``value_col``: (feature, n_ref, n_cur, psi, ks_stat).
    """
    feature = feature or value_col
    h = _binned_hist(ref, cur, value_col, n_bins)
    totals = h.agg(
        F.sum("ref_cnt").alias("n_ref"), F.sum("cur_cnt").alias("n_cur")
    )
    h = h.crossJoin(F.broadcast(totals))
    p = F.greatest(F.col("ref_cnt") / F.col("n_ref"), F.lit(EPS))
    q = F.greatest(F.col("cur_cnt") / F.col("n_cur"), F.lit(EPS))
    # an empty (or all-NULL) slice must fail the job, not emit a
    # plausible-looking report: NULL reference bounds would clamp every
    # current row into the top bin and 0/0 proportions EPS-floor into
    # finite garbage. The raise sits in the SELECTED branch of the When
    # (an additive guard term gets skipped by null-propagating arithmetic
    # before it can raise). Same fail-loudly discipline as weighted_sample.
    psi_term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        (p - q) * (F.log(p) - F.log(q)),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"drift_report: empty or all-NULL slice for '{feature}' "
                "(n_ref/n_cur = 0) — refusing to score drift against "
                "nothing"
            )
        ).cast("double")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    per_bin = h.select(
        "bin",
        psi_term.alias("_psi_term"),
        F.abs(
            F.sum(F.col("ref_cnt") / F.col("n_ref")).over(w)
            - F.sum(F.col("cur_cnt") / F.col("n_cur")).over(w)
        ).alias("_cdf_gap"),
    )
    # global (group-less) aggregates are ALWAYS one row, even over an
    # empty histogram — so the report row is built from `totals` × `stats`
    # and the emptiness guard sits HERE, where it is guaranteed to be
    # evaluated. The per-bin raise above covers the single-empty-slice
    # case (bins from the non-empty side exist); when BOTH slices are
    # empty the histogram has zero rows, no per-bin term ever runs, and
    # without this row-level guard the query would silently return zero
    # rows instead of failing the documented empty-slice contract.
    stats = per_bin.agg(
        F.round(F.sum("_psi_term"), 6).alias("psi"),
        F.round(F.max("_cdf_gap"), 6).alias("ks_stat"),
    )
    nonempty = (F.coalesce(F.col("n_ref"), F.lit(0)) > 0) & (
        F.coalesce(F.col("n_cur"), F.lit(0)) > 0
    )
    guard = F.when(nonempty, F.col("n_ref")).otherwise(
        F.raise_error(
            F.lit(
                f"drift_report: empty or all-NULL slice for '{feature}' "
                "(n_ref/n_cur = 0) — refusing to score drift against "
                "nothing"
            )
        ).cast("long")
    )
    return totals.crossJoin(stats).select(
        F.lit(feature).alias("feature"),
        guard.alias("n_ref"),
        "n_cur",
        "psi",
        "ks_stat",
    )


def chi2_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    feature: str | None = None,
    n_bins: int = N_BINS,
) -> DataFrame:
    """Pearson chi-square homogeneity test between the two slices over
    the shared reference-defined binning — the significance-testable
    complement of PSI (an effect size) and KS (a sup-norm): (feature,
    n_ref, n_cur, dof, chi2). Expected counts come from the pooled bin
    distribution, e_slice_i = n_slice · (ref_i + cur_i) / (n_ref +
    n_cur); every input is an exact integer so both engines evaluate the
    identical IEEE formula (rounded to 6). dof = populated bins − 1.
    Same bounded scale shape as :func:`drift_report`: two histogram
    aggregates and arithmetic over ≤ n_bins rows."""
    feature = feature or value_col
    h = _binned_hist(ref, cur, value_col, n_bins)
    totals = h.agg(
        F.sum("ref_cnt").alias("n_ref"), F.sum("cur_cnt").alias("n_cur")
    )
    hh = h.crossJoin(F.broadcast(totals))
    pooled = (F.col("ref_cnt") + F.col("cur_cnt")).cast("double")
    n_all = (F.col("n_ref") + F.col("n_cur")).cast("double")
    e_ref = F.col("n_ref").cast("double") * pooled / n_all
    e_cur = F.col("n_cur").cast("double") * pooled / n_all
    term = F.when(
        pooled > 0,
        (F.col("ref_cnt") - e_ref) * (F.col("ref_cnt") - e_ref) / e_ref
        + (F.col("cur_cnt") - e_cur) * (F.col("cur_cnt") - e_cur) / e_cur,
    ).otherwise(F.lit(0.0))
    # global (group-less) aggregate + totals cross join, like
    # drift_report: the one-row shape guarantees the empty-slice guard
    # evaluates even when the histogram has zero rows (both slices
    # empty), instead of silently returning no rows
    stats = hh.agg(
        F.round(F.sum(term), 6).alias("chi2"),
        (
            F.sum(F.when(pooled > 0, 1).otherwise(0)).cast("long") - 1
        ).alias("dof"),
    )
    nonempty = (F.coalesce(F.col("n_ref"), F.lit(0)) > 0) & (
        F.coalesce(F.col("n_cur"), F.lit(0)) > 0
    )
    guard = F.when(nonempty, F.col("n_ref")).otherwise(
        F.raise_error(
            F.lit(
                f"chi2_report: empty or all-NULL slice for '{feature}' "
                "(n_ref/n_cur = 0) — refusing to score drift against "
                "nothing"
            )
        ).cast("long")
    )
    return totals.crossJoin(stats).select(
        F.lit(feature).alias("feature"),
        guard.alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        "dof",
        "chi2",
    )


def embedding_centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    feature: str = "embedding",
) -> DataFrame:
    """Vector-space drift between two embedding slices: per-dimension
    centroid means, reduced to (centroid_l2, centroid_cos, max_dim_gap).

    A corpus whose scalar profiles look stable can still drift
    semantically — topic mix shifts move the embedding centroid long
    before length/quality histograms notice. Metrics:

    * ``centroid_l2`` — Euclidean distance between slice centroids;
    * ``centroid_cos`` — cosine of the two centroids (1.0 = no angular
      drift);
    * ``max_dim_gap`` — sup-norm over dimensions, localizing the drift.

    Scale shape: per-slice ONE posexplode + dimension-keyed aggregate
    (state = n_dims rows, map-side combined), then all reductions run on
    the n_dims-row join — corpus-size-independent after the first pass.
    Numerics follow the repo's exact-sum discipline (similarity.ivf_ndcg):
    every cross-row float sum rounds its terms to a fixed scale and sums
    as DECIMAL, so the result is addition-order-independent and
    bit-reproducible cross-engine; only the final scalar math is double,
    rounded to 6.
    """

    def dim_means(df: DataFrame, tag: str) -> DataFrame:
        term = F.round(F.col("v").cast("double"), 9).cast("decimal(28,9)")
        return (
            df.select(F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("dim")
            .agg(
                F.sum(term).alias(f"_s_{tag}"),
                F.count(F.lit(1)).alias(f"_n_{tag}"),
            )
            .select(
                "dim",
                F.round(
                    F.col(f"_s_{tag}").cast("double") / F.col(f"_n_{tag}"), 9
                ).alias(f"m_{tag}"),
                F.col(f"_n_{tag}"),
            )
        )

    j = dim_means(ref, "a").join(dim_means(cur, "b"), "dim")
    d12 = "decimal(30,12)"
    diff2 = F.round((F.col("m_a") - F.col("m_b")) ** 2, 12).cast(d12)
    dot = F.round(F.col("m_a") * F.col("m_b"), 12).cast(d12)
    na2 = F.round(F.col("m_a") ** 2, 12).cast(d12)
    nb2 = F.round(F.col("m_b") ** 2, 12).cast(d12)
    agg = j.agg(
        F.max("_n_a").alias("n_ref"),
        F.max("_n_b").alias("n_cur"),
        F.sum(diff2).alias("_d2"),
        F.sum(dot).alias("_dot"),
        F.sum(na2).alias("_na2"),
        F.sum(nb2).alias("_nb2"),
        F.max(F.abs(F.col("m_a") - F.col("m_b"))).alias("_gap"),
    )
    return agg.select(
        F.lit(feature).alias("feature"),
        "n_ref",
        "n_cur",
        F.round(F.sqrt(F.col("_d2").cast("double")), 6).alias("centroid_l2"),
        F.round(
            F.col("_dot").cast("double")
            / (
                F.sqrt(F.col("_na2").cast("double"))
                * F.sqrt(F.col("_nb2").cast("double"))
            ),
            6,
        ).alias("centroid_cos"),
        F.round(F.col("_gap"), 6).alias("max_dim_gap"),
    )


def exact_ks(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str = "value",
    n_buckets: int | None = None,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic — the unbinned
    complement of :func:`drift_report`'s histogram KS (which under-reports
    any sup-norm gap that opens and closes inside one bin).

    sup_x |ECDF_a(x) − ECDF_b(x)| is computed exactly: at each distinct
    value, the gap numerator is |cum_a·n_b − cum_b·n_a| (cross-multiplied
    so no rational ever becomes a float early) accumulated as
    DECIMAL(38,0) — int64 would wrap silently once n_a·n_b passes 2^63,
    i.e. two ~4e9-row samples, exactly the scale this operator targets.
    The one division happens once, on the max; ``ks_num`` surfaces as
    DOUBLE (exact below 2^53 and a nearest-rounding of the exact integer
    beyond — identical in both engines, the a23 sufficient-stats recipe),
    and ``ks_stat``'s 6-decimal precision is unaffected either way.

    Scale shape: one distributed groupBy collapses the data to the
    DISTINCT-VALUE grain (per-value a/b counts, map-side combined); the
    cumulative ECDF sums then run as a TWO-PHASE prefix sum over sampled
    range buckets (operators/prefix.py) — a partitioned per-bucket
    window plus broadcast bucket offsets — so even an unbounded
    continuous domain, where the distinct-value grain equals the row
    count, never funnels through one reducer. Split sampling costs one
    approxQuantile pass over the unioned values; split choice affects
    load balance only, never the statistic.

    Empty inputs (documented contract): if exactly one side has zero
    non-null rows the sup gap is vacuous, so ``ks_stat`` is NULL (and
    ``ks_num`` 0) rather than the silent 0/0 NaN; if BOTH sides are
    empty the histogram is empty and the result has zero rows.
    """
    from solana_etl_spark.operators.prefix import (
        N_RANGE_BUCKETS,
        exclusive_offsets,
        quantile_splits,
        range_bucket,
    )

    if n_buckets is None:
        n_buckets = N_RANGE_BUCKETS
    a = df_a.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("v"), F.lit(1).alias("ca"), F.lit(0).alias("cb")
    )
    b = df_b.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("v"), F.lit(0).alias("ca"), F.lit(1).alias("cb")
    )
    union = a.unionByName(b)
    splits = quantile_splits(union, "v", n_buckets)
    hist = (
        union.groupBy("v")
        .agg(F.sum("ca").alias("na_v"), F.sum("cb").alias("nb_v"))
        .withColumn("_bkt", range_bucket("v", splits))
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = exclusive_offsets(hist, ["na_v", "nb_v"])
    totals = hist.agg(
        F.sum("na_v").cast("long").alias("n_a"),
        F.sum("nb_v").cast("long").alias("n_b"),
    )
    d38 = "decimal(38,0)"
    gaps = (
        hist.select(
            "_bkt",
            F.sum("na_v").over(w).cast("long").alias("_la"),
            F.sum("nb_v").over(w).cast("long").alias("_lb"),
        )
        .join(F.broadcast(offs), "_bkt")
        .select(
            (F.col("_la") + F.col("_off_na_v")).alias("cum_a"),
            (F.col("_lb") + F.col("_off_nb_v")).alias("cum_b"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return gaps.select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a").cast(d38) * F.col("n_b")
            - F.col("cum_b").cast(d38) * F.col("n_a")
        ).alias("num"),
    ).groupBy("n_a", "n_b").agg(
        F.max("num").cast("double").alias("ks_num")
    ).select(
        "n_a",
        "n_b",
        "ks_num",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("ks_num")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                ),
                6,
            ),
        ).alias("ks_stat"),
    )
