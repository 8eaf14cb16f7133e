"""Incremental aggregate maintenance: mergeable per-group state instead of
full recomputes.

A 100 TB rollup is not recomputed nightly — yesterday's aggregate STATE is
merged with today's delta. That works exactly when every statistic is kept
in a mergeable (commutative-monoid) form:

* sum / count / min / max merge trivially (sum of sums, min of mins);
* avg is finalized from (sum, count) — never stored as a ratio;
* distinct counts keep a per-group KMV sketch — the k smallest distinct
  60-bit hashes — whose merge is union→sort→truncate, with a fixed
  relative error (~1/√k) independent of how many deltas were merged.

``agg_state`` builds state from raw rows (one shuffle), ``merge_states``
folds any number of states together (shuffle of state rows only — the raw
100 TB is touched once, ever), ``finalize`` produces the user-facing
aggregate. ``finalize(merge_states(s_a, s_b))`` ≡ aggregating a∪b
directly, which is what the cross-engine oracle asserts.

Money columns should enter as DECIMAL so the sums are exact and
merge-order-independent; the KMV hash is the md5 family from
functions/hashing.py (bit-identical cross-engine).

The reference recomputes per file and only appends
(`/root/reference/src/load/FileOutput.py:40-53`); charter scale machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.functions.hashing import hash64

KMV_K = 128
_HASH_SPACE = 2.0**60


def agg_state(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    minmax_cols: list[str] = (),
    kmv_cols: list[str] = (),
    k: int = KMV_K,
) -> DataFrame:
    """Raw rows → mergeable per-key state. One shuffle on ``keys`` (two for
    the KMV part: its distinct-hash reduce bounds per-group state at k
    before anything is collected — no unbounded collect_set)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"{c}_sum"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    state = df.groupBy(*keys).agg(*aggs)

    for c in kmv_cols:
        hashes = df.select(*keys, hash64(F.col(c).cast("string")).alias("h")).distinct()
        rn = F.row_number().over(Window.partitionBy(*keys).orderBy("h"))
        kmin = (
            hashes.withColumn("_rn", rn)
            .filter(F.col("_rn") <= k)
            .groupBy(*keys)
            .agg(F.array_sort(F.collect_list("h")).alias(f"{c}_kmv"))
        )
        state = state.join(kmin, keys, "left")
    return state


def merge_states(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    minmax_cols: list[str] = (),
    kmv_cols: list[str] = (),
    k: int = KMV_K,
) -> DataFrame:
    """State ⊕ state → state: a groupBy over the unioned state rows —
    yesterday's raw data is never rescanned."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(f"{c}_sum").alias(f"{c}_sum"))
    for c in minmax_cols:
        aggs.append(F.min(f"{c}_min").alias(f"{c}_min"))
        aggs.append(F.max(f"{c}_max").alias(f"{c}_max"))
    for c in kmv_cols:
        aggs.append(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(f"{c}_kmv")))
                ),
                1,
                k,
            ).alias(f"{c}_kmv")
        )
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def kmv_estimate(kmv_col: str, k: int = KMV_K) -> F.Column:
    """Distinct estimate from a per-group KMV array: exact below k, else
    (k−1) / (kth_min / 2^60), rounded to 4 (same formula/rounding as the
    global sketch in operators/sampling.py)."""
    n = F.size(kmv_col)
    kth = F.element_at(kmv_col, k)
    return F.when(n < k, n.cast("double")).otherwise(
        F.round((F.lit(k) - 1) / (kth.cast("double") / F.lit(_HASH_SPACE)), 4)
    )


def maintain_join_append(
    old_result: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame,
    db: DataFrame,
    on,
) -> DataFrame:
    """Incremental JOIN maintenance under append-only deltas (the classic
    delta rule Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB):

        new_result = old_result ∪ (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    The stored ``old_result`` is reused verbatim — A_old ⋈ B_old, the
    dominant term at scale, is NEVER recomputed; each delta term joins a
    (small) delta against a base side, which broadcasts or
    bloom-prunes naturally. Appends only: updates/deletes need retraction
    counts (see merge.py for keyed upserts — the two compose: deltas of a
    keyed table are derived by snapshot_diff, applied by merge).

    Equality with the full recompute over (A_old∪ΔA) ⋈ (B_old∪ΔB) is the
    oracle contract."""
    return (
        old_result.unionByName(da.join(b_old, on))
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )
