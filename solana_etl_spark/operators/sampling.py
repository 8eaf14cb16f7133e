"""Deterministic sampling and sketching for training-data pipelines
(charter §2.11) — the operations a 100 TB corpus build runs constantly:
reproducible held-out splits, per-stratum data mixing, and cheap
cardinality estimates.

Everything here is keyed on the cross-engine hash family
(functions/hashing.py), NOT on ``rand()``:

* re-running the pipeline (or re-running one failed partition — Spark task
  retries!) selects the SAME rows; ``rand()``-based sampling silently
  breaks exactly-once semantics under retries;
* train/held-out membership is a pure function of the row key, so
  downstream jobs can recompute it without a membership table;
* every operator is value-checkable against DuckDB (same md5 math).

Scale shapes: hash_sample is a stateless per-row filter (pushdown-friendly,
zero shuffle). stratified_sample is one window per stratum key (single
shuffle). kmv_distinct is a distinct + global top-k (TakeOrdered — partial
per-partition top-k, no full sort), the classic KMV sketch [Bar-Yossef et
al. 2002] whose estimate, unlike HLL implementations, is bit-reproducible
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.functions.hashing import hash64

# hash_sample buckets: rate is expressed in 1/10000ths for exact integer
# comparison (no float thresholds)
SAMPLE_DENOM = 10000


def sample_bucket(key: Column) -> Column:
    """Stable bucket in [0, SAMPLE_DENOM) for a row key (any type — hashed
    via its canonical string form, identical in DuckDB)."""
    return hash64(key.cast("string")) % SAMPLE_DENOM


def hash_sample(df: DataFrame, key_col: str, rate_bp: int) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes into the
    first ``rate_bp`` of SAMPLE_DENOM buckets (rate_bp=500 → 5%). Stateless
    per-row predicate — no shuffle, survives task retries, and the same
    key always lands on the same side of a train/eval split."""
    return df.filter(sample_bucket(F.col(key_col)) < rate_bp)


def stratified_sample(
    df: DataFrame, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — the data-mixing
    primitive (e.g. equal documents per language/source). Selection order
    is the hash of the key → reproducible, unbiased within stratum, and
    one window (single shuffle on the strata key)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash64(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count sketch: keep the k smallest distinct
    60-bit hashes of ``col``; estimate = (k−1) / (kth_min / 2^60).

    Scale shape: one distinct shuffle on the hash, then TakeOrdered (each
    partition contributes its local k smallest — never a global sort).
    Returns one row: (n_hashes, kth_hash, est_distinct). When the true
    cardinality is < k the estimate is exact (= n_hashes).
    """
    hashes = df.select(hash64(F.col(col).cast("string")).alias("h")).distinct()
    kmin = hashes.orderBy("h").limit(k)
    return kmin.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_hashes",
        "kth_hash",
        F.when(
            F.col("n_hashes") < k, F.col("n_hashes").cast("double")
        )
        .otherwise(
            F.round(
                (F.lit(k) - 1)
                / (F.col("kth_hash").cast("double") / F.lit(2.0 ** 60)),
                4,
            )
        )
        .alias("est_distinct"),
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    rates_bp: dict[str, int],
    stratum_col: str = "source",
    default_bp: int = 0,
) -> DataFrame:
    """Per-stratum rate mixing: keep each row with its stratum's probability
    (in 1/10000ths) — THE mixture-weighting step of a corpus build ("keep
    100% of wiki, 15% of crawl"). Same deterministic hash-bucket predicate
    as :func:`hash_sample`, just with a per-stratum rate: stateless,
    zero-shuffle, retry-safe, and membership is recomputable from the key.
    """
    rate = None
    for stratum, bp in sorted(rates_bp.items()):
        cond = F.col(stratum_col) == stratum
        rate = F.when(cond, bp) if rate is None else rate.when(cond, bp)
    rate = F.lit(default_bp) if rate is None else rate.otherwise(default_bp)
    return df.filter(sample_bucket(F.col(key_col)) < rate)


def quantile_bins(
    df: DataFrame, score_col: str, key_col: str, n_bins: int = 10
) -> DataFrame:
    """Assign each row an exact quantile bin of ``score_col`` (1..n_bins) —
    curriculum/quality binning. NTILE semantics over the total order with
    the row key as tiebreak, so the binning is deterministic and
    cross-engine reproducible (percentile sketches are not) — computed as
    the two-phase row_number + closed-form ntile reconstruction
    (operators/prefix.py), so no unpartitioned corpus-grain window: the
    dominant cost is one range-bucketed partitioned window. The split
    sampling runs ``df``'s plan once extra — persist upstream when it is
    expensive."""
    from solana_etl_spark.operators.prefix import (
        ntile_from_rank,
        two_phase_row_number,
    )

    ranked = two_phase_row_number(
        df,
        score_col,
        [F.asc(score_col), F.asc(key_col)],
        out_col="_qb_rn",
    )
    # row count from the INPUT, not the ranked plan — the window/join
    # preserve rows, and this keeps the count aggregate off the heavier
    # two-phase lineage
    cnt = df.agg(F.count(F.lit(1)).alias("_qb_n"))
    return (
        ranked.crossJoin(F.broadcast(cnt))
        .withColumn(
            "bin",
            ntile_from_rank(
                F.col("_qb_rn"), F.col("_qb_n"), n_bins
            ).cast("int"),
        )
        .drop("_qb_rn", "_qb_n")
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    train_bp: int = 8000,
    val_bp: int = 1000,
) -> DataFrame:
    """Deterministic corpus split: adds a ``split`` column
    ('train'/'val'/'test') from the key's hash bucket — train gets the
    first ``train_bp`` of SAMPLE_DENOM buckets, val the next ``val_bp``,
    test the rest.

    The split is a pure function of the key: stateless per-row predicate
    (zero shuffle, survives retries), recomputable by any downstream job
    without a membership table, and a given document NEVER migrates between
    splits as the corpus grows — the leakage guarantee row-number splits
    can't give.
    """
    b = sample_bucket(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(b < train_bp, "train")
        .when(b < train_bp + val_bp, "val")
        .otherwise("test"),
    )


def corpus_shuffle(
    df: DataFrame, key_col: str, n_shards: int
) -> DataFrame:
    """Deterministic pseudo-random TRAINING ORDER: adds ``shard`` (which
    output shard the row lands in) and ``pos`` (its position within the
    shard). Global order = read shards 0..n-1, each in pos order.

    shard = hash64(key) % n_shards; pos = rank within the shard by
    (hash64(key), key). Scale shape: the only shuffle is the per-shard
    window (keyed by shard — parallel across shards, never a global sort);
    a training job reading shard files in (shard, pos) order sees a
    reproducible hash-random permutation of the corpus. Pure function of
    row keys: re-runs, retries, and different partitionings all produce
    the identical order — the property epoch-seeded `rand()` shuffles
    can't give. (For multiple epochs, salt the key with the epoch number.)
    """
    h = hash64(F.col(key_col).cast("string"))  # 60-bit, always positive
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )


def temperature_rates_bp(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
    budget_rows: int | None = None,
) -> dict[str, int]:
    """mC4/mT5-style temperature sampling rates: stratum g is drawn with
    probability ∝ n_g^alpha (alpha<1 upweights small languages/sources).
    Returns per-stratum keep rates in basis points for
    :func:`mixture_sample`.

    Two modes: with no ``budget_rows``, the exact temperature distribution
    anchored at the smallest stratum (it keeps 100%, every other stratum
    downsamples so kept rows ∝ n^alpha). With a ``budget_rows`` target,
    water-filling: strata whose proportional draw exceeds their size cap
    at 100% and their leftover budget re-splits among the rest, so the
    expected total hits the budget instead of silently undershooting.

    One tiny count aggregate; the rate map is driver state exactly like a
    trained model's weights. Rates cannot exceed 10000 bp (can't keep more
    than 100% — repeat-sampling is a loader concern).
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return {}
    total = sum(counts.values())
    if budget_rows is None:
        # pure re-balancing: keep rates proportional to n^(alpha-1),
        # max-normalized — the smallest stratum keeps 100%, the head is
        # downsampled toward the temperature distribution
        m = max(n ** (alpha - 1) for n in counts.values())
        return {
            g: min(10_000, int(round(n ** (alpha - 1) / m * 10_000)))
            for g, n in sorted(counts.items())
        }
    budget = min(total, budget_rows)
    # water-filling: a stratum whose proportional draw exceeds its size is
    # capped at 100% and its leftover budget re-splits among the uncapped
    # (otherwise caps silently strand budget and the output undershoots)
    capped: dict[str, int] = {}
    remaining = dict(counts)
    while remaining:
        z = sum(n**alpha for n in remaining.values())
        open_budget = budget - sum(capped.values())
        newly = {
            g: n
            for g, n in remaining.items()
            if open_budget * (n**alpha / z) >= n
        }
        if not newly:
            break
        capped.update(newly)
        for g in newly:
            del remaining[g]
    z = sum(n**alpha for n in remaining.values())
    open_budget = budget - sum(capped.values())
    rates = {g: 10_000 for g in capped}
    for g, n in sorted(remaining.items()):
        expected = open_budget * (n**alpha / z)
        rates[g] = min(10_000, int(round(expected / n * 10_000)))
    return rates


# weighted-sample key precision: u is derived from the hash at this denom,
# keys round at 9 decimals (the cross-engine float boundary)
WEIGHTED_DENOM = 2**40


def es_key(key: Column, weight: Column) -> Column:
    """Efraimidis-Spirakis weighted-sampling key: k = ln(u)/w with
    deterministic u ∈ (0, 1] derived from the row-key hash. Taking the
    TOP-n rows by DESCENDING k (k is negative; larger = closer to 0) is an
    exact weighted sample without replacement — heavier rows win more
    often, but any row can win, and the whole draw is a pure function of
    row content (retry-safe, cross-engine-reproducible).

    Float discipline: u = (h+1)/2^40 and ln(u)/w round at 9 decimals —
    both engines compute the identical double.

    Weight contract: weights must be strictly positive. A weight ≤ 0 (or
    NULL) has no valid ES key — dividing by it would yield NULL (silently
    sorting last in Spark but engine-dependent elsewhere) or an inverted
    draw — so the key is NULL'd explicitly and :func:`weighted_sample`
    raises before sampling rather than skewing the draw silently."""
    u = (hash64(key.cast("string")) % F.lit(WEIGHTED_DENOM) + F.lit(1)) / (
        F.lit(WEIGHTED_DENOM).cast("double")
    )
    return F.when(weight > 0, F.round(F.log(u) / weight, 9))


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, n: int
) -> DataFrame:
    """Top-n weighted sample without replacement [Efraimidis & Spirakis
    2006]: order by the ES key descending (deterministic key tie-break),
    keep n. Runs as TakeOrderedAndProject — per-partition partial top-n,
    no global sort. Weights must be > 0; a non-positive or NULL weight
    fails the job in-plan via raise_error (fail loudly, never skew the
    sample silently — and no extra validation pass over the data)."""
    guarded = F.coalesce(
        es_key(F.col(key_col), F.col(weight_col)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample: undefined ES key ('{weight_col}' <= 0"
                    f"/NULL, or NULL '{key_col}') at {key_col}="
                ),
                F.col(key_col).cast("string"),
            )
        ).cast("double"),
    )
    keyed = df.withColumn("_es", guarded)
    return keyed.orderBy(F.desc("_es"), F.asc(key_col)).limit(n).drop("_es")


def epoch_upsample(
    df: DataFrame, key_col: str, group_col: str, factors_bp: dict[str, int]
) -> DataFrame:
    """Per-source repetition factors — the pre-training mixing recipe in
    its up-sampling form ("books x3, web x0.5"): each row is emitted
    ``factor`` times, where ``factor`` is a basis-point rate per group
    (25000 bp = 2.5x). The integer part duplicates unconditionally; the
    fractional part keeps one extra copy for a deterministic hash-chosen
    ``frac`` of rows (so the EXPECTED multiplicity is exact and the
    realized copy set is reproducible under retries).

    Output: input rows + ``epoch`` (1-based copy index) — the downstream
    shuffle/pack stages treat (key, epoch) as the row identity, so
    repeated copies spread across shards instead of clumping.

    Scale shape: pure per-row explode of a <= ceil(factor)-element
    sequence, zero shuffle, factors broadcast as a literal CASE (recipes
    list a handful of sources; for thousands of groups broadcast-join a
    factors table instead). Down-sampling (factor < 1) composes from the
    same rule: 0 full copies + fractional keep == hash_sample.
    """
    factor = None
    for g, bp in sorted(factors_bp.items()):
        branch = F.lit(bp)
        factor = (
            F.when(F.col(group_col) == g, branch)
            if factor is None
            else factor.when(F.col(group_col) == g, branch)
        )
    factor = factor.otherwise(F.lit(SAMPLE_DENOM))  # default 1.0x
    n_full = F.floor(factor / SAMPLE_DENOM).cast("int")
    frac_bp = (factor % SAMPLE_DENOM).cast("long")
    with_f = df.withColumn("_nf", n_full).withColumn("_fbp", frac_bp)
    exploded = with_f.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.col("_nf") + 1))
    )
    frac_key = F.concat(
        F.col(key_col).cast("string"), F.lit(":"), F.col("epoch").cast("string")
    )
    keep = (F.col("epoch") <= F.col("_nf")) | (
        (hash64(frac_key) % SAMPLE_DENOM) < F.col("_fbp")
    )
    return exploded.filter(keep).drop("_nf", "_fbp")


DRAW_BUCKETS = 256


def categorical_draws(
    counts: DataFrame,
    key_col: str,
    weight_col: str,
    n_draws: int,
    n_buckets: int = DRAW_BUCKETS,
) -> DataFrame:
    """Deterministic inverse-CDF draws from a categorical distribution —
    the negative-sampling-table primitive (draw tokens ∝ frequency, items
    ∝ any integer weight): draw i lands on the item whose cumulative
    weight interval contains ``hash(i) mod total``. ALL-integer math —
    no float CDF, so no cross-engine rounding surface and every draw is a
    pure function of (i, weight table): retry-safe and reproducible.

    Shape: the cumulative sum is ONE global window over the ITEM table
    (vocab-bounded — Zipf keeps it small regardless of corpus size; this
    is the same bounded-vocab argument as lm.py), then the draw→item
    lookup is a bucketized range join (the rangejoin.py strategy on an
    integer domain): items explode to the fixed-width weight buckets they
    cover, each draw maps to exactly one bucket, hash equi-join + exact
    containment filter emits exactly one item per draw. Zero-weight items
    are excluded up front (empty interval, and their bucket sequence
    would be descending)."""
    w = Window.orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        counts.select(
            key_col, F.col(weight_col).cast("long").alias("_w")
        )
        .filter(F.col("_w") > 0)
        .withColumn("cum_end", F.sum("_w").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("_w"))
    )
    total = cum.agg(F.max("cum_end").alias("_total"))
    bsize = F.expr(f"(_total + {n_buckets - 1}) div {n_buckets}")
    items = (
        cum.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "cum_start",
            "cum_end",
            F.explode(
                F.sequence(
                    F.expr(f"cum_start div ((_total + {n_buckets - 1}) div {n_buckets})"),
                    F.expr(
                        f"(cum_end - 1) div ((_total + {n_buckets - 1}) div {n_buckets})"
                    ),
                )
            ).alias("_bucket"),
        )
    )
    draws = (
        counts.sparkSession.range(n_draws)
        .crossJoin(F.broadcast(total))
        .select(
            F.col("id").alias("draw_id"),
            F.pmod(hash64(F.col("id").cast("string")), F.col("_total")).alias(
                "_t"
            ),
            bsize.alias("_b"),
        )
        .select(
            "draw_id", "_t", F.expr("_t div _b").alias("_bucket")
        )
    )
    return (
        draws.join(items, "_bucket")
        .filter((F.col("_t") >= F.col("cum_start")) & (F.col("_t") < F.col("cum_end")))
        .select("draw_id", key_col)
    )
