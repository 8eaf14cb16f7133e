"""Skew-mitigation primitives for hot-key joins and aggregations.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.py`) handles *sort-merge* skew by splitting oversized partitions,
but it cannot help when (a) the skewed side feeds a non-SMJ plan, (b) the
skew is in an aggregation rather than a join, or (c) runtime stats arrive
too late (first shuffle already spilled). These operators make the
mitigation explicit and deterministic, the way a 100 TB pipeline wants it:

* ``salted_join`` — fact⋈dim equi-join where the fact side has hot keys and
  the dim side is too big to broadcast: replicate dim rows across
  ``n_salts`` salt values, salt fact rows deterministically, join on
  (key, salt). A key holding 20% of 100 TB becomes ``n_salts`` tasks
  instead of one straggler. Salt is ``xxhash64`` of the whole fact row —
  retry-safe (no ``rand()``/partition-id nondeterminism; a re-executed task
  salts identically, so shuffle-retry never duplicates or drops rows).
* ``two_phase_count_distinct`` — exact COUNT(DISTINCT v) per key without a
  single hot reducer: phase 1 reduces on (key, v) — the value spreads hot
  keys across the cluster — phase 2 counts rows per key, both with map-side
  partial aggregation.
* ``hot_keys`` — the sampling-free hot-key report (exact counts over the
  keys, partial-agg'd) used to pick ``n_salts`` / decide which keys need
  isolation.

The reference has no analog (single-process dask never shuffles by key:
`/root/reference/src/load/FileOutput.py:40-53` parallelizes by *file*);
this is Spark-first scale machinery per the charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SALT_COL = "__salt"


def hot_keys(df: DataFrame, keys: list[str], min_rows: int = 100_000) -> DataFrame:
    """Exact per-key row counts ≥ min_rows, descending — the skew report.

    One shuffle of (key, partial_count); map-side combine makes the hot key
    itself cheap to count (its billions of rows reduce to one row per map
    task before the exchange).
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
        .orderBy(F.desc("n_rows"))
    )


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join on ``on`` with identical results to
    ``facts.join(dims, on, how)`` for how in {inner, left}.

    The dim side is replicated ``n_salts``× (an ``explode`` of a literal
    range — n_salts·|dims| rows, the price of eliminating the straggler);
    the fact side gets a deterministic salt in [0, n_salts) hashed from the
    whole row, so each hot key's rows spread over ``n_salts`` reducers. Join
    key becomes (key..., salt): same semantics, bounded per-task fan-in.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if SALT_COL in facts.columns or SALT_COL in dims.columns:
        raise ValueError(
            f"input already has a {SALT_COL!r} column; salting would "
            "silently clobber it"
        )
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in facts.columns])), F.lit(n_salts)
    ).cast("int")
    salted_facts = facts.withColumn(SALT_COL, salt)
    salted_dims = dims.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts.join(salted_dims, on + [SALT_COL], how).drop(SALT_COL)


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY keys, shuffling on (keys, value)
    first so a hot key's distinct set is deduplicated across the cluster
    instead of on one reducer.

    Equivalent to ``df.groupBy(keys).agg(countDistinct(value))`` (which
    plans a single Expand+regroup where the final reduce for a hot key is
    one task); here phase 1's reduce key includes the value, so hot-key
    work is spread in proportion to its distinct-value count. NULL parity
    with countDistinct: NULL values are not counted, but a key whose values
    are ALL NULL still appears (count 0) — the NULL group survives phase 1
    to carry the key, and phase 2 counts only non-null groups.
    """
    phase1 = df.select(*keys, value).groupBy(*keys, value).agg(F.lit(1))
    return phase1.groupBy(*keys).agg(
        F.count(F.col(value)).alias(alias)
    )
