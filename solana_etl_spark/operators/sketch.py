"""Bounded-memory frequent-items (heavy hitters): Misra-Gries candidates
verified by one exact counting pass.

``skew.hot_keys`` is the exact report — one (key, partial_count) shuffle.
That is the right plan while the DISTINCT-key count fits a shuffle; on a
100 TB corpus with ~10^11 distinct keys (URLs, n-grams) even the combined
map-side output is a full shuffle of every distinct key. This operator is
the classic two-phase alternative whose shuffle is O(candidates), not
O(distinct keys):

1. **Candidate phase** — each partition runs a Misra-Gries summary
   [Misra & Gries 1982] with k = ceil(1/phi) counters (bounded memory,
   one Arrow-batched pass via ``mapInPandas``). MG guarantees every item
   with frequency > phi * n_partition survives its partition summary, so
   the union of partition candidates is a SUPERSET of every global item
   with frequency > phi * N. Only ~k rows leave each partition.
2. **Exact phase** — candidates are collected (≤ k * n_partitions rows,
   driver-small by construction), broadcast back as a semi-join filter,
   and counted EXACTLY in one aggregation over only the candidate rows.

The final output — items with exact count >= threshold — is therefore
deterministic and independent of partitioning, task retries, or the MG
internals (the sketch only ever filters, never counts), which is what
makes a sketch-assisted operator oracle-checkable: the DuckDB oracle is
the plain ``GROUP BY ... HAVING count >= threshold``.

Caveat (declared): phi must satisfy threshold >= phi * N, else the
superset guarantee does not cover the requested threshold; the operator
raises rather than silently under-reporting.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(key_col: str, k: int):
    """Per-partition Misra-Gries: keep at most k counters; decrement-all
    on overflow. Emits surviving keys (candidate superset)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all; drop zeros (amortized O(1)/item)
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({key_col: list(counters.keys())})

    return run


def frequent_items(
    df: DataFrame,
    key_col: str,
    phi_num: int = 1,
    phi_den: int = 1000,
    min_count: int | None = None,
) -> DataFrame:
    """Exact (key, n_rows) for every key with count >= threshold, found
    with O(phi_den/phi_num) memory per task and a candidate-sized shuffle.

    phi = phi_num/phi_den is an exact rational so the default threshold
    ceil(phi * N) = (phi_num*N + phi_den - 1) div phi_den is pure integer
    math — the same value on any engine, at any scale factor (the
    threshold tracks corpus growth instead of going stale). An explicit
    ``min_count`` must sit at or above the phi boundary (checked — the MG
    superset guarantee covers nothing below it).
    """
    k = math.ceil(phi_den / phi_num)
    candidates = (
        df.select(key_col)
        .mapInPandas(
            _mg_partition(key_col, k),
            schema=f"{key_col} {df.schema[key_col].dataType.simpleString()}",
        )
        .distinct()
    )
    n = df.count()
    boundary = (phi_num * n + phi_den - 1) // phi_den
    threshold = boundary if min_count is None else min_count
    if threshold < boundary:
        raise ValueError(
            f"min_count={threshold} below the MG guarantee boundary "
            f"ceil(phi*N)={boundary}: raise min_count or lower phi"
        )
    # exact verify: count ONLY candidate rows (broadcast semi-join — the
    # candidate set is ≤ k * n_partitions rows by construction)
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= threshold)
    )
