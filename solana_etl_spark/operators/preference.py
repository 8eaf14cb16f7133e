"""Preference-pair construction for RLHF / DPO data prep.

A preference dataset is rows of (context, chosen, rejected). Given a
corpus with a per-document quality score (here the linear quality model of
operators/classifier.py — any deterministic score column works), this
builds one pair per context group: chosen = the group's best-scoring
document, rejected = its worst, with a positive-margin filter so
degenerate groups (single doc, or no quality separation) emit nothing.

Scale shape: ONE partial-aggregated groupBy — chosen and rejected are
found in the same pass as ``max(struct(z, -id))`` / ``min(struct(z, id))``
(lexicographic struct ordering gives the extreme score with a
deterministic doc-id tie-break, negation flips the tie direction so both
extremes break ties toward the SMALLEST id). Map-side combine reduces the
shuffle to one row per (group, partition); no window, no sort, no
self-join. At 100 TB this is the cheapest possible shape: the shuffle
volume is bounded by group cardinality × partitions, not row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def best_of_n(
    df: DataFrame,
    score: Column,
    group_cols: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Rejection sampling / best-of-n selection: per candidate group keep
    the argmax-score row (smallest id on ties) with the group's candidate
    count and exact score sum — the "sample n, keep the best" step of an
    RLHF / rejection-tuning pipeline, and the acceptance-diagnostics a
    reward-model run reports (mean = sum_z / n_candidates, left to the
    consumer: a rounded mean sits on a TRUE half-way decimal whenever the
    9-decimal sum divides the group size evenly, and engines break round
    half-way ties differently — measured at sf0.1).

    Same single partial-aggregated pass as :func:`preference_pairs`
    (struct-max argmax, no window, no sort); the sum is an exact-decimal
    fold of 9-decimal-rounded scores, identical on any partitioning — a
    naive double SUM would be addition-order-dependent.
    """
    scored = df.select(
        *group_cols, F.col(id_col).cast("long").alias("_id"), score.alias("_z")
    )
    best = F.max(F.struct(F.col("_z").alias("z"), (-F.col("_id")).alias("nid")))
    zsum = F.sum(F.round(F.col("_z"), 9).cast("decimal(28,9)"))
    return (
        scored.groupBy(*group_cols)
        .agg(best.alias("_best"), F.count("*").alias("n_candidates"), zsum.alias("_s"))
        .select(
            *group_cols,
            (-F.col("_best.nid")).alias("best_doc"),
            F.round(F.col("_best.z"), 9).alias("best_z"),
            "n_candidates",
            F.col("_s").cast("double").alias("sum_z"),
        )
    )


def preference_pairs(
    df: DataFrame,
    score: Column,
    group_cols: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """(group cols, chosen_doc, rejected_doc, chosen_z, rejected_z, margin)
    — one row per group with at least two docs and strictly positive
    score separation. Scores are emitted rounded at 9 decimals (the
    cross-engine float boundary); the margin is computed on the raw
    scores, then rounded.

    Deterministic: on score ties, chosen is the smallest doc id among the
    max-score docs, rejected the smallest among the min-score docs.
    """
    scored = df.select(
        *group_cols, F.col(id_col).cast("long").alias("_id"), score.alias("_z")
    )
    best = F.max(F.struct(F.col("_z").alias("z"), (-F.col("_id")).alias("nid")))
    worst = F.min(F.struct(F.col("_z").alias("z"), F.col("_id").alias("id")))
    agg = scored.groupBy(*group_cols).agg(
        best.alias("_best"), worst.alias("_worst"), F.count("*").alias("_n")
    )
    margin = F.col("_best.z") - F.col("_worst.z")
    return (
        agg.filter((F.col("_n") >= 2) & (margin > 0.0))
        .select(
            *group_cols,
            (-F.col("_best.nid")).alias("chosen_doc"),
            F.col("_worst.id").alias("rejected_doc"),
            F.round(F.col("_best.z"), 9).alias("chosen_z"),
            F.round(F.col("_worst.z"), 9).alias("rejected_z"),
            F.round(margin, 9).alias("margin"),
        )
    )
