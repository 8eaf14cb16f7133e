"""Entity resolution / record linkage: blocking → bounded pairwise edit
distance → transitive entity clusters.

The classic dedup-across-records problem (same real-world entity, slightly
different spellings). Scale shape, per the standard blocking literature:

* **Blocking** — candidate pairs only form inside a block. Two schemes:

  - ``match_pairs_1edit`` (the default path): *deletion-neighborhood*
    blocking (FastSS) — every name emits its ``len+1`` single-character-
    deletion variants (plus itself) as block keys; two names within one
    edit of each other PROVABLY share a variant, so recall is EXACT for
    ``max_edits = 1``. Cost: one shuffle of ``O(N·len)`` short keys —
    linear in the corpus, never N².
  - ``blocked_match_pairs``: name-prefix blocking for ``max_edits > 1``.
    RECALL CONTRACT: a pair whose edit falls inside the first
    ``block_prefix`` characters lands in different blocks and is MISSED —
    the standard blocking recall trade-off. Use it only when that bound
    is acceptable (or union several keys: phonetic code, sorted-token,
    suffix).

* **Match rule** — ``levenshtein(name_a, name_b) <= max_edits``, exact
  integer (both Spark and DuckDB implement plain Levenshtein), evaluated
  only inside blocks. (Deletion-variant collisions only guarantee
  distance ≤ 2, so the verify filter is still required.)
* **Clustering** — matched pairs feed the same pointer-jumping
  connected-components used by the dedup capstone (O(log diameter)
  rounds); every record gets an ``entity_id`` = min record id of its
  cluster, singletons resolve to themselves.

Everything is integer/string-exact → full value-hash oracle; because the
default path is exact, the oracle is the blocking-INDEPENDENT ground truth
(all pairs within one edit), not a mirror of the blocking scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.operators.dedup import connected_components

ER_BLOCK_PREFIX = 16  # leading chars of the name forming the block key
ER_MAX_EDITS = 1


def _deletion_variant_sides(records: DataFrame, id_col: str, name_col: str):
    """(id, name, variant) with one row per single-char-deletion variant of
    the name, plus the name itself. NULL names emit nothing (NULL is never
    within bounded edit distance of anything)."""
    nm = F.col("_nm")
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(nm)),
        lambda i: F.concat(
            F.substring(nm, F.lit(1), i - 1),
            nm.substr(i + 1, F.length(nm)),
        ),
    )
    # guard: Spark's sequence(1, 0) steps DOWNWARD ([1, 0]) — empty names
    # must produce just the name itself, not garbage variants
    variants = F.array_append(
        F.when(F.length(nm) > 0, deletions).otherwise(
            F.array().cast("array<string>")
        ),
        nm,
    )
    return (
        records.filter(F.col(name_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"))
        .select("_id", "_nm", F.explode(variants).alias("_var"))
    )


def match_pairs_1edit(
    records: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """(id_a, id_b, edits): EVERY pair of records whose names are within ONE
    Levenshtein edit (id_a < id_b) — exact recall, no blocking misses.

    Deletion-neighborhood (FastSS) blocking: a substitution at position i
    makes ``del_i(a) == del_i(b)``; an insertion/deletion makes the shorter
    name itself a variant of the longer — so any 1-edit pair shares a
    variant key. The self-join on the variant key is the only shuffle;
    a pair colliding on several variants is deduped by the final distinct
    (``edits`` is a pure function of the pair, so the triple IS the pair).
    """
    a = _deletion_variant_sides(records, id_col, name_col).select(
        F.col("_id").alias("id_a"),
        F.col("_nm").alias("_nma"),
        F.col("_var").alias("_var"),
    )
    b = _deletion_variant_sides(records, id_col, name_col).select(
        F.col("_id").alias("id_b"),
        F.col("_nm").alias("_nmb"),
        F.col("_var").alias("_varb"),
    )
    return (
        a.join(
            b,
            (F.col("_var") == F.col("_varb")) & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("_nma"), F.col("_nmb")).alias("edits"),
        )
        .filter(F.col("edits") <= 1)
        .distinct()
    )


def blocked_match_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_prefix: int = ER_BLOCK_PREFIX,
    max_edits: int = ER_MAX_EDITS,
) -> DataFrame:
    """(id_a, id_b, edits) for records in the SAME PREFIX BLOCK whose names
    are within ``max_edits`` Levenshtein edits (id_a < id_b).

    RECALL CONTRACT: pairs whose edit falls inside the first
    ``block_prefix`` characters (or whose names are shorter than the
    prefix and differ at all) are in different blocks and are NOT
    returned. For exact recall at ``max_edits = 1`` use
    :func:`match_pairs_1edit` instead."""
    keyed = records.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_nm"),
        F.substring(F.col(name_col), 1, block_prefix).alias("_blk"),
    )
    a = keyed.select(
        F.col("_id").alias("id_a"),
        F.col("_nm").alias("_nma"),
        F.col("_blk").alias("_blka"),
    )
    b = keyed.select(
        F.col("_id").alias("id_b"),
        F.col("_nm").alias("_nmb"),
        F.col("_blk").alias("_blkb"),
    )
    return (
        a.join(
            b,
            (F.col("_blka") == F.col("_blkb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("_nma"), F.col("_nmb")).alias("edits"),
        )
        .filter(F.col("edits") <= max_edits)
    )


def resolve_entities(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_prefix: int = ER_BLOCK_PREFIX,
    max_edits: int = ER_MAX_EDITS,
) -> DataFrame:
    """One row per record with its resolved ``entity_id`` (min linked
    record id; singleton records resolve to themselves).

    ``max_edits = 1`` (the default) takes the exact deletion-neighborhood
    path — no blocking misses. ``max_edits > 1`` falls back to prefix
    blocking and inherits its documented recall contract."""
    if max_edits == 1:
        pairs = match_pairs_1edit(records, id_col, name_col)
    else:
        pairs = blocked_match_pairs(
            records, id_col, name_col, block_prefix, max_edits
        )
    clusters = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("doc_id").alias("_cid"), F.col("cluster_id")
    )
    return (
        records.select(F.col(id_col).alias("rec_id"), F.col(name_col).alias("name"))
        .join(clusters, F.col("rec_id") == F.col("_cid"), "left")
        .select(
            "rec_id",
            "name",
            F.coalesce("cluster_id", F.col("rec_id")).alias("entity_id"),
        )
    )
