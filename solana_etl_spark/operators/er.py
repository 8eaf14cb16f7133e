"""Entity resolution / record linkage: blocking → bounded pairwise edit
distance → transitive entity clusters.

The classic dedup-across-records problem (same real-world entity, slightly
different spellings). Scale shape, per the standard blocking literature:

* **Blocking** — candidate pairs only form inside a block (here: a name
  prefix; in production any cheap deterministic key — phonetic code,
  sorted-token prefix, zip code). One shuffle on the block key; pair
  volume is Σ_blocks n_b², controlled by block granularity — never the
  corpus-wide N².
* **Match rule** — ``levenshtein(name_a, name_b) <= max_edits``, exact
  integer (both Spark and DuckDB implement plain Levenshtein), evaluated
  only inside blocks.
* **Clustering** — matched pairs feed the same pointer-jumping
  connected-components used by the dedup capstone (O(log diameter)
  rounds); every record gets an ``entity_id`` = min record id of its
  cluster, singletons resolve to themselves.

Everything is integer/string-exact → full value-hash oracle (recursive-CTE
closure on the DuckDB side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.operators.dedup import connected_components

ER_BLOCK_PREFIX = 16  # leading chars of the name forming the block key
ER_MAX_EDITS = 1


def blocked_match_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_prefix: int = ER_BLOCK_PREFIX,
    max_edits: int = ER_MAX_EDITS,
) -> DataFrame:
    """(id_a, id_b, edits) for records in the same block whose names are
    within ``max_edits`` Levenshtein edits (id_a < id_b)."""
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
    record id; singleton records resolve to themselves)."""
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
