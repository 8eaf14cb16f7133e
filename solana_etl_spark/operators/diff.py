"""Snapshot diff: added / removed / changed rows between two versions of a
keyed table — the audit half of CDC (operators/merge.py applies changes;
this derives them, e.g. to validate a migration or diff two corpus
snapshots).

Scale shape: each side reduces to (key, row_hash) — the hash is computed
in the scan projection, so the full-outer join shuffles ~24 bytes/row no
matter how wide the table is. Changed/added/removed classify from null
sides and hash inequality; unchanged rows are dropped before any
collection.

The row hash is the repo's md5-based ``hash64`` (defined identically in
Spark and DuckDB SQL), over ``concat_ws`` of the compare columns — cast
columns to deterministic string forms first (ints/strings/dates are safe;
raw doubles stringify differently across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.functions.hashing import hash64

_SEP = "\x01"  # field separator: prevents ("ab","c") == ("a","bc")
_NULL = "\x02"  # NULL sentinel: concat_ws silently DROPS nulls (and their
# separator), so without it ('a', NULL) and (NULL, 'a') hash identically
# and a NULL-involved change is invisible to the diff


def row_signature(compare_cols: list[str]) -> F.Column:
    return hash64(
        F.concat_ws(
            _SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
                for c in compare_cols
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """(key, status ∈ {added, removed, changed}, old_sig, new_sig) — one
    row per key whose content differs between snapshots."""
    o = old.select(
        F.col(key_col).alias("_ko"),
        row_signature(compare_cols).alias("old_sig"),
    )
    n = new.select(
        F.col(key_col).alias("_kn"),
        row_signature(compare_cols).alias("new_sig"),
    )
    joined = o.join(n, o["_ko"] == n["_kn"], "full_outer")
    status = (
        F.when(F.col("_ko").isNull(), F.lit("added"))
        .when(F.col("_kn").isNull(), F.lit("removed"))
        .when(F.col("old_sig") != F.col("new_sig"), F.lit("changed"))
    )
    return (
        joined.select(
            F.coalesce("_ko", "_kn").alias(key_col),
            status.alias("status"),
            "old_sig",
            "new_sig",
        )
        .filter(F.col("status").isNotNull())
    )
