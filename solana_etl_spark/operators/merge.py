"""CDC MERGE / upsert: apply a changeset to a base snapshot.

A 100 TB corpus is not rebuilt — it is *maintained*: nightly crawls upsert
re-fetched documents, takedown lists delete rows, dedup verdicts revise
keeper flags. Lakehouse engines spell this ``MERGE INTO``; plain Spark over
parquet has no built-in, so this operator provides the same semantics as a
DataFrame plan with the scale-correct physical shape:

* ``merge_snapshot(strategy='broadcast')`` — the common case (changeset ≪
  base). The changeset alone is shuffled (one window to pick the latest
  change per key); the base is reduced to survivors via a **broadcast
  left-anti join on the changed keys** — the 100 TB side is scanned once
  and never shuffled, wholly inside whole-stage codegen.
* ``strategy='shuffle'`` — changeset comparable to base: union both sides
  tagged, one shuffle on key, latest-version-wins window. Identical output.

Semantics (latest-writer-wins, the Delta/Iceberg ``MERGE`` contract):
each change row carries ``op`` ('U' upsert / 'D' delete) and a
``version``; per key the highest (version, op) wins — ties broken on op so
a delete issued at the same version as an update wins deterministically.
A winning 'U' replaces (or inserts) the row; a winning 'D' removes it.

The reference's sinks are append-only (`/root/reference/src/load/
FileOutput.py:40-53` — per-file CSV/parquet writes, no key maintenance);
this is Spark-first scale machinery per the charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
    strategy: str = "broadcast",
) -> DataFrame:
    """Next snapshot = base ⊕ changes (latest-writer-wins per key).

    ``changes`` must carry every ``base`` column plus ``op_col`` and
    ``version_col``. Output schema == base schema. ``strategy`` picks the
    physical plan only — results are identical.
    """
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"strategy must be broadcast|shuffle, got {strategy!r}")
    missing = [c for c in base.columns + [op_col, version_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    # ties on version resolve delete-over-update (desc on op puts 'U' > 'D'
    # lexically, so order by op asc after version desc ranks 'D' first —
    # spell it explicitly so the contract survives other op labels); a
    # final whole-row hash makes even duplicate (key, version, op) change
    # rows pick the SAME winner on every partitioning and retry
    is_delete = (F.col(op_col) == delete_op).cast("int")
    canon_cols = sorted(base.columns + [op_col, version_col])
    row_hash = F.xxhash64(F.struct(*[F.col(c) for c in canon_cols]))
    latest_w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), is_delete.desc(), row_hash.asc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(latest_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if strategy == "broadcast":
        changed_keys = latest.select(*keys)  # one row per key post-window
        survivors = base.join(F.broadcast(changed_keys), keys, "left_anti")
        upserts = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
        return survivors.unionByName(upserts)

    # shuffle strategy: tag base rows as version -inf updates, reuse the
    # same latest-wins window over the union — one shuffle on key, no
    # broadcast (for changesets too large to collect key sets from)
    tagged_base = base.withColumn(op_col, F.lit("U")).withColumn(
        version_col, F.lit(None).cast(changes.schema[version_col].dataType)
    )
    unioned = tagged_base.unionByName(changes.select(*tagged_base.columns))
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc_nulls_last(), is_delete.desc(), row_hash.asc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .select(*base.columns)
    )
