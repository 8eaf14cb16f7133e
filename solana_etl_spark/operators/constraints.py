"""Declarative data-quality constraints: deequ/dbt-style checks compiled
into the fewest possible passes.

A pipeline feeding a 100 TB corpus gates every ingest on constraints
(not-null keys, accepted values, ranges, key uniqueness, referential
integrity). Naively that is one job per rule; at scale it must be:

* all ROW-LEVEL rules (not_null / in_range / accepted_values / custom
  predicate) fold into ONE wide conditional aggregate over a single scan;
* UNIQUE is one (key-grouped count>1) aggregate per key set;
* FOREIGN KEY is one anti-join counting orphans (parent side distinct
  keys, broadcast when small).

``validate`` returns the standard report — one row per rule:
(rule, column, n_rows, n_violations, passed) — the artifact a scheduler
gates on. The reference validates nothing (malformed input is routed to
an error table — our S11/ST3 path); declarative constraints are charter
scale machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    rule: str
    column: str
    violation: Column | None = None  # row-level: True where violated
    unique_cols: list[str] = field(default_factory=list)
    fk_parent: DataFrame | None = None
    fk_parent_col: str | None = None


def not_null(col: str) -> Check:
    return Check("not_null", col, F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(
        "in_range", col, ~F.col(col).between(F.lit(lo), F.lit(hi))
    )


def accepted_values(col: str, values: list) -> Check:
    return Check(
        "accepted_values",
        col,
        F.col(col).isNotNull() & ~F.col(col).isin(*values),
    )


def satisfies(name: str, col: str, predicate: Column) -> Check:
    """Custom row predicate: ``predicate`` True = row OK."""
    return Check(name, col, ~predicate)


def unique(cols: list[str]) -> Check:
    return Check("unique", ",".join(cols), unique_cols=list(cols))


def foreign_key(col: str, parent: DataFrame, parent_col: str) -> Check:
    return Check(
        "foreign_key", col, fk_parent=parent, fk_parent_col=parent_col
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One report row per check: (rule, column, n_rows, n_violations,
    passed). Row-level checks share a single scan/aggregate."""
    row_checks = [c for c in checks if c.violation is not None]
    reports: list[DataFrame] = []

    if row_checks:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(c.violation.cast("long")).alias(f"v{i}")
            for i, c in enumerate(row_checks)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{c.rule}', '{c.column}', v{i}" for i, c in enumerate(row_checks)
        )
        reports.append(
            wide.select(
                F.expr(
                    f"stack({len(row_checks)}, {stack}) AS (rule, column, n_violations)"
                ),
                "n_rows",
            ).select("rule", "column", "n_rows", "n_violations")
        )

    for c in checks:
        if c.unique_cols:
            dup = (
                df.groupBy(*c.unique_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
            )
            reports.append(
                dup.agg(
                    F.coalesce(F.sum("_n"), F.lit(0)).alias("n_violations")
                ).select(
                    F.lit(c.rule).alias("rule"),
                    F.lit(c.column).alias("column"),
                    F.lit(None).cast("long").alias("n_rows"),
                    F.col("n_violations").cast("long"),
                )
            )
        elif c.fk_parent is not None:
            parents = c.fk_parent.select(
                F.col(c.fk_parent_col).alias(c.column)
            ).distinct()
            orphans = df.filter(F.col(c.column).isNotNull()).join(
                F.broadcast(parents), c.column, "left_anti"
            )
            reports.append(
                orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
                    F.lit(c.rule).alias("rule"),
                    F.lit(c.column).alias("column"),
                    F.lit(None).cast("long").alias("n_rows"),
                    F.col("n_violations").cast("long"),
                )
            )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        "column",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
