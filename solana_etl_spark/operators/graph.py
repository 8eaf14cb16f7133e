"""Iterative graph analytics: PageRank over an edge list.

The reference stubs a graph surface (`/root/reference/src/load/
GraphBuilder.py:14-17`); the S12 edge list (`api.coin_transfer_edges`) and
degree analytics realize the batch side. This module adds the canonical
ITERATIVE algorithm a transfer/link graph pipeline runs — PageRank — as a
fixed-round loop of DataFrame plans, i.e. the Pregel-style pattern every
Spark graph job uses (GraphX/GraphFrames do exactly this under the hood).

Determinism is the hard part of oracle-checking an iterative float
algorithm, so ranks are SCALED INTEGERS (1.0 == 10^12) and every step is
exact int64 math:

* contribution  = rank div outdeg          (integer division)
* next rank     = (1-d)*SCALE + (d_num * sum(contrib)) div d_den

Integer addition is associative/commutative, so ANY partitioning, task
retry, or engine (Spark `div` ≡ DuckDB `//` on non-negative int64) produces
bit-identical ranks — the DuckDB oracle is a recursive CTE running the same
recurrence. Dangling-node mass is dropped (the simple PageRank variant);
ranks therefore need not sum to N*SCALE, which is fine for ranking use.

Scale shapes (100 TB / 10^9-node graph):

* out-degrees: one shuffle, computed once, joined into the edge list once
  (edges side stays partitioned by src across all iterations).
* per iteration: one shuffle to join ranks onto edges by src + one shuffle
  to re-aggregate contributions by dst — the unavoidable Pregel exchange
  pair. The rank vector (one int64 per node) is the ONLY iterating state.
* lineage: each iteration's plan references the previous one; for long
  runs ``checkpoint_every`` truncates lineage with ``localCheckpoint``
  (materializes the ~16-byte/node rank vector, not the edges).
* overflow: total mass ≤ N*SCALE; the d_num multiply bounds intermediate
  values by N*SCALE*d_num < 2^63 for N up to ~10^5 at SCALE=10^12. For
  bigger graphs pass a smaller ``scale`` (e.g. 10^9 → N up to ~10^8) —
  precision trades against node count explicitly, never silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = PAGERANK_SCALE,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Fixed-round scaled-integer PageRank over ``edges`` (src, dst).

    Returns (node, rank) with rank = scaled fixed-point (scale == 1.0).
    Parallel edges count once per occurrence (weight by multiplicity);
    pre-``distinct()`` the edge list for the unweighted variant.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one edge-side join, reused every iteration (persist: the iterating
    # loop must not re-shuffle the — at scale, enormous — edge list)
    e_deg = e.join(outdeg, "src").persist()
    nodes = nodes.persist()

    base = scale - scale * DAMP_NUM // DAMP_DEN  # (1-d)*scale, exact
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for i in range(iterations):
        contribs = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{DAMP_NUM} * coalesce(s, 0L) div {DAMP_DEN}")
                )
                .cast("long")
                .alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_scaled"))
