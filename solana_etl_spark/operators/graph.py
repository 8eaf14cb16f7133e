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


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count by degree-ordered edge orientation (the
    classic scalable formulation: Cohen 2009 / Suri & Vassilvitskii's
    MR triangle counting).

    Every undirected edge is directed from its lower-RANKED endpoint to the
    higher, ranking nodes by (degree, id). Each triangle then has exactly
    ONE wedge centered at its lowest-ranked vertex, so counting =
    wedge-join (two oriented edges sharing a source) matched against the
    closing oriented edge — and because out-degrees under this orientation
    are bounded by O(sqrt(|E|)) for any graph, the wedge stream (the plan's
    only super-linear intermediate) is bounded by O(|E|^1.5) with no
    hot-vertex blowup; orienting by raw id instead leaves a star graph
    generating O(n^2) wedges at its hub.

    Output: one row (n_nodes, n_edges, n_triangles). Integer-exact; the
    oracle is the naive a<b<c three-way self-join, which counts the same
    triangles orientation-free."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # rank = (degree, id) as a sortable struct; broadcast (node-cardinality,
    # small next to the edge list at scale — swap for a join if dims grow)
    da = deg.select(
        F.col("n").alias("_na"), F.struct(F.col("d"), F.col("n")).alias("_ra")
    )
    db = deg.select(
        F.col("n").alias("_nb"), F.struct(F.col("d"), F.col("n")).alias("_rb")
    )
    oriented = (
        und.join(F.broadcast(da), und["a"] == F.col("_na"))
        .join(F.broadcast(db), und["b"] == F.col("_nb"))
        .select(
            F.when(F.col("_ra") < F.col("_rb"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("lo"),
            F.when(F.col("_ra") < F.col("_rb"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("hi"),
        )
    )
    e1 = oriented.select(F.col("lo").alias("w"), F.col("hi").alias("x"))
    e2 = oriented.select(F.col("lo").alias("w2"), F.col("hi").alias("y"))
    wedges = e1.join(e2, (F.col("w") == F.col("w2")) & (F.col("x") < F.col("y"))).select(
        "w", "x", "y"
    )
    closing = oriented.select(
        F.least("lo", "hi").alias("cx"), F.greatest("lo", "hi").alias("cy")
    )
    tri = wedges.join(
        closing,
        (F.least("x", "y") == F.col("cx")) & (F.greatest("x", "y") == F.col("cy")),
    )
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(und.agg(F.count(F.lit(1)).alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )
