"""PageRank operator: semantics vs a pure-Python reference of the same
scaled-integer recurrence, parallel-edge weighting, and lineage
truncation via localCheckpoint."""

from __future__ import annotations

from collections import Counter

from solana_etl_spark.operators.graph import PAGERANK_SCALE, pagerank


def _py_pagerank(edges, iterations, scale=PAGERANK_SCALE):
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outdeg = Counter(s for s, _ in edges)
    base = scale - scale * 85 // 100
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        r = {
            n: base
            + 85 * sum(r[s] // outdeg[s] for s, d in edges if d == n) // 100
            for n in nodes
        }
    return r


def test_pagerank_matches_python_reference(spark):
    # cycle + dangling sink + hub: covers in-degree-0, out-degree-0, and
    # multi-in-edge nodes
    edges = [
        ("a", "b"),
        ("b", "c"),
        ("c", "a"),
        ("a", "d"),
        ("e", "d"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        row["node"]: row["rank_scaled"]
        for row in pagerank(df, iterations=4).collect()
    }
    assert got == _py_pagerank(edges, 4)


def test_pagerank_parallel_edges_weight_by_multiplicity(spark):
    # a->b twice, a->c once: b gets 2/3 of a's mass (integer-div per edge)
    edges = [("a", "b"), ("a", "b"), ("a", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        row["node"]: row["rank_scaled"]
        for row in pagerank(df, iterations=1).collect()
    }
    base = PAGERANK_SCALE - PAGERANK_SCALE * 85 // 100
    per_edge = PAGERANK_SCALE // 3
    assert got["b"] == base + 85 * (2 * per_edge) // 100
    assert got["c"] == base + 85 * per_edge // 100
    assert got["a"] == base


def test_pagerank_checkpoint_path_identical(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    plain = sorted(
        map(tuple, pagerank(df, iterations=5, checkpoint_every=100).collect())
    )
    ckpt = sorted(
        map(tuple, pagerank(df, iterations=5, checkpoint_every=2).collect())
    )
    assert plain == ckpt


def test_pagerank_partitioning_invariant(spark):
    # exact int math: 1 partition vs many must be bit-identical
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 50}") for i in range(200)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    one = sorted(map(tuple, pagerank(df.coalesce(1), iterations=3).collect()))
    many = sorted(
        map(tuple, pagerank(df.repartition(16), iterations=3).collect())
    )
    assert one == many
