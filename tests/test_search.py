"""BM25 + RRF fusion: value parity against a pure-Python reference
implementation of the textbook formulas, rank ordering, and the
fusion algebra (membership in one list vs both)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from solana_etl_spark.operators.search import (
    BM25_B,
    BM25_K1,
    RRF_C,
    bm25_scores,
    bm25_topk,
    rrf_fuse,
    with_rank,
)

_CORPUS = [
    (0, "spark join spark table"),
    (1, "vector stream vector vector"),
    (2, "the quick brown fox"),
    (3, "spark vector stream join spark"),
    (4, "join join join join join join"),
]
_TERMS = ["spark", "vector"]


def _py_bm25(corpus, terms, k1=BM25_K1, b=BM25_B):
    docs = {d: t.lower().split() for d, t in corpus}
    n = len(docs)
    avgdl = round(sum(len(t) for t in docs.values()) / n, 9)
    out = {}
    for d, toks in docs.items():
        score = 0.0
        for term in terms:
            tf = float(toks.count(term))
            df = float(sum(1 for t in docs.values() if term in t))
            idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 9)
            norm = (1.0 - b) + b * (len(toks) / avgdl)
            score += round(idf * (tf * (k1 + 1.0)) / (tf + k1 * norm), 9)
        if round(score, 9) > 0:
            out[d] = round(score, 9)
    return out


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bm25_score"]
        for r in bm25_scores(df, _TERMS).collect()
    }
    assert got == _py_bm25(_CORPUS, _TERMS)


def test_bm25_topk_order_and_tiebreak(spark):
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    ref = _py_bm25(_CORPUS, _TERMS)
    want = [d for d, _ in sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))]
    got = [r["doc_id"] for r in bm25_topk(df, _TERMS, k=3).collect()]
    assert got == want[:3]
    # doc 2 has no query term: never retrieved
    assert 2 not in got and 2 not in ref


def test_rrf_fusion_membership_algebra(spark):
    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(11, 1), (12, 2), (13, 3)], ["doc_id", "rank"]
    )
    got = {
        r["doc_id"]: r["rrf_score"] for r in rrf_fuse(a, b, k=10).collect()
    }
    c = RRF_C
    want = {
        10: round(1.0 / (c + 1), 9),  # only list a
        11: round(1.0 / (c + 2) + 1.0 / (c + 1), 9),  # both
        12: round(1.0 / (c + 3) + 1.0 / (c + 2), 9),  # both
        13: round(1.0 / (c + 3), 9),  # only list b
    }
    assert got == want
    # consensus docs outrank single-list docs here
    top = max(got, key=lambda d: (got[d], -d))
    assert top == 11


def test_with_rank_is_deterministic_on_ties(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 1.0)], ["doc_id", "s"]
    )
    ranked = with_rank(df, "s", "doc_id")
    got = {r["doc_id"]: r["rank"] for r in ranked.collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_bm25_rare_term_outweighs_common_term(spark):
    # 'vector' appears in 2 docs, 'join' in 3 → for equal tf/dl the rarer
    # term must contribute more (idf monotonicity sanity)
    df = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    only_vector = {
        r["doc_id"]: r["bm25_score"]
        for r in bm25_scores(df, ["vector"]).collect()
    }
    only_join = {
        r["doc_id"]: r["bm25_score"]
        for r in bm25_scores(df, ["join"]).collect()
    }
    # doc 3 has tf=1 for both terms and identical dl: direct comparison
    assert only_vector[3] > only_join[3]
