"""Lexical (BM25) search and reciprocal-rank fusion — the retrieval
counterpart to the embedding ANN operators in similarity.py.

Scale shape: per-document term frequencies are row-local array expressions
(zero shuffle over the corpus); the corpus statistics BM25 needs (N, avgdl,
per-term document frequency) are ONE tiny global aggregate — |query| + 2
numbers — broadcast back with a cross join. The only corpus-wide movement
is the final top-k (TakeOrderedAndProject). At 100 TB this is a single scan
with a constant-size driver-side state, not an inverted-index build; for a
standing query workload you'd materialize the (term, doc, tf) postings once
(the `dedup_ngram_jaccard` inverted-index pattern) and share it.

Cross-engine determinism (DuckDB oracle): idf and each per-term
contribution are rounded to 9 decimals (the same cross-engine float
boundary lm.py uses for log-probs); the per-document score is a row-local
left-to-right sum of a FIXED number of terms, so addition order is
syntactic and bit-identical — no decimal accumulation needed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.operators.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75
RRF_C = 60  # standard reciprocal-rank-fusion constant
TOPK = 10


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == term))


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-document BM25 score for a fixed bag-of-words query:
    ``(doc_id, bm25_score)`` for every document matching ≥1 term.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  [Robertson/Sparck
    Jones; the formulation Lucene uses]. tf is exact (array filter), df/N/
    avgdl come from one aggregate over the same scan.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.col("text"))
    tfd = documents.select(
        "doc_id",
        F.size(toks).alias("_dl"),
        *[_tf(toks, t).alias(f"_tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = tfd.agg(
        F.count(F.lit(1)).alias("_n"),
        F.round(F.sum("_dl").cast("double") / F.count(F.lit(1)), 9).alias(
            "_avgdl"
        ),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = tfd.crossJoin(F.broadcast(stats))
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    contribs = []
    for i in range(len(query_terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        df = F.col(f"_df_{i}").cast("double")
        n = F.col("_n").cast("double")
        idf = F.round(
            F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)), 9
        )
        norm = F.lit(one_minus_b) + F.lit(b) * (
            F.col("_dl").cast("double") / F.col("_avgdl")
        )
        contribs.append(
            F.round(idf * (tf * F.lit(k1p1)) / (tf + F.lit(k1) * norm), 9)
        )
    score = F.round(reduce(lambda a, c: a + c, contribs), 9)
    return scored.select("doc_id", score.alias("bm25_score")).filter(
        F.col("bm25_score") > 0
    )


def bm25_topk(
    documents: DataFrame, query_terms: list[str], k: int = TOPK
) -> DataFrame:
    """Top-k BM25 documents, deterministic doc_id tie-break; runs as
    TakeOrderedAndProject (no full sort)."""
    return (
        bm25_scores(documents, query_terms)
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(k)
    )


def with_rank(
    scored: DataFrame, score_col: str, id_col: str, rank_col: str = "rank"
) -> DataFrame:
    """(id, rank): 1-based position by (score desc, id asc) — deterministic.

    Returns a DataFrame (not a bare window Column) so the ranking is bound
    to ``scored`` explicitly — a loose global-window Column would silently
    rank whichever relation it was later selected from."""
    return scored.select(
        F.col(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc(score_col), F.asc(id_col)))
        .alias(rank_col),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = RRF_C,
    k: int = TOPK,
) -> DataFrame:
    """Reciprocal-rank fusion [Cormack et al. 2009]: rrf(d) =
    Σ_lists 1/(c + rank_d). Full-outer join of the two (id, rank) lists
    (each top-k-sized — broadcast), missing list membership contributes 0.
    Rank arithmetic is integer; the two reciprocal terms are added in fixed
    syntactic order → bit-identical cross-engine."""
    a = ranked_a.select(
        F.col(id_col).alias("_ida"), F.col(rank_col).alias("_ra")
    )
    b = ranked_b.select(
        F.col(id_col).alias("_idb"), F.col(rank_col).alias("_rb")
    )
    joined = a.join(b, a._ida == b._idb, "full_outer")
    term_a = F.when(
        F.col("_ra").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("_ra"))
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("_rb").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("_rb"))
    ).otherwise(F.lit(0.0))
    return (
        joined.select(
            F.coalesce(F.col("_ida"), F.col("_idb")).alias(id_col),
            F.round(term_a + term_b, 9).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
