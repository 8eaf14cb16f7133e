"""CorpusPipeline facade: each stage equals its underlying operator, the
chain composes lazily (one plan), and the cleaned corpus matches a
hand-computed expectation on a crafted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_spark.corpus import CorpusPipeline

_GOOD = (
    "the quick brown fox jumps over a lazy dog near the quiet river "
    "while seventeen violet zeppelins hover above the distant mountain"
)

_DOCS = [
    (0, _GOOD),                                  # survives everything
    (1, _GOOD),                                  # exact dup of 0 -> dropped
    (2, "spam " * 40),                           # repetitive -> dropped
    (3, "x"),                                    # fails quality (too short)
    (4, _GOOD + " extra tail words here today"), # near-dup of 0 (LSH)
    (
        5,
        "completely different content about the architecture of analytic "
        "database engines and their vectorized execution pipelines in the "
        "modern data stack with a number of elaborations to pass quality",
    ),
]


def _pipe(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return CorpusPipeline(df)


def test_stage_equivalence_quality(spark):
    from solana_etl_spark.operators.text import quality_score

    p = _pipe(spark)
    want = {
        r["doc_id"]
        for r in quality_score(p.df).filter("is_quality").collect()
    }
    got = {r["doc_id"] for r in p.quality_filter().df.collect()}
    assert got == want and 3 not in got


def test_chain_drops_each_category(spark):
    cleaned = (
        _pipe(spark)
        .quality_filter()
        .drop_repetitive()
        .dedup_exact()
        .dedup_near()
        .df
    )
    ids = {r["doc_id"] for r in cleaned.collect()}
    assert 3 not in ids  # quality
    assert 2 not in ids  # repetitive
    assert 1 not in ids  # exact dup (doc 0 kept as min id)
    assert 0 in ids and 5 in ids


def test_decontaminate_removes_eval_overlap(spark):
    eval_docs = spark.createDataFrame(
        [(100, "seventeen violet zeppelins hover above the distant mountain")],
        ["doc_id", "text"],
    )
    p = _pipe(spark).decontaminate(eval_docs)
    ids = {r["doc_id"] for r in p.df.collect()}
    assert 0 not in ids and 1 not in ids and 4 not in ids  # share 5-grams
    assert 5 in ids  # disjoint content survives


def test_sample_is_deterministic(spark):
    p = _pipe(spark)
    a = {r["doc_id"] for r in p.sample(5000).df.collect()}
    b = {r["doc_id"] for r in p.sample(5000).df.collect()}
    assert a == b  # hash sampling never flickers across runs


def test_chain_is_one_lazy_plan(spark):
    import contextlib
    import io

    chain = _pipe(spark).quality_filter().drop_repetitive().sample(9000).df
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chain.explain("formatted")
    # the per-row stages fuse: no exchange introduced by the facade itself
    assert "Exchange hashpartitioning" not in buf.getvalue()
