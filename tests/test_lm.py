"""Unigram LM perplexity scoring (operators/lm.py): probabilities sum to
one, OOV handling, partitioning determinism, model parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from solana_etl_spark.operators.lm import (
    oov_log_prob,
    score_documents,
    train_unigram_lm,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_lm_matches_hand_model(spark):
    lm = {r.tok: r.log_prob for r in train_unigram_lm(_docs(spark)).collect()}
    toks = [t for _, s in CORPUS for t in s.split()]
    n, v = len(toks), len(set(toks))
    for tok in set(toks):
        want = round(math.log10((toks.count(tok) + 1) / (n + v)), 9)
        assert lm[tok] == want
    # model probabilities reconstruct from the stored (rounded) log-probs
    mass = sum((toks.count(t) + 1) / (n + v) for t in set(toks))
    assert abs(sum(10 ** lm[t] for t in lm) - mass) < 1e-6


def test_scoring_with_oov(spark):
    docs = _docs(spark)
    lm = train_unigram_lm(docs)
    oov = oov_log_prob((17, 10))  # n=17 tokens, v=10 vocab
    probe = spark.createDataFrame(
        [(9, "the zebra")], "doc_id long, text string"
    )
    row = score_documents(probe, lm, oov=oov).first()
    lm_map = {r.tok: float(r.log_prob) for r in lm.collect()}
    want = round((lm_map["the"] + oov) / 2, 6)
    assert row.n_tokens == 2
    assert abs(row.avg_logprob - want) < 1e-9


def test_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    a = sorted(
        tuple(r)
        for r in score_documents(
            docs.repartition(2), train_unigram_lm(docs.repartition(2)), -9.0
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in score_documents(
            docs.repartition(7), train_unigram_lm(docs.repartition(7)), -9.0
        ).collect()
    )
    assert a == b  # bit-equal: decimal sums after the rounding boundary


def test_rarer_docs_score_lower(spark):
    docs = spark.createDataFrame(
        [(1, "common common common common"), (2, "rare1 rare2 rare3 rare4")],
        "doc_id long, text string",
    )
    lm = train_unigram_lm(docs)
    scores = {
        r.doc_id: r.avg_logprob
        for r in score_documents(docs, lm, oov=-9.0).collect()
    }
    assert scores[1] > scores[2]


def test_bigram_lm_penalizes_word_salad(spark):
    """Same unigram bag, scrambled transitions → lower bigram score."""
    from solana_etl_spark.operators.lm import bigram_lm_scores

    fluent = "the cat sat on the mat " * 5
    salad = "mat the on sat cat the " * 2 + "the mat cat on the sat " * 3
    df = spark.createDataFrame(
        [(0, fluent), (1, fluent), (2, fluent), (3, salad)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    # fluent docs share high-count transitions; the salad's are rarer
    assert out[0].avg_logprob > out[3].avg_logprob
    assert out[0].n_transitions == 29


def test_bigram_lm_respects_text_col(spark):
    """text_col must drive BOTH the bigram stream and the vocab count
    (reviewed bug: the bigram n-gram expression hardcoded `text`, so a
    non-default text_col scored transitions from the wrong column)."""
    from solana_etl_spark.operators.lm import bigram_lm_scores

    fluent = "the cat sat on the mat " * 5
    df = spark.createDataFrame(
        [(0, fluent), (1, fluent)], ["doc_id", "body"]
    )
    out = {r.doc_id: r for r in bigram_lm_scores(df, "body").collect()}
    assert out[0].n_transitions == 29
    renamed = {
        r.doc_id: r
        for r in bigram_lm_scores(
            df.withColumnRenamed("body", "text")
        ).collect()
    }
    assert out[0] == renamed[0]
