"""Semantics of DSIR-style importance weighting: target-looking documents
score positive, off-domain documents negative, target-OOV tokens penalize."""

from __future__ import annotations

import math

import pytest
import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(
        [
            (0, "spark engine spark engine spark"),  # pure target vocab
            (1, "zebra yak zebra llama yak"),  # pure off-domain vocab
            (2, "spark engine zebra"),  # mixed
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100, "spark engine spark"), (101, "engine spark engine")],
        ["doc_id", "text"],
    )
    return raw, target


def test_importance_weights_sign_and_ranking(corpora):
    from solana_etl_spark.operators.dsir import importance_weights

    raw, target = corpora
    out = {r.doc_id: r for r in importance_weights(raw, target).collect()}
    assert set(out) == {0, 1, 2}
    # target-vocab doc beats mixed beats off-domain, and signs split
    assert out[0].avg_log_ratio > out[2].avg_log_ratio > out[1].avg_log_ratio
    assert out[0].keep and not out[1].keep
    assert out[0].avg_log_ratio > 0 and out[1].avg_log_ratio < 0


def test_importance_weights_exact_value(corpora):
    from solana_etl_spark.operators.dsir import importance_weights

    raw, target = corpora
    # hand-compute doc 1 ("zebra yak zebra llama yak"): every token is
    # target-OOV → lp_t = log10(1/(6+2)) for all 5 tokens
    # raw LM: 13 tokens, 5 distinct; zebra c=3, yak c=2, llama c=1
    oov_t = round(math.log10(1.0 / 8), 9)
    lp = lambda c: round(math.log10((c + 1.0) / (13 + 5)), 9)
    toks = [3, 2, 3, 1, 2]  # zebra yak zebra llama yak counts
    expected = round(sum(oov_t - lp(c) for c in toks) / 5, 6)
    out = {r.doc_id: r for r in importance_weights(raw, target).collect()}
    assert out[1].avg_log_ratio == expected
    assert out[1].n_tokens == 5
