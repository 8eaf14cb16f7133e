"""Embedding-space decontamination semantics (the n-gram overlap check is
covered by the decontam gate queries + the registry oracle)."""

from __future__ import annotations


def test_semantic_contamination_flags_planted_neardup(spark):
    """A corpus vector planted equal to an eval vector scores cosine 1.0
    and is flagged; orthogonal vectors score 0 and are not."""
    from solana_etl_spark.operators.decontam import semantic_contamination

    def vec(*idx):
        v = [0.0] * 8
        for i in idx:
            v[i] = 1.0
        return v

    corpus = spark.createDataFrame(
        [(1, vec(0)), (2, vec(1)), (3, vec(2))],
        "vec_id long, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [(100, vec(0)), (101, vec(3))], "vec_id long, embedding array<float>"
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_contamination(corpus, ev, threshold=0.9).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["max_eval_cos"] == 1.0
    assert not rows[2]["contaminated"] and rows[2]["max_eval_cos"] == 0.0
    assert not rows[3]["contaminated"]


def test_semantic_contamination_empty_eval_fails_loudly(spark):
    """An empty eval set must raise, not silently return contaminated=false
    (fail-open decontamination; reviewed bug)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from solana_etl_spark.operators.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    empty = corpus.filter("vec_id < 0")
    with pytest.raises(SparkRuntimeException, match="empty eval set"):
        semantic_contamination(corpus, empty).collect()
