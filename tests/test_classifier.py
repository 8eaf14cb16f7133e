"""Distributed logistic-regression quality scorer: reference parity with a
numpy implementation of the identical GD, bit-determinism across
partitionings, and end-to-end text featurize→train→filter."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from solana_etl_spark.operators.classifier import (
    featurize,
    linear_score,
    log_loss,
    predict,
    train_logreg,
)

# deterministic synthetic 2-feature dataset (plus bias): y = x1 + x2 > 1
ROWS = [
    (
        [1.0, round((i * 37 % 100) / 100, 2), round((i * 61 % 100) / 100, 2)],
        1 if ((i * 37 % 100) / 100 + (i * 61 % 100) / 100) > 1.0 else 0,
    )
    for i in range(200)
]


def _ref_train(rows, lr=1.0, n_iters=50):
    # same algorithm, same per-row gradient rounding, exact accumulation
    from decimal import Decimal

    n = len(rows)
    w = [0.0] * 3
    for _ in range(n_iters):
        grads = [Decimal(0)] * 3
        for x, y in rows:
            z = 0.0
            for xi, wi in zip(x, w):  # same left-fold order
                z += xi * wi
            p = 1.0 / (1.0 + math.exp(-z))
            for j in range(3):
                g = (p - y) * x[j]
                grads[j] += Decimal(f"{round(g, 12):.12f}")
        w = [wj - lr * (float(grads[j]) / n) for j, wj in enumerate(w)]
    return w


def test_train_matches_numpy_reference(spark):
    df = spark.createDataFrame(ROWS, "features array<double>, label int")
    got = train_logreg(df, n_iters=25)
    want = _ref_train(ROWS, n_iters=25)
    assert all(abs(g - w) < 1e-9 for g, w in zip(got, want))


def test_train_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(ROWS, "features array<double>, label int")
    w3 = train_logreg(df.repartition(3), n_iters=10)
    w7 = train_logreg(df.repartition(7), n_iters=10)
    assert w3 == w7  # bit-equal, not approximately


def test_training_learns_the_separator(spark):
    df = spark.createDataFrame(ROWS, "features array<double>, label int")
    w0 = [0.0, 0.0, 0.0]
    w = train_logreg(df, lr=2.0, n_iters=150)
    assert log_loss(df, w) < log_loss(df, w0)
    scored = predict(df, w)
    acc = scored.filter(
        ((F.col("score") > 0.5).cast("int")) == F.col("label")
    ).count() / len(ROWS)
    assert acc > 0.95


def test_featurize_known_document(spark):
    docs = spark.createDataFrame(
        [("d1", "The quick brown fox, it is 42 years old.")],
        "doc_id string, text string",
    )
    feats = featurize(docs).select("features").first()[0]
    assert feats[0] == 1.0
    assert len(feats) == 6
    assert feats[1] == round(40 / 1000, 9)  # trimmed length
    assert feats[2] == round(9 / 200, 9)  # token count
    # punct: ',' and '.'; digits: '4','2'
    assert feats[3] == round(2 / 40, 9)
    assert feats[4] == round(2 / 40, 9)


def test_linear_score_sequential_fold(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "features array<double>")
    z = df.select(linear_score(F.col("features"), [0.5, 0.25, -1.0])).first()[0]
    assert z == 1.0 * 0.5 + 2.0 * 0.25 + 3.0 * -1.0
