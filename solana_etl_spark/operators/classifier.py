"""Model-based quality filtering: train a logistic-regression document
scorer ON the cluster, score with pure column expressions.

Production pipelines (CCNet, fastText-style quality filters) gate a corpus
with a small linear model. At 100 TB both halves must be distributed:

* **inference** is a dot product + sigmoid over a per-row feature vector —
  plain column arithmetic, codegen'd, zero shuffle, linear scan;
* **training** (full-batch gradient descent) is one aggregate per
  iteration: every row contributes ``(σ(w·x) − y)·x``; the cluster reduces
  the gradient, the driver applies the step (the only driver state is the
  weight vector, exactly like parameter-server/fairseq trainers).

Determinism: float sums depend on reduction order, so re-running on a
different partitioning would train a (slightly) different model. Gradient
components are therefore rounded per-row to 12 decimals and summed as
DECIMAL(38,12) — exact, associative, partitioning-independent: the same
data trains the SAME model bits on 8 cores or 8,000 (and task retries
can't skew a step).

Features are deterministic text statistics (length, punctuation/digit/
stopword ratios — the quality_score family in operators/text.py). The
reference has no model surface; charter LLM-pipeline machinery.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.operators.text import EN_STOPWORDS, tokens

N_FEATURES = 6  # bias + 5 text statistics
_GRAD_DECIMALS = 12
_GRAD_TYPE = "decimal(38,12)"


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc → fixed-width feature vector (index 0 is the bias term). Ratios
    are rounded to 9 decimals so the feature vector itself is
    cross-engine/partitioning reproducible."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(F.trim(t))
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    stops = F.size(F.filter(toks, lambda x: F.lower(x).isin(*EN_STOPWORDS)))

    def ratio(num: Column, den: Column) -> Column:
        return F.round(num / F.greatest(den, F.lit(1)), 9)

    return docs.withColumn(
        "features",
        F.array(
            F.lit(1.0),
            ratio(n_chars, F.lit(1000)),  # length scale
            ratio(n_tokens, F.lit(200)),
            ratio(punct, n_chars),
            ratio(digits, n_chars),
            ratio(stops, n_tokens),
        ).cast("array<double>"),
    )


def linear_score(features: Column, weights: list[float]) -> Column:
    """w·x as a SEQUENTIAL left fold (index order), the same associativity
    DuckDB's list_reduce uses — bit-identical cross-engine."""
    w = F.array(*[F.lit(float(v)) for v in weights])
    return F.aggregate(
        F.zip_with(features, w, lambda x, wi: x * wi),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def predict(
    docs: DataFrame, weights: list[float], features_col: str = "features"
) -> DataFrame:
    z = linear_score(F.col(features_col), weights)
    return docs.withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def train_logreg(
    df: DataFrame,
    label_col: str = "label",
    features_col: str = "features",
    lr: float = 1.0,
    n_iters: int = 50,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch GD; returns the learned weight vector. One cluster
    aggregate per iteration, exact-decimal gradient reduction."""
    n_features = len(df.select(features_col).first()[0])
    df = df.select(
        F.col(features_col).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    ).persist()
    try:
        n_rows = df.count()  # also materializes the persist
        w = [0.0] * n_features
        for _ in range(n_iters):
            z = linear_score(F.col("x"), w)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("y")
            sums = df.agg(
                *[
                    F.sum(
                        F.round(err * F.element_at("x", j + 1), _GRAD_DECIMALS)
                        .cast(_GRAD_TYPE)
                    ).alias(f"g{j}")
                    for j in range(n_features)
                ]
            ).first()
            w = [
                wj - lr * (float(sums[j]) / n_rows + l2 * wj)
                for j, wj in enumerate(w)
            ]
        return w
    finally:
        df.unpersist()


def log_loss(
    df: DataFrame,
    weights: list[float],
    label_col: str = "label",
    features_col: str = "features",
) -> float:
    z = linear_score(F.col(features_col), weights)
    y = F.col(label_col).cast("double")
    # numerically stable: log(1+exp(-|z|)) + max(z,0) - y*z
    loss = (
        F.log(F.lit(1.0) + F.exp(-F.abs(z)))
        + F.greatest(z, F.lit(0.0))
        - y * z
    )
    total, n = df.agg(F.sum(loss), F.count(F.lit(1))).first()
    return float(total) / n if n else math.nan
