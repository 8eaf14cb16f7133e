"""DSIR-style importance weighting for targeted data selection
[Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"]: score every raw document by how much more likely its tokens
are under a TARGET-domain language model than under the raw-corpus model,
then keep the high-ratio documents — "select web text that looks like the
target domain" as one relational job.

DSIR's estimator is a likelihood ratio over hashed n-gram features; the
distributed mechanics live here with the same add-one unigram LM family as
operators/lm.py (the feature model is pluggable — anything trainable as a
(feature, log_prob) table slots in):

* **two LM trainings** — target and raw — each ONE map-side-combined
  token-count aggregate (lm.py's shape); both LM tables are Zipf-bounded.
* **scoring** explodes raw tokens once and left-joins both LMs on the
  token (broadcast while vocabs fit); per-token log-ratio
  ``log10 p_target − log10 p_raw``; target-OOV tokens take the smoothed
  unseen probability (they are evidence AGAINST target membership).
* **determinism**: per-token log10 values round at 9 decimals, the
  per-document sum runs as exact DECIMAL — identical on any partitioning
  and in the DuckDB oracle (same discipline as lm.py).

At 100 TB the raw-side LM trains on the full corpus in one aggregate (or
a hash_sample for speed — the estimator only needs proposal-distribution
coverage); selection composes with sampling.mixture_sample for the
resampling step (keep-probability ∝ exp(weight/T)). The deterministic
``keep`` here is the threshold variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.operators.lm import (
    _LP_TYPE,
    _doc_tokens,
    smoothed_log_prob,
    unigram_counts,
)


def _lm_and_oov(docs: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame]:
    """((tok, lp), 1-row (oov)): add-one unigram log10 LM plus its smoothed
    unseen-token log-prob, both from lm.py's ONE smoothing definition
    (``smoothed_log_prob``; ``c=0`` is the unseen event) — the oov stays a
    1-row DataFrame (broadcast, never collected) so the whole weight
    computation is one lazy plan."""
    counts, totals = unigram_counts(docs, text_col)
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        smoothed_log_prob(F.col("c"), F.col("n"), F.col("v")).alias("lp"),
    )
    oov = totals.select(
        smoothed_log_prob(F.lit(0), F.col("n"), F.col("v")).alias("oov")
    )
    return lm, oov


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """(doc_id, n_tokens, avg_log_ratio, keep) for every raw document:
    ``avg_log_ratio`` is the mean per-token ``log10 p_target − log10
    p_raw`` (rounded at 6), ``keep`` thresholds it. Positive = the
    document's token distribution is closer to the target domain than to
    the raw corpus.

    Tokens unseen by the TARGET LM take its smoothed unseen log-prob;
    tokens unseen by the RAW LM (possible when scoring documents outside
    the raw training set) symmetrically take the raw model's. Both OOV
    scalars ride along as broadcast 1-row joins — nothing collects."""
    lm_t, oov_t = _lm_and_oov(target, text_col)
    lm_r, oov_r = _lm_and_oov(raw, text_col)
    toks = _doc_tokens(raw, text_col)
    lr = F.coalesce(F.col("lp_t"), F.col("oov_t")).cast(_LP_TYPE) - F.coalesce(
        F.col("lp_r"), F.col("oov_r")
    ).cast(_LP_TYPE)
    # fold both 1-row OOV scalars into ONE 1-row frame first (1×1 cross),
    # so the corpus-sized token stream takes a single constant-side join
    oovs = oov_t.withColumnRenamed("oov", "oov_t").crossJoin(
        oov_r.withColumnRenamed("oov", "oov_r")
    )
    scored = (
        toks.join(
            F.broadcast(lm_t.withColumnRenamed("lp", "lp_t")), "tok", "left"
        )
        .join(F.broadcast(lm_r.withColumnRenamed("lp", "lp_r")), "tok", "left")
        .crossJoin(F.broadcast(oovs))
        .select("doc_id", lr.alias("lr"))
    )
    avg = F.round(
        F.sum("lr").cast("double") / F.count(F.lit(1)), 6
    ).alias("avg_log_ratio")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), avg
    ).withColumn("keep", F.col("avg_log_ratio") > threshold)
