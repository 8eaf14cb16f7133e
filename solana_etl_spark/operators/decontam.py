"""Train/test decontamination (charter §2.11 extension): flag training
documents that share word n-grams with a held-out evaluation corpus — the
standard benchmark-leakage check an LLM training-data pipeline runs before
shipping a corpus (n-gram overlap decontamination, as popularized by the
GPT-3/PaLM data papers).

Scale shape: the eval corpus' distinct gram-hash set is tiny relative to the
training corpus (benchmarks are thousands of documents, corpora are
billions), so the probe side is BROADCAST — the training side is one
explode + broadcast hash-join + per-doc count, a single narrow shuffle keyed
by doc_id (partial counts map-side). No training-corpus self-join, no
all-pairs anything; linear in corpus size at any scale.

Grams are hashed with the cross-engine md5 family (functions/hashing.py),
so the whole check has a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.functions.hashing import hash64
from solana_etl_spark.operators.text import tokens

DECONTAM_NGRAM_N = 5  # word n-gram length (5-gram overlap ≈ PaLM's 8/SeqLen heuristic at this doc size)


def word_ngram_hashes(text: Column, n: int = DECONTAM_NGRAM_N) -> Column:
    """Distinct 64-bit hashes of the word n-grams of ``text`` (whitespace
    tokens of lowercased text, space-joined). Pure per-row expressions."""
    toks = tokens(text)
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty, and
    # slice() rejects start=0 — docs shorter than n tokens must yield an
    # empty gram array, not an error
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.transform(grams, hash64))


def contamination(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = DECONTAM_NGRAM_N,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-training-document overlap with the eval corpus.

    Returns doc_id, n_grams (distinct grams in the doc), n_overlap (how many
    also occur anywhere in ``eval_docs``), is_contaminated
    (n_overlap ≥ min_overlap). Keeps every training row (zero-filled), so the
    caller can either drop or audit.
    """
    from solana_etl_spark.functions.parallelism import ensure_compute_parallelism

    # the md5 5-gram hashing is the expensive per-row expression and the
    # corpus often arrives in 1-2 parquet partitions — repartition up to
    # core count or the whole decontam pass runs single-threaded
    # (measured: 74 s -> seconds at 50k docs)
    probe = (
        ensure_compute_parallelism(eval_docs)
        .select(F.explode(word_ngram_hashes(F.col("text"), n)).alias("g"))
        .distinct()
    )
    doc_grams = ensure_compute_parallelism(documents).select(
        "doc_id", word_ngram_hashes(F.col("text"), n).alias("_grams")
    )
    overlap = (
        doc_grams.select("doc_id", F.explode("_grams").alias("g"))
        .join(F.broadcast(probe), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        doc_grams.select("doc_id", F.size("_grams").cast("long").alias("n_grams"))
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "is_contaminated"
            ),
        )
    )


SEMANTIC_CONTAM_THRESHOLD = 0.9


def semantic_contamination(
    corpus_vecs: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = SEMANTIC_CONTAM_THRESHOLD,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose cosine
    against ANY held-out eval vector reaches ``threshold`` — the semantic
    companion to the n-gram overlap check above (paraphrased benchmark
    leakage shares no 5-gram but sits next to the eval item in embedding
    space).

    Scale shape: same asymmetry as the n-gram check — the eval set is
    thousands of rows while the corpus is billions, so the normalized eval
    side is BROADCAST and the corpus streams through one embarrassingly
    parallel scan (corpus × eval nested-loop with a bounded inner side,
    then a per-vector max that partial-aggregates map-side). No corpus
    self-join; linear in corpus size. Vectors are normalized ONCE per side
    (similarity.normalized), so each pair costs a single dot product.

    Returns every corpus row: (vec_id, max_eval_cos, contaminated). The
    corpus×eval pairing is a LEFT join on a true condition, so corpus rows
    survive an empty eval side — and then fail the job in-plan via
    raise_error rather than report contaminated=false for everything (an
    empty eval set means decontamination is silently disabled — the
    fail-open a cleaning pipeline must never hide; a NULL corpus
    embedding trips the same guard). Same discipline as
    sampling.weighted_sample's weight guard.
    """
    from solana_etl_spark.operators.similarity import _dot, normalized

    a = normalized(corpus_vecs).select("vec_id", F.col("_nemb").alias("_va"))
    b = normalized(eval_vecs).select(F.col("_nemb").alias("_vb"))
    cos = F.round(_dot(F.col("_va"), F.col("_vb")), 6)
    guarded_max = F.coalesce(
        F.max(cos),
        F.raise_error(
            F.concat(
                F.lit(
                    "semantic_contamination: no eval cosine for vec_id="
                ),
                F.col("vec_id").cast("string"),
                F.lit(" (empty eval set or NULL embedding) — failing "
                      "instead of silently skipping decontamination"),
            )
        ).cast("double"),
    )
    return (
        a.join(F.broadcast(b), F.lit(True), "left")
        .groupBy("vec_id")
        .agg(guarded_max.alias("max_eval_cos"))
        .select(
            "vec_id",
            "max_eval_cos",
            (F.col("max_eval_cos") >= threshold).alias("contaminated"),
        )
    )
