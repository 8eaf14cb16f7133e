"""Fluent corpus-pipeline facade: the operator library composed as one
chainable builder, so a training-data pipeline reads as its recipe:

    CorpusPipeline(docs)
        .quality_filter()
        .drop_repetitive()
        .dedup_exact()
        .dedup_near()
        .decontaminate(eval_docs)
        .sample(rate_bp=5_000)
        .df

Each step narrows the SAME lazy DataFrame — nothing executes until an
action, so Catalyst sees the whole chain as one plan and fuses the
per-row predicate stages (quality, repetition, sampling) into a single
scan. The heavy steps (near-dedup, decontamination) keep their documented
shuffle shapes from the underlying operators; the facade adds no
collect(), no caching, no extra exchanges.

`pipeline_clean_corpus` (queries.py) is the oracle-checked instance of
the quality → exact-dedup → near-dedup prefix of this chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.operators import dedup, text as text_ops
from solana_etl_spark.operators.sampling import hash_sample


class CorpusPipeline:
    """Chainable corpus cleaning over a ``documents(doc_id, text, ...)``
    DataFrame. Every method returns a new pipeline wrapping the narrowed
    DataFrame; ``.df`` exposes the result for plain PySpark composition."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id"):
        self.df = df
        self.id_col = id_col

    def _with(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self.id_col)

    def quality_filter(self) -> "CorpusPipeline":
        """Keep documents passing the heuristic quality gate
        (text.quality_score.is_quality) — per-row, fuses into the scan."""
        keep = text_ops.quality_score(self.df).filter(F.col("is_quality"))
        return self._with(
            self.df.join(keep.select(self.id_col), self.id_col, "left_semi")
        )

    def drop_repetitive(self) -> "CorpusPipeline":
        """Drop Gopher-flagged repetitive documents (text.repetition_stats
        .is_repetitive) — per-row run-length folds, zero shuffle."""
        bad = text_ops.repetition_stats(self.df).filter(
            F.col("is_repetitive")
        )
        return self._with(
            self.df.join(bad.select(self.id_col), self.id_col, "left_anti")
        )

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep one document per distinct normalized content (min id wins)
        — one 16-byte/row hash aggregate."""
        keepers = dedup.exact_dedup(self.df).select(
            F.col("keeper_doc_id").alias(self.id_col)
        )
        return self._with(self.df.join(keepers, self.id_col, "left_semi"))

    def dedup_near(self) -> "CorpusPipeline":
        """Drop MinHash-LSH near-duplicates via the linear drop set (no
        pair materialization) — one shuffle keyed by (band, signature)."""
        drops = dedup.lsh_duplicate_ids(self.df).select(
            F.col("doc_id").alias(self.id_col)
        )
        return self._with(self.df.join(drops, self.id_col, "left_anti"))

    def decontaminate(self, eval_docs: DataFrame) -> "CorpusPipeline":
        """Drop documents sharing a word-5-gram with the (broadcast-sized)
        eval corpus — benchmark-leakage removal, linear in corpus size."""
        from solana_etl_spark.operators.decontam import contamination

        bad = (
            contamination(self.df, eval_docs)
            .filter(F.col("is_contaminated"))
            .select(F.col("doc_id").alias(self.id_col))
        )
        return self._with(self.df.join(bad, self.id_col, "left_anti"))

    def sample(self, rate_bp: int) -> "CorpusPipeline":
        """Deterministic hash-Bernoulli downsample (rate in basis points)
        — stateless per-row predicate, retry-safe."""
        return self._with(hash_sample(self.df, self.id_col, rate_bp))

    def pack(self, budget: int = 2048, group_cols=("lang",)) -> DataFrame:
        """Terminal step: concat-and-chunk the surviving documents into
        fixed token-budget model sequences (operators/packing.py)."""
        from solana_etl_spark.operators.packing import pack_sequences

        return pack_sequences(self.df, budget=budget, group_cols=group_cols)
