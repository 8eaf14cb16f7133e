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
action. The per-row stages (quality, repetition, sampling) apply as BARE
filter predicates, so they genuinely fuse into one scan (plan-guard
tested); only the stages that need corpus-wide state (exact dedup's
keeper set, LSH's drop set, decontamination's probe join) introduce their
documented shuffles, each re-scanning the narrowed corpus exactly once as
a semi/anti-join side. The facade adds no collect(), no caching.

The input must be a ``documents(doc_id, text, ...)``-shaped DataFrame —
the underlying operators key on ``doc_id`` (alias your id column first).

`pipeline_clean_corpus` (queries.py) is the oracle-checked instance of
the quality → exact-dedup → near-dedup prefix of this chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solana_etl_spark.operators import dedup, text as text_ops
from solana_etl_spark.operators.sampling import hash_sample

_ID = "doc_id"


class CorpusPipeline:
    """Chainable corpus cleaning over a ``documents(doc_id, text, ...)``
    DataFrame. Every method returns a new pipeline wrapping the narrowed
    DataFrame; ``.df`` exposes the result for plain PySpark composition."""

    def __init__(self, df: DataFrame):
        self.df = df

    def _with(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df)

    def quality_filter(self) -> "CorpusPipeline":
        """Keep documents passing the heuristic quality gate — a bare
        per-row predicate (text.quality_predicate): fuses into the scan,
        no join, no second corpus reference."""
        return self._with(self.df.filter(text_ops.quality_predicate()))

    def drop_repetitive(self) -> "CorpusPipeline":
        """Drop Gopher-flagged repetitive documents — a bare per-row
        predicate (text.repetitive_predicate): run-length folds inline in
        the same scan, zero shuffle."""
        return self._with(self.df.filter(~text_ops.repetitive_predicate()))

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep one document per distinct normalized content (min id wins)
        — one 16-byte/row hash aggregate + a semi-join back."""
        keepers = dedup.exact_dedup(self.df).select(
            F.col("keeper_doc_id").alias(_ID)
        )
        return self._with(self.df.join(keepers, _ID, "left_semi"))

    def dedup_near(self) -> "CorpusPipeline":
        """Drop MinHash-LSH near-duplicates via the linear drop set (no
        pair materialization) — one shuffle keyed by (band, signature)."""
        drops = dedup.lsh_duplicate_ids(self.df).select(_ID)
        return self._with(self.df.join(drops, _ID, "left_anti"))

    def decontaminate(self, eval_docs: DataFrame) -> "CorpusPipeline":
        """Drop documents sharing a word-5-gram with the (broadcast-sized)
        eval corpus — benchmark-leakage removal, linear in corpus size."""
        from solana_etl_spark.operators.decontam import contamination

        bad = (
            contamination(self.df, eval_docs)
            .filter(F.col("is_contaminated"))
            .select(_ID)
        )
        return self._with(self.df.join(bad, _ID, "left_anti"))

    def decontaminate_semantic(
        self,
        vectors: DataFrame,
        eval_vectors: DataFrame,
        threshold: float | None = None,
    ) -> "CorpusPipeline":
        """Drop documents whose embedding sits within ``threshold`` cosine
        of ANY eval vector (paraphrased leakage the n-gram check misses).
        ``vectors``/``eval_vectors`` are ``(doc_id, embedding)``-shaped;
        the normalized eval side broadcasts, the corpus side streams once
        (operators/decontam.py:semantic_contamination)."""
        from solana_etl_spark.operators.decontam import (
            SEMANTIC_CONTAM_THRESHOLD,
            semantic_contamination,
        )

        flagged = (
            semantic_contamination(
                vectors.select(F.col(_ID).alias("vec_id"), "embedding"),
                eval_vectors.select(F.col(_ID).alias("vec_id"), "embedding"),
                threshold=(
                    SEMANTIC_CONTAM_THRESHOLD if threshold is None else threshold
                ),
            )
            .filter(F.col("contaminated"))
            .select(F.col("vec_id").alias(_ID))
        )
        return self._with(self.df.join(flagged, _ID, "left_anti"))

    def strip_dup_spans(self, w: int | None = None) -> "CorpusPipeline":
        """Rewrite each document with its exact duplicated substrings
        removed (Lee et al. 2022 span dedup — dedup.strip_duplicated_spans):
        ``text`` becomes the stripped text, and the original token /
        dup-token accounting rides along as ``n_tokens_orig`` /
        ``n_dup_tokens``. Documents with zero duplicated spans keep their
        ORIGINAL text byte-for-byte — the stripped reconstruction is
        lowercased and whitespace-collapsed, a lossy normalization that
        must only apply where a span was actually removed. Span detection
        adds its documented hash-count shuffle; the strip itself is
        per-row."""
        from solana_etl_spark.operators.dedup import SPAN_W, strip_duplicated_spans

        stripped = strip_duplicated_spans(
            self.df, w=SPAN_W if w is None else w
        ).select(
            _ID,
            F.col("n_tokens").alias("n_tokens_orig"),
            "n_dup_tokens",
            F.col("text_stripped").alias("_text_stripped"),
        )
        keep = [c for c in self.df.columns if c != "text"]
        return self._with(
            self.df.join(stripped, _ID)
            .select(
                *keep,
                F.when(F.col("n_dup_tokens") == 0, F.col("text"))
                .otherwise(F.col("_text_stripped"))
                .alias("text"),
                "n_tokens_orig",
                "n_dup_tokens",
            )
        )

    def drop_script_outliers(self, max_other_frac: float = 0.2) -> "CorpusPipeline":
        """Drop documents whose non-script character fraction exceeds the
        threshold (mojibake / binary spills / emoji floods) — a bare
        per-row predicate over text.SCRIPT_CLASSES counts, fusing into the
        scan like the other per-row gates."""
        n = F.length(F.col("text"))
        denom = F.greatest(n, F.lit(1))
        counted = sum(
            F.regexp_count(F.col("text"), F.lit(cls))
            for cls in text_ops.SCRIPT_CLASSES.values()
        )
        return self._with(
            self.df.filter((n - counted) / denom <= max_other_frac)
        )

    def sample(self, rate_bp: int) -> "CorpusPipeline":
        """Deterministic hash-Bernoulli downsample (rate in basis points)
        — stateless per-row predicate, retry-safe."""
        return self._with(hash_sample(self.df, _ID, rate_bp))

    def tokenize(self, merges: list[tuple[str, str]]) -> "CorpusPipeline":
        """Encode each document with a shipped BPE merge list — a single
        codegen projection adding ``bpe_tokens`` (vocab.apply_bpe_replace:
        zero shuffle, zero Python); ``pack()`` then uses the REAL token
        counts automatically."""
        from solana_etl_spark.operators.vocab import apply_bpe_replace

        return self._with(apply_bpe_replace(self.df, merges))

    def pack(self, budget: int = 2048, group_cols=("lang",)) -> DataFrame:
        """Terminal step: concat-and-chunk the surviving documents into
        fixed token-budget model sequences (operators/packing.py). After
        ``tokenize()``, sequences budget the tokenizer's actual counts;
        otherwise the whitespace/BPE-ish regex estimate."""
        from solana_etl_spark.operators.packing import pack_sequences

        n_tokens = (
            F.size("bpe_tokens") if "bpe_tokens" in self.df.columns else None
        )
        return pack_sequences(
            self.df, budget=budget, group_cols=group_cols, n_tokens=n_tokens
        )

    def shard_plan(
        self, n_shards: int = 8, weight_col: str = "n_chars"
    ) -> DataFrame:
        """Terminal step: weight-balanced shard assignment plan for the
        surviving corpus (operators/layout.py:balanced_shard_plan)."""
        from solana_etl_spark.operators.layout import balanced_shard_plan

        return balanced_shard_plan(
            self.df, key_col=_ID, weight_col=weight_col, n_shards=n_shards
        )

    def drift_vs(self, reference: DataFrame, col: str = "n_chars") -> DataFrame:
        """Terminal step: PSI/KS drift report of this (cleaned) corpus
        against a reference slice (operators/drift.py)."""
        from solana_etl_spark.operators.drift import drift_report

        return drift_report(reference, self.df, col)


class WebPipeline:
    """Chainable web-crawl curation over a ``pages(page_id, url, text)``
    DataFrame — the URL/C4 operator family (operators/web.py,
    operators/c4.py) composed as the recipe a crawl actually runs:

        WebPipeline(pages)
            .dedup_urls()
            .c4_clean()
            .dedup_spans()
            .to_documents()        # -> CorpusPipeline(...)

    Like :class:`CorpusPipeline`, every step narrows the SAME lazy
    DataFrame; ``to_documents()`` re-shapes the survivors into the
    ``documents(doc_id, text, lang, source, n_chars)`` schema (source =
    registrable domain) so the cleaned crawl feeds straight into the
    corpus pipeline's dedup/decontaminate/pack stages."""

    def __init__(self, df: DataFrame):
        self.df = df

    @classmethod
    def from_html(cls, pages: DataFrame) -> "WebPipeline":
        """Enter the pipeline from RAW CRAWL rows (page_id, url, html):
        the scan-fused HTML→text extractor (operators/web.py
        html_to_text) replaces the html column with extracted text, and
        the rest of the chain is unchanged — raw HTML never survives
        past the first projection. The extracted projection is
        localCheckpoint'd (lazy): the crawl chain references pages from
        TWO plan branches (keep-best aggregate + the semi-join side), and
        without truncation each branch would re-run the regexp chain
        over the bulkiest column in the pipeline."""
        from solana_etl_spark.operators.web import html_to_text

        return cls(
            pages.select(
                "page_id",
                "url",
                html_to_text(F.col("html")).alias("text"),
            ).localCheckpoint(eager=False)
        )

    def _with(self, df: DataFrame) -> "WebPipeline":
        return WebPipeline(df)

    def dedup_urls(self) -> "WebPipeline":
        """Keep the best copy per canonical URL (longest text, ties to
        the smallest id) — one struct-argmax hash aggregate + semi-join
        back (operators/web.py url_dedup_keep_best)."""
        from solana_etl_spark.operators.web import url_dedup_keep_best

        keepers = url_dedup_keep_best(self.df).select("page_id")
        return self._with(self.df.join(keepers, "page_id", "left_semi"))

    def cap_domains(self, cap: int | None = None) -> "WebPipeline":
        """Keep at most ``cap`` pages per registrable domain, chosen by
        deterministic md5 order (operators/web.py per_domain_cap — the
        two-level rank, mega-domain-safe)."""
        from solana_etl_spark.operators.web import DOMAIN_CAP, per_domain_cap

        kept = per_domain_cap(
            self.df, cap=DOMAIN_CAP if cap is None else cap
        ).select("page_id")
        return self._with(self.df.join(kept, "page_id", "left_semi"))

    def c4_clean(self) -> "WebPipeline":
        """Apply the C4 line + page rules; ``text`` becomes the kept
        lines (operators/c4.py c4_line_filter — a map-only stage)."""
        from solana_etl_spark.operators.c4 import c4_line_filter

        keep = [c for c in self.df.columns if c != "text"]
        cleaned = c4_line_filter(self.df).select(
            "page_id", F.col("text_clean").alias("text")
        )
        return self._with(
            self.df.select(*keep).join(cleaned, "page_id")
        )

    def dedup_spans(self) -> "WebPipeline":
        """Corpus-wide three-sentence-span dedup; ``text`` becomes the
        surviving lines (operators/c4.py c4_span_dedup), pages reduced
        to nothing are dropped."""
        from solana_etl_spark.operators.c4 import c4_span_dedup

        keep = [c for c in self.df.columns if c != "text"]
        deduped = c4_span_dedup(self.df).select(
            "page_id", F.col("text_dedup").alias("text")
        )
        return self._with(
            self.df.select(*keep)
            .join(deduped, "page_id")
            .filter(F.col("text") != "")
        )

    def to_documents(self) -> DataFrame:
        """Survivors re-shaped to the documents schema: doc_id = page_id,
        source = registrable domain (PSL broadcast lookup —
        operators/web.py with_registrable_domain), lang left NULL for a
        downstream lang-id stage (operators/text.py lang_id)."""
        from solana_etl_spark.operators.web import with_registrable_domain

        return with_registrable_domain(self.df, "url", "_dom").select(
            F.col("page_id").alias("doc_id"),
            "text",
            F.lit(None).cast("string").alias("lang"),
            F.col("_dom").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
