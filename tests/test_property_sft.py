"""Property-based invariants for the fine-tuning data family: for ANY
random corpus shape, loss-mask accounting conserves tokens through
packing, and the categorical sampler's draws are total and in-support."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

import pyspark.sql.functions as F

# random corpora: doc texts as 0..8 tokens of a tiny vocabulary (dup-heavy
# on purpose), contiguous doc_ids so conversations always have turn 0
texts_strategy = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8
    ).map(" ".join),
    min_size=1,
    max_size=16,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts_strategy)
def test_masks_conserved_through_packing(spark, texts):
    """Σ seq_tokens == total stream tokens and Σ loss_tokens == total
    assistant tokens, for ANY corpus shape and a small budget (so spans
    straddle many sequence boundaries)."""
    from solana_etl_spark.operators.sft import (
        conversations,
        pack_with_masks,
        sft_stats,
    )

    conv = conversations(_docs(spark, texts))
    packed = pack_with_masks(conv, budget=3).collect()
    stats = sft_stats(conv).collect()
    assert sum(r.seq_tokens for r in packed) == sum(
        r.prompt_tokens + r.completion_tokens for r in stats
    )
    assert sum(r.loss_tokens for r in packed) == sum(
        r.completion_tokens for r in stats
    )
    assert all(0 <= r.loss_tokens <= r.seq_tokens for r in packed)
    # every sequence except each group's last is exactly full
    by_grp: dict = {}
    for r in packed:
        by_grp.setdefault(r.lang, []).append(r)
    for rows in by_grp.values():
        rows.sort(key=lambda r: r.seq_id)
        assert all(r.seq_tokens == 3 for r in rows[:-1])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.text("ab", min_size=1, max_size=3), st.integers(0, 50)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ).filter(lambda items: sum(w for _, w in items) > 0)
)
def test_categorical_draws_total_and_in_support(spark, items):
    """Every draw resolves to exactly one positive-weight item, for ANY
    weight table (including zero-weight entries)."""
    from solana_etl_spark.operators.sampling import categorical_draws

    counts = spark.createDataFrame(items, ["tok", "c"])
    out = categorical_draws(counts, "tok", "c", 40).collect()
    assert len(out) == 40
    assert len({r.draw_id for r in out}) == 40
    support = {t for t, w in items if w > 0}
    assert {r.tok for r in out} <= support


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts_strategy)
def test_cdc_chunks_partition_token_stream(spark, texts):
    """Content-defined chunks PARTITION each document's token stream:
    token counts conserve, chunk ids are contiguous from 0."""
    from solana_etl_spark.operators.dedup import cdc_chunks
    from solana_etl_spark.operators.text import tokens

    docs = _docs(spark, texts)
    chunks = cdc_chunks(docs).collect()
    truth = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        assert sum(r.n_tokens for r in rows) == truth[doc_id]
        assert sorted(r.chunk_id for r in rows) == list(range(len(rows)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=32),
                min_size=4,
                max_size=4,
            ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
            st.integers(0, 2),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_hard_negatives_label_and_rank_contract(spark, rows):
    """Negatives are always wrong-label and neg_rank is contiguous from 1
    per anchor, for ANY vector set."""
    from solana_etl_spark.operators.mining import hard_negative_triplets

    df = spark.createDataFrame(
        [(i, v, l) for i, (v, l) in enumerate(rows)],
        ["vec_id", "embedding", "label"],
    ).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    labels = {i: l for i, (v, l) in enumerate(rows)}
    out = hard_negative_triplets(df, n_anchors=3, k_neg=4).collect()
    per_anchor: dict = {}
    for r in out:
        assert labels[r.neg_id] != labels[r.q_id]
        assert labels[r.pos_id] == labels[r.q_id]
        per_anchor.setdefault(r.q_id, []).append(r.neg_rank)
    for ranks in per_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
