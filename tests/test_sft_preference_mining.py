"""Semantic unit tests for SFT sample construction, preference-pair
building, and hard-negative mining on constructed inputs (the oracle
harness checks cross-engine equality; these check the *semantics* — spans
tile correctly, pairs pick the true extremes, negatives are wrong-label)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        # conv 0: turns 0..3 with 2/3/1/4 tokens
        (0, "a b", "en", "s0", 3),
        (1, "c d e", "en", "s0", 5),
        (2, "f", "en", "s0", 1),
        (3, "g h i j", "en", "s0", 7),
        # conv 1: partial conversation (2 turns)
        (4, "k k k", "en", "s1", 5),
        (5, "l", "en", "s1", 1),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).cache()


def test_conversations_roles_and_ids(docs_df):
    from solana_etl_spark.operators.sft import conversations

    conv = {
        (r.conv_id, r.turn_idx): r.role for r in conversations(docs_df).collect()
    }
    assert conv[(0, 0)] == "user" and conv[(0, 1)] == "assistant"
    assert conv[(0, 2)] == "user" and conv[(0, 3)] == "assistant"
    assert conv[(1, 0)] == "user" and conv[(1, 1)] == "assistant"


def test_loss_mask_spans_tile_the_token_stream(docs_df):
    from solana_etl_spark.operators.sft import conversations, loss_mask_spans

    spans = {
        (r.conv_id, r.turn_idx): (r.span_start, r.span_end)
        for r in loss_mask_spans(conversations(docs_df)).collect()
    }
    # conv 0 token stream: [0,2) user, [2,5) asst, [5,6) user, [6,10) asst
    assert spans[(0, 1)] == (2, 5)
    assert spans[(0, 3)] == (6, 10)
    # conv 1: [0,3) user, [3,4) asst
    assert spans[(1, 1)] == (3, 4)
    # only assistant turns carry loss
    assert set(spans) == {(0, 1), (0, 3), (1, 1)}


def test_sft_stats_mask_ratio(docs_df):
    from solana_etl_spark.operators.sft import conversations, sft_stats

    stats = {r.conv_id: r for r in sft_stats(conversations(docs_df)).collect()}
    assert stats[0].n_turns == 4
    assert stats[0].prompt_tokens == 3 and stats[0].completion_tokens == 7
    assert stats[0].mask_ratio == 0.7
    assert stats[1].prompt_tokens == 3 and stats[1].completion_tokens == 1


def test_pack_conversations_accounts_all_tokens(docs_df):
    from solana_etl_spark.operators.sft import conversations, pack_conversations

    packed = pack_conversations(conversations(docs_df), budget=6).collect()
    by_conv = {}
    for r in packed:
        by_conv.setdefault(r.conv_id, 0)
        by_conv[r.conv_id] += r.tokens_in_seq
    # every conversation's tokens are fully packed
    assert by_conv == {0: 10, 1: 4}


def test_pack_with_masks_hand_computed(docs_df):
    from solana_etl_spark.operators.sft import conversations, pack_with_masks

    out = {
        r.seq_id: r
        for r in pack_with_masks(conversations(docs_df), budget=6).collect()
    }
    # en stream: conv0 [0,10) + conv1 [10,14); assistant spans abs
    # [2,5), [6,10), [13,14); budget-6 sequences [0,6) [6,12) [12,14)
    assert [(out[i].seq_tokens, out[i].loss_tokens) for i in (0, 1, 2)] == [
        (6, 3),
        (6, 4),
        (2, 1),
    ]
    # invariants: all tokens packed, all assistant tokens carry loss
    assert sum(r.seq_tokens for r in out.values()) == 14
    assert sum(r.loss_tokens for r in out.values()) == 8
    assert all(r.loss_tokens <= r.seq_tokens for r in out.values())


def test_pack_with_masks_drops_null_group(docs_df, spark):
    """A conversation whose turn-0 group value is NULL is dropped, never
    packed under a NULL group — the oracle's glang CTE filters the same
    way (`grp IS NOT NULL`), so both engines agree on nullable groups."""
    from solana_etl_spark.operators.sft import conversations, pack_with_masks

    null_lang = spark.createDataFrame(
        [(8, "x y", None, "s9", 3), (9, "z", None, "s9", 1)],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    mixed = docs_df.unionByName(null_lang)
    out = pack_with_masks(conversations(mixed), budget=6).collect()
    assert all(r.lang is not None for r in out)
    # the en stream is untouched by the dropped NULL-group conversation
    assert sum(r.seq_tokens for r in out) == 14


def test_preference_pairs_extremes_and_ties(spark):
    from solana_etl_spark.operators.preference import preference_pairs

    rows = [
        ("en", "s0", 1, 0.5),
        ("en", "s0", 2, 2.0),
        ("en", "s0", 3, 2.0),  # tie with 2 → chosen must be doc 2 (smaller id)
        ("en", "s0", 4, -1.0),
        ("en", "s1", 5, 1.0),  # singleton group → dropped
        ("fr", "s0", 6, 3.0),
        ("fr", "s0", 7, 3.0),  # zero margin → dropped
    ]
    df = spark.createDataFrame(rows, ["lang", "source", "doc_id", "z"])
    out = {
        (r.lang, r.source): r
        for r in preference_pairs(df, F.col("z"), ("lang", "source")).collect()
    }
    assert set(out) == {("en", "s0")}
    pair = out[("en", "s0")]
    assert pair.chosen_doc == 2 and pair.rejected_doc == 4
    assert pair.margin == 3.0


def test_hard_negative_triplets_semantics(spark):
    from solana_etl_spark.operators.mining import hard_negative_triplets

    # two tight same-label clusters along different axes + one cross-label
    # intruder close to cluster A (the hard negative)
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.14, 0.0], 0),  # positive for 0
        (2, [0.95, 0.31, 0.0], 1),  # hard negative for 0 (close to A)
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    out = hard_negative_triplets(df, n_anchors=1, k_neg=2).collect()
    assert [r.neg_id for r in sorted(out, key=lambda r: r.neg_rank)] == [2, 3]
    top = min(out, key=lambda r: r.neg_rank)
    assert top.pos_id == 1
    # intruder is more similar than the positive is dissimilar → small margin
    assert top.margin < 0.2
    # negatives are all wrong-label by construction
    assert all(r.neg_id in (2, 3, 4) for r in out)


def test_best_of_n_argmax_and_mean(spark):
    from solana_etl_spark.operators.preference import best_of_n

    rows = [
        (0, 1, 0.5),
        (0, 2, 2.0),
        (0, 3, 2.0),  # tie → best_doc must be 2
        (1, 4, -1.0),  # singleton group still emits
    ]
    df = spark.createDataFrame(rows, ["prompt_id", "doc_id", "z"])
    out = {r.prompt_id: r for r in best_of_n(df, F.col("z"), ("prompt_id",)).collect()}
    assert out[0].best_doc == 2 and out[0].best_z == 2.0
    assert out[0].n_candidates == 3 and out[0].sum_z == 4.5
    assert out[1].best_doc == 4 and out[1].n_candidates == 1


def test_prompt_dedup_first_turn_keyed(spark):
    from solana_etl_spark.operators.sft import conversations, prompt_dedup

    rows = [
        (0, "Same Prompt", "en", "s0", 1),
        (1, "answer a", "en", "s0", 1),
        (2, "x", "en", "s0", 1),
        (3, "y", "en", "s0", 1),
        (4, "  same   prompt ", "en", "s0", 1),  # ws/case dup of conv 0's prompt
        (5, "answer b", "en", "s0", 1),
        (6, "z", "en", "s0", 1),
        (7, "w", "en", "s0", 1),
        (8, "different prompt", "en", "s0", 1),
        (9, "answer c", "en", "s0", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {r.keeper_conv: r.n_convs for r in prompt_dedup(conversations(df)).collect()}
    assert out == {0: 2, 2: 1}  # convs 0+1 share a prompt; conv 2 unique


def test_bucketed_hard_negatives_bucket_contract(spark):
    from solana_etl_spark.operators.mining import bucketed_hard_negatives
    from solana_etl_spark.operators.similarity import lsh_sign_buckets

    # vectors engineered so 0/1/2 share a bucket (same sign pattern) and
    # 3 sits in a different one; labels split 0,1 vs 2,3
    rows = [
        (0, [1.0, 0.2] + [0.0] * 14, 0),
        (1, [0.9, 0.3] + [0.0] * 14, 0),
        (2, [0.8, 0.25] + [0.0] * 14, 1),
        (3, [-1.0, -0.2] + [0.0] * 14, 1),
    ]
    import pyspark.sql.functions as F
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    buckets = {r.vec_id: r.bucket for r in lsh_sign_buckets(df).collect()}
    out = bucketed_hard_negatives(df, k_neg=3).collect()
    for r in out:
        # every emitted negative shares the anchor's bucket and flips label
        assert buckets[r.q_id] == buckets[r.neg_id]
    # anchors 0 and 1 (label 0) see wrong-label 2 iff same bucket
    if buckets[0] == buckets[2]:
        assert any(r.q_id == 0 and r.neg_id == 2 for r in out)
    # out-of-bucket wrong-label vectors are out of contract
    assert not any(r.neg_id == 3 and buckets[r.q_id] != buckets[3] for r in out)


def test_maxsim_rewards_partial_match(spark):
    """Late interaction ranks a candidate matching ONE query subvector
    perfectly above a candidate that is uniformly mediocre — the
    fine-grained behavior a single pooled dot product averages away."""
    from solana_etl_spark.operators.similarity import maxsim_topk

    dim = 16  # m=2 subvectors of 8 dims
    q = [1.0] * 8 + [0.0] * 8
    partial = [1.0] * 8 + [-0.4] * 8   # perfect on sub 0
    mediocre = [0.3] * 16
    rows = [(0, q, 0), (1, partial, 1), (2, mediocre, 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    out = maxsim_topk(df, n_queries=1, k=2, m=2, subdim=8).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.vec_id for r in ranked] == [1, 2]
    # sub 0: dot(q,partial)=8 ; sub 1: q subvector is zero → max dot 0
    assert ranked[0].maxsim_score == 8.0
