"""Streaming word-count state (streaming/vocab_stream.py): versioned
replay-safe folds, stream-equals-batch word counts, and training from
the state equals batch training."""

from __future__ import annotations

from collections import Counter

import pytest

from solana_etl_spark.operators.vocab import word_freq_table
from solana_etl_spark.streaming.vocab_stream import (
    read_word_state,
    train_bpe_from_state,
    train_wordpiece_from_state,
    update_word_batch,
)

ROWS_A = [(1, "the lower the better"), (2, "new newer newest")]
ROWS_B = [(3, "the tower is lower"), (4, "wide wider widest")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_state_replay_converges_and_prunes(spark, tmp_path):
    state = str(tmp_path / "s")
    a, b = _docs(spark, ROWS_A), _docs(spark, ROWS_B)
    # normal fold, then a RETRY of batch 1 (at-least-once replay): the
    # retry re-reads batch 0's state, so counts never double
    update_word_batch(spark, a, state, 0)
    update_word_batch(spark, b, state, 1)
    update_word_batch(spark, b, state, 1)  # replay
    got = {r["word"]: r["freq"] for r in read_word_state(spark, state).collect()}
    want = Counter(
        w for _, t in ROWS_A + ROWS_B for w in t.lower().split() if w
    )
    assert got == dict(want)
    kept = [p.name for p in (tmp_path / "s").iterdir() if p.name.startswith("batch=")]
    assert sorted(kept) == ["batch=0", "batch=1"]  # pruned to predecessor


def test_train_from_state_equals_batch_training(spark, tmp_path):
    from test_vocab import _ref_train
    from test_wordpiece import _ref_train as _wp_ref

    state = str(tmp_path / "s")
    update_word_batch(spark, _docs(spark, ROWS_A), state, 0)
    update_word_batch(spark, _docs(spark, ROWS_B), state, 1)
    lines = [t for _, t in ROWS_A + ROWS_B]
    assert train_bpe_from_state(spark, state, 10) == _ref_train(lines, 10)
    freqs = Counter(w for t in lines for w in t.lower().split())
    assert train_wordpiece_from_state(spark, state, 8) == _wp_ref(
        dict(freqs), n_merges=8
    )


def test_train_from_state_word_cap_fails_loudly(spark, tmp_path):
    state = str(tmp_path / "s")
    update_word_batch(spark, _docs(spark, ROWS_A), state, 0)
    with pytest.raises(ValueError, match="word_cap"):
        train_bpe_from_state(spark, state, 4, word_cap=2)


def test_stream_counts_equal_batch_counts(spark, tmp_path):
    state = str(tmp_path / "s")
    update_word_batch(spark, _docs(spark, ROWS_A), state, 0)
    update_word_batch(spark, _docs(spark, ROWS_B), state, 1)
    batch = {
        r["word"]: r["freq"]
        for r in word_freq_table(_docs(spark, ROWS_A + ROWS_B)).collect()
    }
    streamed = {
        r["word"]: r["freq"] for r in read_word_state(spark, state).collect()
    }
    assert streamed == batch
