"""Gopher-style repetition stats: value parity against a pure-Python
reference (Counter-based histogram), tie-break determinism, and edge
cases (short docs, fully-repetitive docs)."""

from __future__ import annotations

import re
from collections import Counter

from solana_etl_spark.operators.text import (
    REP_DUP_N,
    REP_TOP_N,
    repetition_stats,
)

_DOCS = [
    (0, "a b a b a b a b a b a b"),  # one dominating 2-gram
    (
        1,
        "the quick brown fox jumps over the lazy dog while seventeen "
        "violet zeppelins hover quietly above a distant mountain range "
        "casting long afternoon shadows across the sleepy village below",
    ),
    (2, "x y z x y z x y z x y z x y z"),  # repeated 5-grams
    (3, "solo"),  # 1 token: no 2-grams, no 5-grams
    (4, "spam spam spam spam spam spam spam spam"),  # max repetition
    (5, "tie one tie two tie one tie two pad"),  # 2-gram count tie
]


def _py_stats(doc_id, text):
    toks = re.split(r"\s+", text.lower().strip())
    n_chars = max(len(text.strip()), 1)
    n = len(toks)

    def grams(k):
        return [" ".join(toks[i : i + k]) for i in range(n - k + 1)]

    c2 = Counter(grams(REP_TOP_N)) if n >= REP_TOP_N else Counter()
    c5 = Counter(grams(REP_DUP_N)) if n >= REP_DUP_N else Counter()
    if c2:
        mx = max(c2.values())
        topg = min(g for g, c in c2.items() if c == mx)
        topc = mx
    else:
        topg, topc = "", 0
    dupmass = sum(c * len(g) for g, c in c5.items() if c >= 2)
    return {
        "n_tokens": n,
        "dup_token_frac": round((n - len(set(toks))) / max(n, 1), 6),
        "top_2gram": topg,
        "top_2gram_char_frac": round(topc * len(topg) / n_chars, 6),
        "dup_5gram_char_frac": round(dupmass / n_chars, 6),
    }


def test_repetition_stats_matches_python_reference(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for doc_id, text in _DOCS:
        want = _py_stats(doc_id, text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id][k], v)


def test_repetition_flags(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["is_repetitive"]
        for r in repetition_stats(df).collect()
    }
    assert got[0] is True  # 'a b' covers ~half the chars
    assert got[1] is False  # natural sentence
    assert got[4] is True  # all-duplicate tokens
    assert got[3] is False  # single token, nothing to repeat


def test_top_gram_tiebreak_is_lexicographic(spark):
    df = spark.createDataFrame([_DOCS[5]], ["doc_id", "text"])
    row = repetition_stats(df).collect()[0]
    # 'tie one' and 'tie two' both occur twice -> smallest wins
    assert row["top_2gram"] == "one tie" or row["top_2gram"] <= "tie one"
    # exact value from the reference
    assert row["top_2gram"] == _py_stats(*_DOCS[5])["top_2gram"]
