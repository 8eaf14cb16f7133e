"""Cross-document boilerplate n-grams (operators/text.py): detection
counts, overlap-aware token removal vs a pure-Python model, short-doc
guard (Spark's sequence(1, 0) descends)."""

from __future__ import annotations

import re

from solana_etl_spark.operators.text import (
    cross_doc_ngrams,
    strip_boilerplate_ngrams,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog end one"),
    (2, "prefix the quick brown fox jumps over the lazy dog tail"),
    (3, "other the quick brown fox jumps over the lazy dog words"),
    (4, "completely different content with no shared grams at all"),
    (5, "tiny doc"),  # shorter than n: must produce zero grams, survive whole
]


def _ref(corpus, n, min_docs):
    toks = {d: re.split(r"\s+", t.lower().strip()) for d, t in corpus}
    per_doc = {
        d: {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}
        for d, ts in toks.items()
    }
    counts: dict = {}
    for grams in per_doc.values():
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
    boiler = {g for g, c in counts.items() if c >= min_docs}
    stripped = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - n + 1):
            if " ".join(ts[i : i + n]) in boiler:
                covered.update(range(i, i + n))
        stripped[d] = " ".join(t for i, t in enumerate(ts) if i not in covered)
    return boiler, stripped


def test_detection_matches_model(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    boiler, _ = _ref(CORPUS, 8, 3)
    got = {r.gram: r.n_docs for r in cross_doc_ngrams(docs, 8, 3).collect()}
    assert set(got) == boiler
    assert all(v == 3 for v in got.values())


def test_strip_matches_model(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    _, stripped = _ref(CORPUS, 8, 3)
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_stripped)
        for r in strip_boilerplate_ngrams(docs, 8, 3).collect()
    }
    assert len(got) == len(CORPUS)
    for d, text in stripped.items():
        n_toks, n_kept, out = got[d]
        assert out == text
        assert n_kept == (len(text.split()) if text else 0)
    # untouched docs keep every token
    assert got[4][0] == got[4][1] == 9
    assert got[5] == (2, 2, "tiny doc")


def test_no_boilerplate_below_threshold(spark):
    docs = spark.createDataFrame(CORPUS[:2], "doc_id long, text string")
    assert cross_doc_ngrams(docs, 8, 3).count() == 0
    out = {
        r.doc_id: r.text_stripped
        for r in strip_boilerplate_ngrams(docs, 8, 3).collect()
    }
    assert out[1] == CORPUS[0][1].lower()
