"""CorpusPipeline facade: each stage equals its underlying operator, the
chain composes lazily (one plan), and the cleaned corpus matches a
hand-computed expectation on a crafted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_spark.corpus import CorpusPipeline

_GOOD = (
    "the quick brown fox jumps over a lazy dog near the quiet river "
    "while seventeen violet zeppelins hover above the distant mountain"
)

_DOCS = [
    (0, _GOOD),                                  # survives everything
    (1, _GOOD),                                  # exact dup of 0 -> dropped
    (2, "spam " * 40),                           # repetitive -> dropped
    (3, "x"),                                    # fails quality (too short)
    (4, _GOOD + " extra tail words here today"), # near-dup of 0 (LSH)
    (
        5,
        "completely different content about the architecture of analytic "
        "database engines and their vectorized execution pipelines in the "
        "modern data stack with a number of elaborations to pass quality",
    ),
]


def _pipe(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return CorpusPipeline(df)


def test_stage_equivalence_quality(spark):
    from solana_etl_spark.operators.text import quality_score

    p = _pipe(spark)
    want = {
        r["doc_id"]
        for r in quality_score(p.df).filter("is_quality").collect()
    }
    got = {r["doc_id"] for r in p.quality_filter().df.collect()}
    assert got == want and 3 not in got


def test_chain_drops_each_category(spark):
    cleaned = (
        _pipe(spark)
        .quality_filter()
        .drop_repetitive()
        .dedup_exact()
        .dedup_near()
        .df
    )
    ids = {r["doc_id"] for r in cleaned.collect()}
    assert 3 not in ids  # quality
    assert 2 not in ids  # repetitive
    assert 1 not in ids  # exact dup (doc 0 kept as min id)
    assert 0 in ids and 5 in ids


def test_decontaminate_removes_eval_overlap(spark):
    eval_docs = spark.createDataFrame(
        [(100, "seventeen violet zeppelins hover above the distant mountain")],
        ["doc_id", "text"],
    )
    p = _pipe(spark).decontaminate(eval_docs)
    ids = {r["doc_id"] for r in p.df.collect()}
    assert 0 not in ids and 1 not in ids and 4 not in ids  # share 5-grams
    assert 5 in ids  # disjoint content survives


def test_sample_is_deterministic(spark):
    p = _pipe(spark)
    a = {r["doc_id"] for r in p.sample(5000).df.collect()}
    b = {r["doc_id"] for r in p.sample(5000).df.collect()}
    assert a == b  # hash sampling never flickers across runs


def test_chain_is_one_lazy_plan(spark):
    import contextlib
    import io

    chain = _pipe(spark).quality_filter().drop_repetitive().sample(9000).df
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chain.explain("formatted")
    # the per-row stages fuse: no exchange introduced by the facade itself
    assert "Exchange hashpartitioning" not in buf.getvalue()


def test_tokenize_then_pack_uses_real_counts(spark):
    """After tokenize(), pack() budgets the BPE token counts (not the
    whitespace estimate): Σ tokens_in_seq per doc == size(bpe_tokens)."""
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in _DOCS], ["doc_id", "text", "lang"]
    )
    merges = [("t", "h"), ("th", "e"), ("e", "</w>")]
    pipe = CorpusPipeline(df).tokenize(merges)
    want = {
        r["doc_id"]: r["n"]
        for r in pipe.df.select(
            "doc_id", F.size("bpe_tokens").alias("n")
        ).collect()
    }
    packed = pipe.pack(budget=64).collect()
    got: dict = {}
    for r in packed:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["tokens_in_seq"]
        assert r["n_tokens"] == want[r["doc_id"]]
    assert got == want


def test_decontaminate_semantic_drops_neardup_doc(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])

    def vec(i):
        v = [0.0] * 4
        v[i] = 1.0
        return v

    vectors = spark.createDataFrame(
        [(i, vec(i % 4)) for i, _ in _DOCS], "doc_id long, embedding array<float>"
    )
    ev = spark.createDataFrame(
        [(99, vec(2))], "doc_id long, embedding array<float>"
    )
    kept = (
        CorpusPipeline(df)
        .decontaminate_semantic(vectors, ev, threshold=0.9)
        .df.select("doc_id")
        .collect()
    )
    kept_ids = {r["doc_id"] for r in kept}
    # docs 2 (vec dim 2) is cosine-1.0 to the eval vector -> dropped
    assert 2 not in kept_ids
    assert {0, 1, 3, 4, 5} <= kept_ids


def test_pipeline_strip_dup_spans_stage(spark):
    from solana_etl_spark.corpus import CorpusPipeline

    shared = ("alpha beta gamma delta " * 3).strip()
    docs = spark.createDataFrame(
        [
            (0, "zero one two three " + shared, "en", "s0", 10),
            (1, shared + " four five six seven", "en", "s0", 10),
            (2, "all unique tokens here really truly unique words now ok", "en", "s0", 10),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {
        r.doc_id: r
        for r in CorpusPipeline(docs).strip_dup_spans(w=8).df.collect()
    }
    assert out[0].text == "zero one two three"
    assert out[0].n_dup_tokens == 12 and out[0].n_tokens_orig == 16
    assert out[2].n_dup_tokens == 0
    # zero-dup docs keep ORIGINAL text — the stripped reconstruction is
    # lowercased/whitespace-collapsed and must not leak into clean docs
    assert (
        out[2].text
        == "all unique tokens here really truly unique words now ok"
    )
    # downstream stages still see a documents-shaped frame
    assert {"doc_id", "text", "lang", "source"} <= set(out[0].asDict())


def test_pipeline_drop_script_outliers(spark):
    from solana_etl_spark.corpus import CorpusPipeline

    docs = spark.createDataFrame(
        [
            (0, "perfectly normal latin text", "en", "s0", 27),
            (1, "\x00\x01\x02\x03\x04\x05 binary spill", "en", "s0", 19),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    kept = {
        r.doc_id
        for r in CorpusPipeline(docs).drop_script_outliers(0.2).df.collect()
    }
    assert kept == {0}
