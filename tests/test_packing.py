"""Sequence packing + intra-doc repetition removal, cross-checked against a
DuckDB computation of the same definitions (registry is at its 50-row gate
cap, so these carry their oracle here)."""

from __future__ import annotations

import duckdb
import pytest

from solana_etl_spark.operators.packing import (
    SEQ_BUDGET,
    dedup_repeated_lines,
    pack_sequences,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_pack_sequences_matches_duckdb(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r.lang, r.doc_id, r.seq_id): (r.seq_offset, r.tokens_in_seq, r.n_tokens)
        for r in pack_sequences(docs, budget=SEQ_BUDGET).collect()
    }
    b = SEQ_BUDGET
    q = f"""
    WITH t AS (
        SELECT lang, doc_id,
               len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT lang, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS e
        FROM t
    )
    SELECT lang, doc_id, n_tokens, e - n_tokens AS s,
           unnest(generate_series(CAST((e - n_tokens) // {b} AS BIGINT),
                                  CAST((e - 1) // {b} AS BIGINT))) AS seq_id,
           e
    FROM c WHERE n_tokens > 0
    """
    exp = {}
    for lang, doc_id, n_tokens, s, seq_id, e in duck.execute(q).fetchall():
        seq_start = seq_id * b
        off = max(s, seq_start) - seq_start
        took = min(e, seq_start + b) - max(s, seq_start)
        exp[(lang, doc_id, seq_id)] = (off, took, n_tokens)
    assert got == exp

    # invariants: every doc's tokens fully assigned, no sequence overfilled
    by_seq: dict = {}
    by_doc: dict = {}
    for (lang, doc_id, seq_id), (off, took, n_tokens) in got.items():
        assert 0 <= off < b and 0 < took <= b
        by_seq[(lang, seq_id)] = by_seq.get((lang, seq_id), 0) + took
        by_doc[(lang, doc_id)] = by_doc.get((lang, doc_id), 0) + took
        by_doc[(lang, doc_id, "n")] = n_tokens
    assert all(v <= b for v in by_seq.values())
    for k, v in by_doc.items():
        if len(k) == 2:
            assert v == by_doc[(k[0], k[1], "n")]


def test_dedup_repeated_lines(spark):
    df = spark.createDataFrame(
        [
            (1, "Header\nbody one\nheader\nbody two\nHEADER"),
            (2, "only\nunique\nlines"),
            (3, "same\nsame\nsame"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dedup_repeated_lines(df).collect()}
    # case-insensitive repeats dropped, first occurrence (original case) kept
    assert rows[1].text_deduped == "Header\nbody one\nbody two"
    assert rows[1].n_dropped == 2
    assert rows[1].repeat_ratio == pytest.approx(2 / 5)
    assert rows[2].n_dropped == 0 and rows[2].text_deduped == "only\nunique\nlines"
    assert rows[3].text_deduped == "same" and rows[3].n_dropped == 2


def test_chunk_documents_coverage_and_overlap(spark):
    from solana_etl_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            ("short", "ab"),                  # 1 window
            ("exact", "x" * 384),             # n == 2*stride: starts 0, 192
            ("long", "y" * 500),              # starts 0, 192, 384
        ],
        "doc_id string, text string",
    )
    rows = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_len)
        for r in chunk_documents(docs, chunk_chars=256, stride=192).collect()
    }
    assert rows[("short", 0)] == (0, 2)
    assert rows[("exact", 0)] == (0, 256) and rows[("exact", 1)] == (192, 192)
    assert rows[("long", 2)] == (384, 116)
    # every char of 'long' is covered and consecutive windows overlap by 64
    assert len([k for k in rows if k[0] == "long"]) == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_chars=100, stride=200)


def test_pack_efficiency_arithmetic(spark):
    from solana_etl_spark.operators.packing import pack_efficiency
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "d e", "en"), (2, "f", "fr")],
        ["doc_id", "text", "lang"],
    )
    out = {
        (r.lang, r.budget): r
        for r in pack_efficiency(df, budgets=(2, 4)).collect()
    }
    # en: 5 tokens → budget 2: 3 seqs, capacity 6, waste 1; budget 4: 2/8/3
    assert (out[("en", 2)].n_sequences, out[("en", 2)].waste) == (3, 1)
    assert (out[("en", 4)].n_sequences, out[("en", 4)].waste) == (2, 3)
    # fr: 1 token → 1 seq either way
    assert out[("fr", 2)].padded_capacity == 2 and out[("fr", 2)].waste == 1


def test_pack_sequences_sharded_balance_and_conservation(spark):
    """shards_per_group must (a) conserve every token — per-shard packing
    is a partition of the group's documents, so Σ tokens_in_seq equals the
    unsharded total — and (b) actually split the window partitions: every
    (group, shard) stream far smaller than its group (the dominant-group
    reducer bound the knob exists for)."""
    from solana_etl_spark.operators.packing import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plain = pack_sequences(docs, budget=512)
    sharded = pack_sequences(docs, budget=512, shards_per_group=4)
    assert "shard" in sharded.columns and "shard" not in plain.columns

    from pyspark.sql import functions as F

    tot = lambda df: {  # noqa: E731
        r["lang"]: r["t"]
        for r in df.groupBy("lang")
        .agg(F.sum("tokens_in_seq").alias("t"))
        .collect()
    }
    assert tot(plain) == tot(sharded)

    sizes = (
        sharded.groupBy("lang", "shard")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    )
    by_group: dict = {}
    for r in sizes:
        by_group.setdefault(r["lang"], []).append(r["n"])
    for lang, ns in by_group.items():
        assert len(ns) == 4, (lang, ns)  # all shards populated
        assert max(ns) < sum(ns), (lang, ns)  # no shard holds the group
        assert max(ns) <= 2 * (sum(ns) / len(ns)), (lang, ns)  # balanced

    # per-shard seq_ids are dense from 0 (shard-relative numbering)
    firsts = sharded.groupBy("lang", "shard").agg(
        F.min("seq_id").alias("m")
    )
    assert all(r["m"] == 0 for r in firsts.collect())


def test_pack_with_masks_sharded_mask_conservation(spark):
    """Sharding must not create or destroy loss: Σ seq_tokens and
    Σ loss_tokens per group match the unsharded packing (conversations
    stay contiguous inside their shard stream, so every assistant span
    lands exactly once)."""
    from pyspark.sql import functions as F

    from solana_etl_spark.operators.sft import conversations, pack_with_masks

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    conv = conversations(docs)
    plain = pack_with_masks(conv, budget=512)
    sharded = pack_with_masks(conv, budget=512, shards_per_group=4)
    agg = lambda df: {  # noqa: E731
        r["lang"]: (r["st"], r["lt"])
        for r in df.groupBy("lang")
        .agg(
            F.sum("seq_tokens").alias("st"),
            F.sum("loss_tokens").alias("lt"),
        )
        .collect()
    }
    assert agg(plain) == agg(sharded)
    assert sharded.select("shard").distinct().count() == 4


def test_pack_sequences_order_splits_identical_accounting(spark):
    """The two-phase prefix-sum mode (order_splits) must produce
    BIT-IDENTICAL sequence accounting to the single-window form — split
    choice affects load balance only."""
    from solana_etl_spark.operators.packing import pack_sequences

    rows = [
        (i, "en" if i % 3 else "fr", "w " * (5 + i % 37)) for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    base = sorted(map(tuple, pack_sequences(docs, budget=64).collect()))
    for splits in ([50.0, 120.0, 200.0, 260.0], [0.5], [1000.0]):
        got = sorted(
            map(
                tuple,
                pack_sequences(docs, budget=64, order_splits=splits).collect(),
            )
        )
        assert got == base, splits


def test_pack_sequences_order_splits_null_group_key(spark):
    """NULL group keys (lang-ID failures) must pack identically in the
    two-phase mode — the r7 USING-join dropped them silently."""
    from solana_etl_spark.operators.packing import pack_sequences

    rows = [
        (
            i,
            None if i % 4 == 0 else ("en" if i % 3 else "fr"),
            "w " * (5 + i % 23),
        )
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def key(t):
        return tuple((x is None, x) for x in t)

    base = sorted(map(tuple, pack_sequences(docs, budget=64).collect()), key=key)
    got = sorted(
        map(
            tuple,
            pack_sequences(
                docs, budget=64, order_splits=[30.0, 60.0, 90.0]
            ).collect(),
        ),
        key=key,
    )
    assert got == base
    assert any(r[0] is None for r in base)  # NULL group genuinely packed
