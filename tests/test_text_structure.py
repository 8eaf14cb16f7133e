"""Known-value tests for the line-structure and character-entropy
text operators (operators/text.py)."""

from __future__ import annotations


def test_structure_stats(spark):
    from solana_etl_spark.operators.text import structure_stats

    df = spark.createDataFrame(
        [
            (0, "Hello.\n\n- item one\n- item two\nno punct ending"),
            (1, "plain"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in structure_stats(df).collect()}
    assert out[0].n_lines == 5
    assert out[0].blank_frac == 0.2  # 1 of 5
    assert out[0].bullet_frac == 0.5  # 2 of 4 nonblank
    assert out[0].punct_line_frac == 0.25  # "Hello." of 4
    assert out[1].n_lines == 1 and out[1].bullet_frac == 0.0


def test_char_entropy_known_values(spark):
    from solana_etl_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(0, "aabb"), (1, "aaaa"), (2, "abcd"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[0].entropy_bits == 1.0  # two equiprobable symbols
    assert out[1].entropy_bits == 0.0  # degenerate
    assert out[2].entropy_bits == 2.0  # four equiprobable symbols
    assert 3 not in out  # empty text has no distribution
    assert out[0].n_chars == 4


def test_collocations_pmi_semantics(spark):
    """A bigram whose tokens only ever co-occur outranks pairs built from
    an independently frequent token."""
    from solana_etl_spark.operators.text import collocations

    docs = [
        "san francisco " * 3,  # san/francisco never appear apart
        "the cat ran and the cat hid while the dog and the bird and the fox slept",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    out = collocations(df, min_count=2, k=10).collect()
    by = {r.bigram: r for r in out}
    assert by["san francisco"].c_ab == 3
    top = max(out, key=lambda r: r.pmi)
    assert top.bigram == "san francisco"
    # "the" is frequent in varied contexts, so its pairs score lower
    assert by["san francisco"].pmi > by["the cat"].pmi


def test_script_stats_mixed_scripts(spark):
    """Script fractions on constructed multilingual text: Latin, CJK,
    Cyrillic, digits, whitespace, and the other_frac catch-all."""
    from solana_etl_spark.operators.text import script_stats

    rows = [
        (0, "abc 12"),          # 3 latin, 2 digit, 1 ws
        (1, "中文 ok"),  # 2 cjk, 1 ws, 2 latin
        (2, "пр!"),    # 2 cyrillic, 1 other
        (3, ""),                # empty -> all zeros
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in script_stats(docs).collect()}
    assert out[0].latin_frac == 0.5 and out[0].digit_frac == round(2 / 6, 9)
    assert out[0].whitespace_frac == round(1 / 6, 9)
    assert out[1].cjk_frac == 0.4 and out[1].latin_frac == 0.4
    assert out[2].cyrillic_frac == round(2 / 3, 9)
    assert out[2].other_frac == round(1 / 3, 9)
    assert out[3].n_chars_text == 0 and out[3].other_frac == 0.0


def test_script_stats_cross_engine_on_multilingual(spark, tmp_path):
    """The gate fixture is ASCII-only, so the CJK/Cyrillic/Arabic oracle
    classes are vacuous there — this pins Spark==DuckDB on real
    multilingual text, including emoji (surrogate pairs), vertical tab
    (Java \\s includes \\x0B, RE2's does not — the classes are explicit),
    and the empty string."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from solana_etl_spark.queries import all_oracle_sql, all_queries

    texts = [
        "hello world 123",
        "中文文本 mixed with latin",
        "привет мир! Кириллица 42",
        "مرحبا بالعالم",
        "カタカナとひらがな 한국어",
        "emoji 😀🎉 and\ttabs\nnewlines\x0bvtab",
        "",
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["xx"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    sp = sorted(
        tuple(r)
        for r in all_queries()["text_script_stats"](spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    du = sorted(
        tuple(r)
        for r in con.execute(all_oracle_sql()["text_script_stats"]).fetchall()
    )
    assert sp == du


def test_chunk_token_windows_coverage_and_edges(spark):
    from solana_etl_spark.operators.text import chunk_token_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),   # 10 toks: 2 chunks
            (2, "a b c"),                                  # < budget: 1 chunk
            (3, ""),                                       # empty: none
            (4, None),                                     # NULL: none
        ],
        "doc_id long, text string",
    )
    out = chunk_token_windows(docs, budget=6, overlap=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): r for r in out}
    assert set(got) == {(1, 0), (1, 1), (1, 2), (2, 0)}
    # step = 4; chunks of doc 1: [0..5], [4..9], [8..9]
    assert got[(1, 0)]["chunk_text"] == "w0 w1 w2 w3 w4 w5"
    assert got[(1, 1)]["chunk_text"] == "w4 w5 w6 w7 w8 w9"
    assert got[(1, 2)]["chunk_text"] == "w8 w9"
    assert got[(1, 2)]["start_token"] == 8 and got[(1, 2)]["n_tokens"] == 2
    assert got[(2, 0)]["chunk_text"] == "a b c"
    # every token of doc 1 is covered at least once
    covered = set()
    for (d, _), r in got.items():
        if d == 1:
            covered.update(
                range(r["start_token"], r["start_token"] + r["n_tokens"])
            )
    assert covered == set(range(10))
    import pytest

    with pytest.raises(ValueError):
        chunk_token_windows(docs, budget=4, overlap=4)
