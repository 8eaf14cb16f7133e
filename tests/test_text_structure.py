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
