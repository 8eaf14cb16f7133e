"""Entity resolution: known-cluster parity on a hand-built roster,
blocking containment, and transitive linking through a chain."""

from __future__ import annotations

from solana_etl_spark.operators.er import (
    blocked_match_pairs,
    resolve_entities,
)

_ROSTER = [
    # one entity, three spellings (chain: 1~2 and 2~3 at 1 edit; 1 vs 3 is
    # 2 edits -> linked only transitively)
    (1, "ACME Corporation X"),
    (2, "ACME Corporation Y"),
    (3, "ACME Corporation Z"),
    # different block (prefix differs) even though edit distance is small
    (4, "ACMF Corporation X"),
    # singleton
    (5, "Wayne Enterprises "),
]


def test_pairs_respect_blocking_and_threshold(spark):
    df = spark.createDataFrame(_ROSTER, ["rid", "name"])
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_match_pairs(df, "rid", "name").collect()
    }
    # 1-edit pairs within the shared 16-char block only; 4 is blocked out
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_transitive_entity_assignment(spark):
    df = spark.createDataFrame(_ROSTER, ["rid", "name"])
    got = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(df, "rid", "name").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_chain_links_without_direct_match(spark):
    # A~B (1 edit), B~C (1 edit), A vs C = 2 edits: same entity anyway
    rows = [
        (10, "0123456789abcdef AA"),
        (11, "0123456789abcdef AB"),
        (12, "0123456789abcdef BB"),
    ]
    df = spark.createDataFrame(rows, ["rid", "name"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in blocked_match_pairs(df, "rid", "name").collect()
    }
    assert (10, 12) not in pairs  # no direct edge
    got = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(df, "rid", "name").collect()
    }
    assert got == {10: 10, 11: 10, 12: 10}
