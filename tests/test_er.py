"""Entity resolution: known-cluster parity on a hand-built roster,
exact 1-edit recall (deletion-neighborhood blocking), the prefix-blocking
recall contract, and transitive linking through a chain."""

from __future__ import annotations

from solana_etl_spark.operators.er import (
    blocked_match_pairs,
    match_pairs_1edit,
    resolve_entities,
)

_ROSTER = [
    # one entity, three spellings (chain: 1~2 and 2~3 at 1 edit; 1 vs 3 is
    # 2 edits -> linked only transitively)
    (1, "ACME Corporation X"),
    (2, "ACME Corporation Y"),
    (3, "ACME Corporation Z"),
    # 1 edit from record 1, but the edit is INSIDE the 16-char prefix:
    # prefix blocking misses it (its documented contract); the exact
    # deletion-neighborhood path must find it
    (4, "ACMF Corporation X"),
    # singleton
    (5, "Wayne Enterprises "),
]


def test_prefix_blocking_contract_misses_prefix_edits(spark):
    """blocked_match_pairs' RECALL CONTRACT: an edit inside the block
    prefix lands in different blocks and the pair is not returned."""
    df = spark.createDataFrame(_ROSTER, ["rid", "name"])
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_match_pairs(df, "rid", "name").collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}  # (1, 4) is out of contract


def test_exact_1edit_finds_prefix_divergent_pair(spark):
    """match_pairs_1edit has EXACT recall: the (1, 4) pair whose single
    edit falls inside the prefix must be found, with nothing spurious."""
    df = spark.createDataFrame(_ROSTER, ["rid", "name"])
    got = {
        (r["id_a"], r["id_b"]): r["edits"]
        for r in match_pairs_1edit(df, "rid", "name").collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3), (1, 4)}
    assert got[(1, 4)] == 1


def test_exact_1edit_covers_all_edit_kinds(spark):
    rows = [
        (1, "kitten"),
        (2, "sitten"),   # substitution at position 0
        (3, "kitte"),    # deletion at the end
        (4, "kittens"),  # insertion at the end
        (5, "itten"),    # deletion at position 0
        (6, "bird"),     # unrelated
        (7, ""),         # empty string: 1 insertion from any 1-char name
        (8, "a"),
    ]
    df = spark.createDataFrame(rows, ["rid", "name"])
    got = {
        (r["id_a"], r["id_b"])
        for r in match_pairs_1edit(df, "rid", "name").collect()
    }
    assert {(1, 2), (1, 3), (1, 4), (1, 5), (7, 8)} <= got
    assert all(6 not in p for p in got)
    # kitte<->kittens is 2 edits: must NOT appear even though both are
    # 1 edit from kitten (deletion variants only bound distance by 2 —
    # the verify filter does the exact cut)
    assert (3, 4) not in got


def test_transitive_entity_assignment(spark):
    df = spark.createDataFrame(_ROSTER, ["rid", "name"])
    got = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(df, "rid", "name").collect()
    }
    # default path is exact: 4 links into the ACME cluster via record 1
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5}


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
        for r in match_pairs_1edit(df, "rid", "name").collect()
    }
    assert (10, 12) not in pairs  # no direct edge
    got = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(df, "rid", "name").collect()
    }
    assert got == {10: 10, 11: 10, 12: 10}
