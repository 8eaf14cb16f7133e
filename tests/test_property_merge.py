"""Property-based model equivalence for CDC merge: random base/changeset
pairs vs a Python dict model, broadcast ≡ shuffle strategy, and stable
winners under ambiguous ties."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from solana_etl_spark.operators.merge import merge_snapshot

KEYS = st.integers(min_value=0, max_value=9)

base_strategy = st.dictionaries(
    KEYS, st.tuples(st.text("ab", max_size=3), st.integers(0, 100)), max_size=8
)
# unique (key, version, op): the operator's winner is then fully defined by
# (version desc, delete-beats-update) and a dict model can predict it
changes_strategy = st.lists(
    st.tuples(
        KEYS,
        st.integers(min_value=1, max_value=4),  # version
        st.sampled_from(["U", "D"]),
        st.text("cd", max_size=3),  # payload
        st.integers(0, 100),
    ),
    max_size=12,
    unique_by=lambda c: (c[0], c[1], c[2]),
)


def _model(base, changes):
    out = {k: v for k, v in base.items()}
    per_key: dict = {}
    for k, ver, op, payload, price in changes:
        per_key.setdefault(k, []).append((ver, op == "D", payload, price))
    for k, cands in per_key.items():
        ver, is_del, payload, price = max(
            cands, key=lambda c: (c[0], c[1])
        )
        if is_del:
            out.pop(k, None)
        else:
            out[k] = (payload, price)
    return sorted((k, p, pr) for k, (p, pr) in out.items())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(base=base_strategy, changes=changes_strategy)
def test_merge_matches_dict_model(spark, base, changes):
    base_df = spark.createDataFrame(
        [(k, p, pr) for k, (p, pr) in base.items()] or [(None, None, None)],
        "k int, payload string, price int",
    )
    if not base:
        base_df = base_df.filter("k IS NOT NULL")
    ch_df = spark.createDataFrame(
        [(k, p, pr, op, v) for k, v, op, p, pr in changes]
        or [(None, None, None, None, None)],
        "k int, payload string, price int, op string, version int",
    )
    if not changes:
        ch_df = ch_df.filter("k IS NOT NULL")
    want = _model(base, changes)
    for strategy in ("broadcast", "shuffle"):
        got = sorted(
            tuple(r)
            for r in merge_snapshot(
                base_df, ch_df, ["k"], strategy=strategy
            ).collect()
        )
        assert got == want, strategy


def test_ambiguous_tie_is_deterministic(spark):
    # two U changes with the SAME (key, version): contract doesn't say which
    # wins, but the winner must be identical across strategies, runs, and
    # partitionings (whole-row-hash tie-break)
    base_df = spark.createDataFrame([(1, "a", 1)], "k int, payload string, price int")
    ch = [(1, "x", 10, "U", 2), (1, "y", 20, "U", 2)]
    ch_df = spark.createDataFrame(
        ch, "k int, payload string, price int, op string, version int"
    )
    results = set()
    for strategy in ("broadcast", "shuffle"):
        for parts in (1, 5):
            got = tuple(
                sorted(
                    tuple(r)
                    for r in merge_snapshot(
                        base_df, ch_df.repartition(parts), ["k"], strategy=strategy
                    ).collect()
                )
            )
            results.add(got)
    assert len(results) == 1
