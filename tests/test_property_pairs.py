"""Property-based check of the shared posting-list pair-expansion kernel
(dedup.expand_sorted_pairs): for ANY list of sorted posting arrays, the
emitted pair multiset equals the itertools.combinations model — exactly
the ordered pairs per posting, no drops, no extras, no cross-posting
leakage."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings, strategies as st

from solana_etl_spark.operators.dedup import expand_sorted_pairs

postings_strategy = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=20), min_size=0, max_size=7
    ).map(lambda xs: sorted(set(xs))),
    min_size=0,
    max_size=6,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(postings_strategy)
def test_expand_sorted_pairs_matches_combinations_model(spark, postings):
    df = spark.createDataFrame(
        [(p,) for p in postings], "_docs array<int>"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"]) for r in expand_sorted_pairs(df).collect()
    )
    want = sorted(
        pair
        for p in postings
        for pair in itertools.combinations(p, 2)
    )
    assert got == want
    assert all(a < b for a, b in got)
