"""Property-based model equivalence for the round-6 operators: rolling
window stats vs a Python sliding-window model, group-median imputation vs
a dict model, and Bloom-prefilter join ≡ plain join on random key sets."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from solana_etl_spark.operators.impute import impute_group_median
from solana_etl_spark.operators.sketch import bloom_prefilter_join
from solana_etl_spark.operators.timeseries import rolling_stats

# (user, value-cents) event lists; values quantized to cents so the
# decimal(18,4) path is exact and the Python model can use exact ints
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-10_000, 10_000)),
    min_size=1,
    max_size=20,
)


def _rolling_model(rows, n):
    by_user: dict = {}
    for eid, (u, cents) in enumerate(rows):
        by_user.setdefault(u, []).append((eid, cents))
    expect = {}
    for vals in by_user.values():
        for i, (eid, _) in enumerate(vals):
            frame = [c for _, c in vals[max(0, i - n + 1): i + 1]]
            expect[eid] = (
                sum(frame) / 100.0,
                len(frame),
                min(frame) / 100.0,
                max(frame) / 100.0,
            )
    return expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_rolling_stats_matches_sliding_window_model(spark, rows):
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (u, t0 + timedelta(seconds=eid), eid, cents / 100.0)
            for eid, (u, cents) in enumerate(rows)
        ],
        ["user_id", "ts", "event_id", "value"],
    )
    got = {
        r["event_id"]: (r["roll_sum"], r["n_window"], r["roll_min"], r["roll_max"])
        for r in rolling_stats(df, n_rows=3).collect()
    }
    assert got == _rolling_model(rows, 3)


impute_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),               # user
        st.booleans(),                   # is_missing
        st.integers(-1000, 1000),        # value-cents
    ),
    min_size=1,
    max_size=15,
)


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    mid = n // 2
    return xs[mid] if n % 2 else (xs[mid - 1] + xs[mid]) / 2.0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=impute_strategy)
def test_impute_matches_group_median_model(spark, rows):
    observed_all = [c / 100.0 for _, m, c in rows if not m]
    df = spark.createDataFrame(
        [
            (eid, u, "error" if m else "ok", c / 100.0)
            for eid, (u, m, c) in enumerate(rows)
        ],
        ["event_id", "user_id", "event_type", "value"],
    )
    got = {
        r["event_id"]: r["value_imputed"]
        for r in impute_group_median(
            df,
            key_col="user_id",
            value_col="value",
            is_missing=F.col("event_type") == "error",
            id_cols=("event_id",),
        ).collect()
    }
    for eid, (u, m, c) in enumerate(rows):
        if not m:
            assert got[eid] == c / 100.0
            continue
        group_obs = [cv / 100.0 for uv, mv, cv in rows if uv == u and not mv]
        if group_obs:
            assert got[eid] == round(_median(group_obs), 6)
        elif observed_all:
            assert got[eid] == round(_median(observed_all), 6)
        else:
            assert got[eid] is None  # nothing observed anywhere


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    fact_keys=st.lists(st.integers(0, 50), min_size=1, max_size=30),
    dim_keys=st.sets(st.integers(0, 50), min_size=1, max_size=10),
)
def test_bloom_prefilter_join_equals_plain_join(spark, fact_keys, dim_keys):
    fact = spark.createDataFrame([(k,) for k in fact_keys], ["fk"])
    dim = spark.createDataFrame([(k,) for k in dim_keys], ["dk"])
    got = sorted(
        r["fk"] for r in bloom_prefilter_join(
            fact, dim, "fk", "dk", m_bits=512, n_hashes=3
        ).collect()
    )
    expect = sorted(k for k in fact_keys if k in dim_keys)
    assert got == expect


ks_samples = st.lists(
    st.integers(-20, 20), min_size=1, max_size=30
).map(lambda xs: [x / 4.0 for x in xs])


def _ks_model(a, b):
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = 0
    for x in xs:
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * nb - cb * na))
    return best, na, nb


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(a=ks_samples, b=ks_samples)
def test_exact_ks_matches_ecdf_model(spark, a, b):
    from solana_etl_spark.operators.drift import exact_ks

    da = spark.createDataFrame([(v,) for v in a], ["value"])
    db = spark.createDataFrame([(v,) for v in b], ["value"])
    row = exact_ks(da, db).collect()[0]
    num, na, nb = _ks_model(a, b)
    assert (row["n_a"], row["n_b"], row["ks_num"]) == (na, nb, float(num))
    assert row["ks_stat"] == round(num / (na * nb), 6)
