"""Hand-built known-answer tests for the round-6 additions: rolling
window stats, group-median imputation, and SQ8 scalar-quantized ANN."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from solana_etl_spark.operators.impute import impute_group_median
from solana_etl_spark.operators.similarity import (
    sq8_dim_stats,
    sq8_topk,
)
from solana_etl_spark.operators.timeseries import rolling_stats


def test_rolling_stats_window_ramps_and_slides(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (1, t.replace(minute=m), m, float(v))
        for m, v in [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0), (4, 5.0), (5, 6.0)]
    ] + [(2, t, 99, 10.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {
        r["event_id"]: (r["roll_sum"], r["n_window"], r["roll_mean"],
                        r["roll_min"], r["roll_max"])
        for r in rolling_stats(df, n_rows=3).collect()
    }
    assert got[0] == (1.0, 1, 1.0, 1.0, 1.0)          # ramp-up: 1 row
    assert got[1] == (3.0, 2, 1.5, 1.0, 2.0)          # ramp-up: 2 rows
    assert got[2] == (6.0, 3, 2.0, 1.0, 3.0)          # full frame
    assert got[5] == (15.0, 3, 5.0, 4.0, 6.0)         # sliding: {4,5,6}
    assert got[99] == (10.0, 1, 10.0, 10.0, 10.0)     # isolated key


def test_rolling_stats_drops_null_values(spark):
    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 0, 2.0), (1, t.replace(minute=1), 1, None),
         (1, t.replace(minute=2), 2, 4.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    got = {r["event_id"]: r["roll_sum"] for r in rolling_stats(df).collect()}
    assert 1 not in got              # null-valued row emits nothing
    assert got[2] == 6.0             # and doesn't occupy a frame slot


def test_impute_group_median_group_and_global_fallback(spark):
    rows = [
        # user 1: observed 1, 3, 5 -> median 3
        (0, 1, "ok", 1.0), (1, 1, "ok", 3.0), (2, 1, "ok", 5.0),
        (3, 1, "error", 999.0),
        # user 2: all-missing -> global observed median of (1,3,5,10) = 4
        (4, 2, "error", -1.0),
        # user 3: observed 10; non-missing NULL stays NULL
        (5, 3, "ok", 10.0), (6, 3, "ok", None),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value"]
    )
    out = impute_group_median(
        df,
        key_col="user_id",
        value_col="value",
        is_missing=F.col("event_type") == "error",
        id_cols=("event_id",),
    )
    got = {r["event_id"]: (r["is_missing"], r["value_imputed"])
           for r in out.collect()}
    assert got[0] == (False, 1.0)
    assert got[3] == (True, 3.0)     # user-1 median, not its raw 999
    assert got[4] == (True, 4.0)     # global fallback for all-missing user
    assert got[6] == (False, None)   # non-missing NULL passes through


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        ["vec_id", "embedding", "label"],
    )


def test_sq8_dim_stats_min_range_and_constant_dim(spark):
    df = _emb_df(spark, [[0.0, 5.0, 7.0], [4.0, 1.0, 7.0], [2.0, 3.0, 7.0]])
    stats = sq8_dim_stats(df)
    assert stats[0] == (0.0, 4.0)
    assert stats[1] == (1.0, 4.0)
    assert stats[2] == (7.0, 1.0)    # constant dim -> range 1 (codes all 0)


def test_sq8_topk_orders_by_true_cosine(spark):
    # query = vec 0; vec 1 is a positive scalar multiple (cosine 1.0),
    # vec 2 is orthogonal, vec 3 is opposite
    df = _emb_df(
        spark,
        [[1.0, 0.0], [2.0, 0.0], [0.0, 3.0], [-1.0, 0.0]],
    )
    rows = sq8_topk(df, k=3, refine_factor=2).collect()
    assert [r["vec_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["cosine_sim"] == pytest.approx(1.0)
    assert rows[1]["cosine_sim"] == pytest.approx(0.0)
    assert rows[2]["cosine_sim"] == pytest.approx(-1.0)
    # integer candidate scores: max code product for the collinear vector
    assert rows[0]["score_sq8"] >= rows[2]["score_sq8"]


def test_sq8_codes_are_integer_and_bounded(spark):
    from solana_etl_spark.operators.similarity import _sq8_codes

    df = _emb_df(spark, [[0.0, 1.0], [10.0, 3.0], [5.0, 2.0]])
    stats = sq8_dim_stats(df)
    codes = df.select(
        F.explode(_sq8_codes(F.col("embedding"), stats)).alias("c")
    ).collect()
    vals = [r["c"] for r in codes]
    assert all(0 <= v <= 255 for v in vals)
    assert 0 in vals and 255 in vals  # min and max hit the code range ends


def test_rp_signs_deterministic_and_balanced(spark):
    from solana_etl_spark.operators.similarity import rp_signs

    a = rp_signs(32, 8)
    b = rp_signs(32, 8)
    assert a == b                     # pure function of dims
    flat = [s for row in a for s in row]
    assert set(flat) == {1.0, -1.0}
    assert 0.3 < flat.count(1.0) / len(flat) < 0.7   # roughly balanced


def test_rp_topk_exact_rerank_orders_by_true_cosine(spark):
    # collinear vector must surface at rank 1 after the exact rerank even
    # though the sketch only approximates scores
    df = _emb_df(
        spark,
        [[1.0, 0.0, 2.0], [3.0, 0.0, 6.0], [0.0, 1.0, 0.0], [-1.0, 0.0, -2.0]],
    )
    from solana_etl_spark.operators.similarity import rp_topk

    rows = rp_topk(df, k=3, out_dim=4, refine_factor=2).collect()
    assert rows[0]["vec_id"] == 1
    assert rows[0]["cosine_sim"] == pytest.approx(1.0)
    assert rows[-1]["cosine_sim"] == pytest.approx(-1.0)


def test_bloom_prefilter_join_equals_plain_join_and_prunes(spark):
    from solana_etl_spark.operators.sketch import (
        BLOOM_N_HASHES,
        bloom_prefilter_join,
        _bloom_positions,
    )

    fact = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 201)], ["fk", "payload"]
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in (3, 50, 199)], ["dk", "name"]
    )
    out = bloom_prefilter_join(fact, dim, "fk", "dk")
    got = sorted((r["fk"], r["name"]) for r in out.collect())
    assert got == [(3, "d3"), (50, "d50"), (199, "d199")]
    # helper columns must not leak into the result schema
    assert not any(c.startswith("_b") for c in out.columns)

    # the pre-filter itself must PRUNE (not be a tautology the join then
    # cleans up): probe every fact key against the same bitmap and check
    # the maybe-member set is small — all 3 true members plus at most a
    # few false positives, never all 200
    from solana_etl_spark.operators.sketch import bloom_build, bloom_probe
    import pyspark.sql.functions as F

    bitmap = bloom_build(
        dim.select(F.col("dk").cast("string").alias("key")), "key"
    )
    probed = bloom_probe(
        fact.select(F.col("fk").cast("string").alias("key")), bitmap
    )
    n_maybe = probed.filter("maybe_member").count()
    assert 3 <= n_maybe < 50  # prunes >75% of the 200 fact keys
    # and the semi-join result is exactly the true members
    n_semi = bloom_prefilter_join(fact, dim, "fk", "dk", how="left_semi").count()
    assert n_semi == 3


def test_bloom_prefilter_join_never_drops_matches(spark):
    # false negatives are impossible: every dim key's fact rows survive,
    # even with a deliberately tiny (collision-heavy) filter
    from solana_etl_spark.operators.sketch import bloom_prefilter_join

    fact = spark.createDataFrame([(k,) for k in range(1000)], ["fk"])
    dim = spark.createDataFrame([(k,) for k in range(0, 1000, 7)], ["dk"])
    out = bloom_prefilter_join(fact, dim, "fk", "dk", m_bits=256, n_hashes=2)
    assert out.count() == len(range(0, 1000, 7))


def test_scene_cut_stats_detects_known_jump(spark):
    from solana_etl_spark.operators.multimodal import scene_cut_stats

    # frames of 4 bytes: [1,1,1,1]=4, [1,1,1,1]=4, [200,200,200,200]=800
    # -> one jump of 796 between frames 1 and 2
    payload = bytes([1] * 8 + [200] * 4)
    media = spark.createDataFrame(
        [(7, payload, "video/raw", "t")],
        ["media_id", "payload", "mime", "meta_source"],
    )
    row = scene_cut_stats(media, frame_size=4, threshold=500).collect()[0]
    assert (row["n_frames"], row["n_cuts"], row["max_jump"]) == (3, 1, 796)


def test_scene_cut_stats_single_frame_has_no_cuts(spark):
    from solana_etl_spark.operators.multimodal import scene_cut_stats

    media = spark.createDataFrame(
        [(1, bytes([5, 5]), "video/raw", "t")],
        ["media_id", "payload", "mime", "meta_source"],
    )
    row = scene_cut_stats(media, frame_size=4).collect()[0]
    assert (row["n_frames"], row["n_cuts"], row["max_jump"]) == (1, 0, 0)


def test_streaming_sample_retry_and_order_invariance(spark, tmp_path):
    # the sample after (batch0, batch1) must equal the sample after
    # (batch1, batch0) AND after replaying batch0 — min-n is a pure
    # function of the seen SET
    from solana_etl_spark.streaming.sample_stream import (
        read_sample,
        update_sample_batch,
    )

    a = spark.createDataFrame([(i,) for i in range(0, 50)], ["doc_id"])
    b = spark.createDataFrame([(i,) for i in range(40, 90)], ["doc_id"])

    def run(state, batches):
        for bid, df in batches:
            update_sample_batch(spark, df, str(state), bid, n=10)
        return sorted(
            (r["doc_id"], r["sample_rank"])
            for r in read_sample(spark, str(state)).collect()
        )

    s1 = run(tmp_path / "s1", [(0, a), (1, b)])
    s2 = run(tmp_path / "s2", [(0, b), (1, a)])
    s3 = run(tmp_path / "s3", [(0, a), (1, b), (1, b)])  # batch-1 retried
    assert s1 == s2 == s3
    assert len(s1) == 10


def test_exact_ks_known_distributions(spark):
    from solana_etl_spark.operators.drift import exact_ks

    # identical samples -> KS 0; disjoint supports -> KS 1
    same = spark.createDataFrame([(float(i),) for i in range(10)], ["value"])
    row = exact_ks(same, same).collect()[0]
    assert (row["ks_num"], row["ks_stat"]) == (0.0, 0.0)

    lo = spark.createDataFrame([(float(i),) for i in range(5)], ["value"])
    hi = spark.createDataFrame([(float(i),) for i in range(10, 15)], ["value"])
    row = exact_ks(lo, hi).collect()[0]
    assert row["ks_stat"] == 1.0

    # hand case: a={1,2}, b={2,3}: ECDF gaps 1/2, 1/2, 0 -> KS 1/2
    a = spark.createDataFrame([(1.0,), (2.0,)], ["value"])
    b = spark.createDataFrame([(2.0,), (3.0,)], ["value"])
    row = exact_ks(a, b).collect()[0]
    assert (row["n_a"], row["n_b"], row["ks_num"], row["ks_stat"]) == (
        2, 2, 2.0, 0.5,
    )


def test_bloom_prefilter_fast_hash_same_result(spark):
    # join equivalence holds under ANY base hash: xxhash64 mode must give
    # the identical join result as the md5 mode (only the invisible
    # false-positive set may differ)
    from solana_etl_spark.operators.sketch import bloom_prefilter_join

    fact = spark.createDataFrame([(k,) for k in range(500)], ["fk"])
    dim = spark.createDataFrame([(k,) for k in range(0, 500, 11)], ["dk"])
    slow = sorted(
        r["fk"] for r in bloom_prefilter_join(fact, dim, "fk", "dk").collect()
    )
    fast = sorted(
        r["fk"]
        for r in bloom_prefilter_join(
            fact, dim, "fk", "dk", fast_hash=True
        ).collect()
    )
    assert slow == fast == sorted(range(0, 500, 11))


def test_gini_known_distributions(spark, tmp_path):
    from solana_etl_spark.queries import all_queries
    import os

    # equal sizes -> G = 0; one doc owns (almost) everything -> G -> 1
    d = str(tmp_path)
    rows = (
        [(i, "x", "eq", "s", 100) for i in range(4)]
        + [(10, "x", "sk", "s", 1), (11, "x", "sk", "s", 1),
           (12, "x", "sk", "s", 9998)]
    )
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["lang"]: (r["n_docs"], r["gini"])
        for r in all_queries()["a24_gini_concentration"](spark, d).collect()
    }
    assert got["eq"] == (4, 0.0)
    # exact: x=(1,1,9998): G = (2*29997 - 4*10000)/(3*10000) = 19994/30000
    assert got["sk"][1] == 0.666467


def test_frame_signatures_skip_null_payload(spark):
    """A NULL payload row is skipped, like the other multimodal kernels —
    it must not TypeError the whole mapInPandas job."""
    from solana_etl_spark.operators.multimodal import frame_signatures

    media = spark.createDataFrame(
        [(1, bytearray(b"\x01" * 40)), (2, None)],
        "media_id long, payload binary",
    )
    rows = frame_signatures(media, frame_size=16).collect()
    assert {r["media_id"] for r in rows} == {1}
    assert len(rows) == 3  # ceil(40/16)
