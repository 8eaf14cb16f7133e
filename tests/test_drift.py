"""Drift-report semantics: identical slices score ~0; a location shift
moves both PSI and KS; out-of-range current values clamp into edge bins
instead of being dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_spark.operators.drift import drift_report

SF_DIR = "/root/testdata/sf0.01"


def test_identical_slices_score_zero(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (row,) = drift_report(docs, docs, "n_chars").collect()
    assert row["psi"] == 0.0
    assert row["ks_stat"] == 0.0
    assert row["n_ref"] == row["n_cur"] == docs.count()


def test_location_shift_detected(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    shifted = docs.withColumn("n_chars", F.col("n_chars") * 2)
    (base,) = drift_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "n_chars",
    ).collect()
    (moved,) = drift_report(docs, shifted, "n_chars").collect()
    # same-distribution halves score low; a 2x length shift scores high
    assert moved["psi"] > 10 * max(base["psi"], 0.001)
    assert moved["ks_stat"] > base["ks_stat"]


def test_out_of_range_values_clamp(spark):
    ref = spark.createDataFrame([(v,) for v in range(100, 200)], "v int")
    cur = spark.createDataFrame([(5,), (150,), (10_000,)], "v int")
    (row,) = drift_report(ref, cur, "v").collect()
    # all three current rows counted (edge-bin clamping, none dropped)
    assert row["n_cur"] == 3
    assert row["n_ref"] == 100


def test_embedding_centroid_drift_identity_and_shift(spark):
    from solana_etl_spark.operators.drift import embedding_centroid_drift

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    (same,) = embedding_centroid_drift(emb, emb).collect()
    assert same["centroid_l2"] == 0.0
    assert same["centroid_cos"] == 1.0
    assert same["max_dim_gap"] == 0.0

    shifted = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(0.5))
    )
    (moved,) = embedding_centroid_drift(emb, shifted).collect()
    assert abs(moved["centroid_l2"] - 0.5 * (64 ** 0.5)) < 0.01
    assert moved["max_dim_gap"] > 0.49
    assert moved["centroid_cos"] < 1.0


def test_drift_report_empty_reference_fails_loudly(spark):
    """An empty/all-NULL reference must raise, not emit a finite report
    computed against nothing (reviewed bug: NULL bounds clamp every cur
    row into the top bin)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    empty = docs.filter("doc_id < 0")
    with pytest.raises(SparkRuntimeException, match="refusing to score"):
        drift_report(empty, docs, "n_chars").collect()
    with pytest.raises(SparkRuntimeException, match="refusing to score"):
        drift_report(docs, empty, "n_chars").collect()
    # BOTH slices empty: the histogram has zero rows, so no per-bin guard
    # term ever evaluates — the row-level guard on the always-one-row
    # totals aggregate must fire instead of silently returning zero rows
    # (reviewed bug)
    with pytest.raises(SparkRuntimeException, match="refusing to score"):
        drift_report(empty, empty, "n_chars").collect()


def test_exact_ks_empty_side_contract(spark):
    """Documented empty-input behavior: one empty side -> ks_stat NULL
    (never the silent 0/0 NaN), ks_num 0; both empty -> zero rows."""
    from solana_etl_spark.operators.drift import exact_ks

    some = spark.createDataFrame([(1.0,), (2.0,)], ["value"])
    empty = spark.createDataFrame([], "value double")
    row = exact_ks(some, empty).collect()[0]
    assert (row["n_a"], row["n_b"], row["ks_num"]) == (2, 0, 0.0)
    assert row["ks_stat"] is None
    row = exact_ks(empty, some).collect()[0]
    assert (row["n_a"], row["n_b"]) == (0, 2)
    assert row["ks_stat"] is None
    assert exact_ks(empty, empty).collect() == []


def test_exact_ks_bucket_count_invariant(spark):
    """Split-point choice balances load only: 1 bucket and many buckets
    give the identical statistic."""
    from solana_etl_spark.operators.drift import exact_ks

    a = spark.createDataFrame([(float(i % 13),) for i in range(200)], ["value"])
    b = spark.createDataFrame([(float(i % 17),) for i in range(150)], ["value"])
    one = exact_ks(a, b, n_buckets=1).collect()[0]
    many = exact_ks(a, b, n_buckets=32).collect()[0]
    assert one == many


def test_chi2_identical_slices_zero_and_shift_detected(spark):
    from solana_etl_spark.operators.drift import chi2_report

    same = spark.createDataFrame([(i % 40,) for i in range(400)], ["value"])
    row = chi2_report(same, same, "value").collect()[0]
    assert row["chi2"] == 0.0 and row["dof"] >= 1
    lo = spark.createDataFrame([(i % 10,) for i in range(400)], ["value"])
    hi = spark.createDataFrame([(30 + i % 10,) for i in range(400)], ["value"])
    row = chi2_report(lo, hi, "value").collect()[0]
    assert row["chi2"] > 100  # disjoint supports -> huge statistic


def test_chi2_empty_slice_fails_loudly(spark):
    import pytest

    from solana_etl_spark.operators.drift import chi2_report

    some = spark.createDataFrame([(1,), (2,)], ["value"])
    empty = spark.createDataFrame([], "value long")
    for a, b in ((some, empty), (empty, some), (empty, empty)):
        with pytest.raises(Exception, match="refusing to score"):
            chi2_report(a, b, "value").collect()
