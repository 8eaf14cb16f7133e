"""Margin-based bitext mining and Bloom-filter membership."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

TESTDATA = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet")


def test_mine_bitext_margin_semantics(spark, embeddings):
    from solana_etl_spark.operators.mining import mine_bitext

    src = embeddings.filter("label < 5")
    tgt = embeddings.filter("label >= 5")
    rows = mine_bitext(src, tgt, k=4, threshold=0.0).collect()
    assert rows, "bucket collisions must exist in the fixture"

    src_ids = {r["vec_id"] for r in src.select("vec_id").collect()}
    tgt_ids = {r["vec_id"] for r in tgt.select("vec_id").collect()}
    seen_src = set()
    for r in rows:
        assert r["src_id"] in src_ids
        assert r["tgt_id"] in tgt_ids
        assert r["src_id"] not in seen_src, "one best pair per source"
        seen_src.add(r["src_id"])
        assert r["margin"] is not None and r["margin"] > 0
        assert -1.000001 <= r["cosine_sim"] <= 1.000001

    # threshold monotonicity: raising it can only shrink the result
    n_low = len(rows)
    n_high = mine_bitext(src, tgt, k=4, threshold=1.0).count()
    assert n_high <= n_low


def test_mine_bitext_margin_definition_bruteforce(spark):
    """Tiny corpus where the bucket join degenerates to all-pairs: margin
    must equal the hand-computed ratio definition."""
    from solana_etl_spark.operators.mining import mine_bitext

    # identical embeddings -> one sign bucket -> all cross pairs are
    # candidates; distinct vec_ids give deterministic ranking.
    vec = [1.0] * 64
    src = spark.createDataFrame(
        [(1, vec, 0), (2, vec, 0)], "vec_id long, embedding array<float>, label int"
    )
    tgt = spark.createDataFrame(
        [(10, vec, 5), (11, vec, 5), (12, vec, 5)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r["src_id"]: r
        for r in mine_bitext(src, tgt, k=2, threshold=0.0).collect()
    }
    # every cosine is exactly 1.0 -> every neighborhood average is 1.0
    # -> margin is exactly 1.0; best tgt ties break to the smallest id
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["tgt_id"] == 10
        assert r["cosine_sim"] == pytest.approx(1.0)
        assert r["margin"] == pytest.approx(1.0)


def test_bloom_no_false_negatives_and_determinism(spark):
    from solana_etl_spark.operators.sketch import bloom_build, bloom_probe

    keys = spark.range(200).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    members = spark.range(0, 200, 2).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    bloom = bloom_build(members)
    probed = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(keys, bloom).collect()
    }
    # every built key MUST hit
    for i in range(0, 200, 2):
        assert probed[f"key-{i}"] is True
    # non-members: mostly miss at this m/n ratio (fp rate ~ tiny); and
    # the verdicts are deterministic across a rebuild
    misses = [k for k, v in probed.items() if not v]
    assert len(misses) >= 90  # of the 100 non-members
    probed2 = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(keys, bloom_build(members)).collect()
    }
    assert probed == probed2


def test_bloom_bitmap_is_bounded(spark):
    from solana_etl_spark.operators.sketch import (
        BLOOM_M_BITS,
        bloom_build,
    )

    members = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    n_words = bloom_build(members).count()
    assert n_words <= BLOOM_M_BITS // 63 + 1
