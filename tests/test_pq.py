"""Product quantization: codebook/code shape invariants, partitioning
invariance of the exact-integer pipeline, and ADC reconstruction bounds."""

from __future__ import annotations

from solana_etl_spark.operators import pq
from solana_etl_spark.session import get_spark  # noqa: F401  (fixture session)


def _emb(spark, n=40, dim=64, parts=4):
    rows = [
        (i, [((i * 31 + d * 7) % 100) / 50.0 - 1.0 for d in range(dim)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(parts)


def test_codebook_shape_and_bounds(spark):
    cb = pq.pq_codebooks(_emb(spark), k=4, iters=1).collect()
    assert len(cb) == pq.PQ_M * 4
    assert all(0 <= r["cid"] < 4 for r in cb)
    assert all(len(r["cvec"]) == pq.PQ_SUBDIM for r in cb)


def test_codes_cover_all_vectors_in_range(spark):
    emb = _emb(spark)
    codes = pq.pq_codes(emb).collect()
    assert len(codes) == 40
    for r in codes:
        assert len(r["codes"]) == pq.PQ_M
        assert all(0 <= c < pq.PQ_K for c in r["codes"])


def test_pq_partitioning_invariant(spark):
    a = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq.pq_codes(_emb(spark, parts=1)).collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq.pq_codes(_emb(spark, parts=16)).collect()
    )
    assert a == b


def test_adc_topk_ordering_and_size(spark):
    got = pq.pq_adc_topk(_emb(spark), topk=5).collect()
    assert len(got) == 5
    dists = [r["adc_dist"] for r in got]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)


def test_ivfpq_topk_deterministic_and_ordered(spark):
    a = [tuple(r) for r in pq.ivfpq_topk(_emb(spark, parts=1), topk=5).collect()]
    b = [tuple(r) for r in pq.ivfpq_topk(_emb(spark, parts=16), topk=5).collect()]
    assert a == b
    dists = [d for _, d in a]
    assert dists == sorted(dists) and len(a) == 5


def test_ivfpq_residual_topk_semantics(spark):
    """Residual encoding: partition-invariant, ordered, query-first (the
    query vector's own residual ADC distance reconstructs to near-zero,
    so vec_id 0 must rank first), and zero-residual corpora are exact."""
    a = [
        tuple(r)
        for r in pq.ivfpq_residual_topk(_emb(spark, parts=1), topk=5).collect()
    ]
    b = [
        tuple(r)
        for r in pq.ivfpq_residual_topk(_emb(spark, parts=16), topk=5).collect()
    ]
    assert a == b
    dists = [d for _, d in a]
    assert dists == sorted(dists) and len(a) == 5
    assert a[0][0] == 0  # the query is its own nearest neighbor

    # perfect-cluster corpus: duplicated vectors -> residuals are all zero
    # vectors, every ADC distance is exactly 0 (residual PQ is EXACT here,
    # where raw-vector PQ would still quantize)
    import pyspark.sql.functions as F

    dup = _emb(spark, n=6).withColumn(
        "embedding", F.expr("transform(embedding, x -> float(0.5))")
    )
    got = pq.ivfpq_residual_topk(dup, topk=3, nprobe=8).collect()
    assert all(r["adc_dist"] == 0 for r in got)
