"""Sampling operators: epoch up-sampling mixing recipe (hash sampling,
mixture, quantile bins etc. are covered by the registry gate queries)."""

from __future__ import annotations

from pyspark.sql import functions as F



def test_epoch_upsample_multiplicities(spark):
    """Integer factors duplicate exactly; fractional factors land within
    the deterministic hash draw; factor<1 down-samples; default is 1x."""
    from solana_etl_spark.operators.sampling import epoch_upsample

    rows = [(i, f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    out = epoch_upsample(
        df, "doc_id", "source",
        {"src0": 30000, "src1": 25000, "src2": 5000},
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src0"] == 300  # exact 3x
    assert counts["src3"] == 100  # default 1x
    assert 220 <= counts["src1"] <= 280  # 2.5x in expectation
    assert 30 <= counts["src2"] <= 70    # 0.5x in expectation
    # per-doc epochs are 1..k contiguous for integer factors
    epochs = sorted(
        r["epoch"]
        for r in out.filter("doc_id = 0").select("epoch").collect()
    )
    assert epochs == [1, 2, 3]
    # deterministic: same input -> same realized copy set
    again = epoch_upsample(
        df, "doc_id", "source",
        {"src0": 30000, "src1": 25000, "src2": 5000},
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_cluster_safe_split_no_near_dup_leakage(spark):
    """Near-duplicate pairs must land in the SAME split when membership
    hashes the cluster id (the leak a per-doc hash split allows)."""
    from solana_etl_spark.operators import dedup
    from solana_etl_spark.operators.sampling import train_val_test_split
    import pyspark.sql.functions as F

    rows = [
        (i, t, "en", "s0", len(t))
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog and runs away fast",
                "the quick brown fox jumps over the lazy cat and runs away fast",
                "completely unrelated text about distributed query engines here",
                "another fully distinct document with its own vocabulary set",
            ]
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    pairs = dedup.minhash_lsh_pairs(docs)
    clusters = dedup.connected_components(pairs)
    members = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    out = {r.doc_id: r for r in train_val_test_split(members, "cluster_id").collect()}
    # docs 0 and 1 are near-dups → same cluster → same split, always
    assert out[0].cluster_id == out[1].cluster_id
    assert out[0].split == out[1].split


def test_categorical_draws_exact_and_proportional(spark):
    from solana_etl_spark.operators.sampling import categorical_draws
    import pyspark.sql.functions as F

    counts = spark.createDataFrame(
        [("common", 90), ("rare", 10), ("never", 0)], ["tok", "c"]
    )
    out = categorical_draws(counts, "tok", "c", 500).collect()
    # exactly one item per draw; zero-weight items never drawn
    assert len(out) == 500
    assert len({r.draw_id for r in out}) == 500
    by_tok = {}
    for r in out:
        by_tok[r.tok] = by_tok.get(r.tok, 0) + 1
    assert "never" not in by_tok
    # ~90/10 split within generous bounds (hash-uniform, deterministic)
    assert by_tok["common"] > 5 * by_tok.get("rare", 1)
    # determinism: re-run is identical
    again = categorical_draws(counts, "tok", "c", 500).collect()
    assert sorted((r.draw_id, r.tok) for r in out) == sorted(
        (r.draw_id, r.tok) for r in again
    )


def test_ntile_from_rank_matches_builtin_ntile(spark):
    """The closed-form NTILE reconstruction must equal F.ntile for every
    (n, tiles) shape — uneven splits included."""
    from pyspark.sql.window import Window

    from solana_etl_spark.operators.prefix import ntile_from_rank

    for n in (1, 2, 3, 5, 6, 7, 10, 13, 100, 101):
        for tiles in (2, 3, 4, 7):
            df = spark.range(1, n + 1).select(F.col("id").alias("rk"))
            got = df.select(
                "rk",
                ntile_from_rank(F.col("rk"), F.lit(n), tiles).alias("t"),
            )
            want = spark.range(0, n).select(
                (F.col("id") + 1).alias("rk"),
                F.ntile(tiles).over(Window.orderBy("id")).alias("t"),
            )
            g = {r["rk"]: r["t"] for r in got.collect()}
            w = {r["rk"]: r["t"] for r in want.collect()}
            assert g == w, (n, tiles)
