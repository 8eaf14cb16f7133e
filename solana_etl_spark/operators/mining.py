"""Contrastive-pair mining for embedding-model training: for each anchor
vector, the nearest SAME-label vector (positive) and the top-k nearest
DIFFERENT-label vectors (hard negatives) — the (anchor, positive,
hard-negative) triplets a contrastive/metric-learning trainer consumes.
Random negatives are easy; the informative ones are the high-similarity
wrong-label neighbors this miner surfaces.

Scale shape: the anchor set is a bounded deterministic sample (smallest
``n_anchors`` vec_ids) broadcast against ONE normalized corpus scan — the
corpus itself never shuffles. Ranking is a single window keyed by
``anchor``: scored rows shuffle once, with volume ``n_anchors × corpus``
rows of (ids, double) — bounded by the anchor budget, never corpus².
The positive is found in the SAME window pass (full-frame struct-max),
so there is no positives⋈negatives self-join and the corpus is scanned
exactly once. At real scale you mine in
anchor batches; each batch is this exact plan. For corpus-wide mining,
restrict candidates first with similarity.lsh_sign_buckets (same
bucket-key pattern as embedding_neardup_pairs) so the scored volume is
per-bucket, not anchors × corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.operators.similarity import _dot, normalized

N_ANCHORS = 20
K_NEG = 5


def bucketed_hard_negatives(
    embeddings: DataFrame, k_neg: int = K_NEG
) -> DataFrame:
    """CORPUS-WIDE hard-negative candidate generation — the scale path the
    anchor-batch miner's docstring promises: every vector is an anchor,
    candidates are restricted to its sign-LSH bucket (the
    embedding_neardup_pairs partitioning), so the pair stream is
    per-bucket, never corpus². ``(q_id, neg_rank, neg_id, neg_sim)`` —
    the top-``k_neg`` highest-similarity WRONG-label vectors in each
    anchor's bucket (rank ties to the smaller vec_id). Approximate by
    construction: negatives outside the anchor's bucket are out of
    contract (the recall/cost dial is the bucket bit width). Anchors
    whose bucket holds no wrong-label vector emit nothing. NULL labels
    are excluded (same contract as hard_negative_triplets).

    Plan: one bucket-keyed equi-self-join + one window keyed by anchor —
    two shuffles, both bounded by bucket occupancy."""
    from solana_etl_spark.operators.similarity import lsh_sign_buckets

    nemb = normalized(embeddings).filter(F.col("label").isNotNull())
    space = nemb.select("vec_id", "label", "_nemb").join(
        lsh_sign_buckets(embeddings).select("vec_id", "bucket"), "vec_id"
    )
    a = space.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("_nemb").alias("q_vec"),
        "bucket",
    )
    cand = space.join(a, "bucket").filter(
        (F.col("vec_id") != F.col("q_id"))
        & (F.col("label") != F.col("q_label"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.select(
            "q_id", "vec_id", _dot(F.col("_nemb"), F.col("q_vec")).alias("sim")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k_neg)
        .select(
            "q_id",
            F.col("rnk").alias("neg_rank"),
            F.col("vec_id").alias("neg_id"),
            F.round("sim", 6).alias("neg_sim"),
        )
    )


def hard_negative_triplets(
    embeddings: DataFrame, n_anchors: int = N_ANCHORS, k_neg: int = K_NEG
) -> DataFrame:
    """(q_id, pos_id, pos_sim, neg_rank, neg_id, neg_sim, margin) — one row
    per (anchor, hard negative), ``neg_rank`` 1-based by similarity
    descending (vec_id ascending on ties). ``margin`` = positive
    similarity − negative similarity (raw doubles, rounded at 6 — the
    cross-engine float boundary for the normalize-then-dot cosine);
    negative margins are the anchors a trainer learns most from. Anchors
    with no same-label neighbor are dropped (no positive to anchor the
    triplet).

    Label contract: rows with a NULL label are excluded up front —
    supervised mining needs a label on every side. (Left in, a NULL
    label's three-valued ``same_label`` would sort NULLS FIRST through
    the rank window and silently shift every real negative's rank.)"""
    nemb = (
        normalized(embeddings)
        .filter(F.col("label").isNotNull())
        .select("vec_id", "label", "_nemb")
    )
    anchors = (
        nemb.orderBy("vec_id")
        .limit(n_anchors)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("_nemb").alias("q_vec"),
        )
    )
    scored = (
        nemb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (F.col("label") == F.col("q_label")).alias("same_label"),
            _dot(F.col("_nemb"), F.col("q_vec")).alias("sim"),
        )
    )
    # ONE window shuffle keyed by q_id serves both roles: ordering negatives
    # first (false < true) makes row_number() the 1-based negative rank for
    # every negative row, and a full-frame struct-max over the same partition
    # finds the positive (max sim, ties to the smallest vec_id via -id) —
    # no positives⋈negatives self-join, the scored stream is ranked in place.
    w_rank = Window.partitionBy("q_id").orderBy(
        F.asc("same_label"), F.desc("sim"), F.asc("vec_id")
    )
    w_all = Window.partitionBy("q_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pos = F.max(
        F.when(
            F.col("same_label"),
            F.struct(F.col("sim").alias("s"), (-F.col("vec_id")).alias("nid")),
        )
    ).over(w_all)
    ranked = scored.withColumn("rnk", F.row_number().over(w_rank)).withColumn(
        "_pos", pos
    )
    return (
        ranked.filter(
            ~F.col("same_label")
            & (F.col("rnk") <= k_neg)
            & F.col("_pos").isNotNull()
        )
        .select(
            "q_id",
            (-F.col("_pos.nid")).alias("pos_id"),
            F.round(F.col("_pos.s"), 6).alias("pos_sim"),
            F.col("rnk").alias("neg_rank"),
            F.col("vec_id").alias("neg_id"),
            F.round(F.col("sim"), 6).alias("neg_sim"),
            F.round(F.col("_pos.s") - F.col("sim"), 6).alias("margin"),
        )
    )


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
) -> DataFrame:
    """Margin-based bitext mining (the ratio-margin criterion of
    Artetxe & Schwenk 2019, the CCMatrix/WikiMatrix parallel-corpus
    recipe): for every source vector, its best cross-set match and the
    margin score

        margin(x, y) = cos(x, y) / ((avg_topk_y' cos(x, y')
                                     + avg_topk_x' cos(x', y)) / 2)

    — a raw-cosine threshold over-selects hubs (vectors similar to
    everything); dividing by the two neighborhoods' average similarity
    keeps only pairs that stand OUT of their neighborhoods.

    Candidates are restricted to sign-LSH bucket collisions (the
    embedding_neardup_pairs partitioning) so the scored stream is
    per-bucket, never |src| × |tgt| — approximate by construction
    (cross-bucket pairs are out of contract; the recall/cost dial is the
    bucket bit width), deterministic, and the top-k neighborhoods in the
    margin are the top-k WITHIN the candidate set, mirrored exactly by
    the oracle.

    Exactness across engines: each cosine is rounded once to micro-units
    (an int64 ``ci = round(cos · 10⁶)``); neighborhood averages and the
    margin are then EXACT integer arithmetic —
    ``margin = 2·ci·kx·ky / (sax·ky + say·kx)`` with one final double
    division — so top-k SUM order can never drift a value-hash bit.

    Output: (src_id, tgt_id, cosine_sim, margin) — the best target per
    source among its candidates (ties to the smaller tgt_id), kept when
    margin ≥ threshold. Sources with no bucket collision emit nothing.

    Plan: one bucket-keyed equi-join + two window families (src-keyed,
    tgt-keyed) — three bounded shuffles, corpus scanned once per side.
    """
    from solana_etl_spark.operators.similarity import _sign_bucket

    def _space(df: DataFrame, side: str) -> DataFrame:
        # the bucket is a per-row expression FUSED into the projection
        # (one scan, no vec_id self-join) — _sign_bucket's documented
        # contract; also keeps this operator label-agnostic (needs only
        # vec_id + embedding)
        return normalized(df).select(
            F.col("vec_id").alias(f"{side}_id"),
            F.col("_nemb").alias(f"{side}_vec"),
            _sign_bucket().alias("bucket"),
        )

    cand = _space(src, "src").join(_space(tgt, "tgt"), "bucket")
    scored = cand.select(
        "src_id",
        "tgt_id",
        F.round(_dot(F.col("src_vec"), F.col("tgt_vec")) * 1e6, 0)
        .cast("long")
        .alias("ci"),
    )

    ws_rank = Window.partitionBy("src_id").orderBy(
        F.desc("ci"), F.asc("tgt_id")
    )
    wt_rank = Window.partitionBy("tgt_id").orderBy(
        F.desc("ci"), F.asc("src_id")
    )
    ws_all = Window.partitionBy("src_id")
    wt_all = Window.partitionBy("tgt_id")
    in_topk_s = F.col("rs") <= k
    in_topk_t = F.col("rt") <= k
    ranked = (
        scored.withColumn("rs", F.row_number().over(ws_rank))
        .withColumn("rt", F.row_number().over(wt_rank))
        .withColumn("sax", F.sum(F.when(in_topk_s, F.col("ci"))).over(ws_all))
        .withColumn("kx", F.sum(F.when(in_topk_s, F.lit(1))).over(ws_all))
        .withColumn("say", F.sum(F.when(in_topk_t, F.col("ci"))).over(wt_all))
        .withColumn("ky", F.sum(F.when(in_topk_t, F.lit(1))).over(wt_all))
    )
    den = F.col("sax") * F.col("ky") + F.col("say") * F.col("kx")
    margin = F.round(
        (F.lit(2.0) * F.col("ci") * F.col("kx") * F.col("ky")) / den, 6
    )
    return (
        ranked.filter(F.col("rs") == 1)
        .filter(den > 0)
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("ci") / 1e6, 6).alias("cosine_sim"),
            margin.alias("margin"),
        )
        .filter(F.col("margin") >= threshold)
    )
