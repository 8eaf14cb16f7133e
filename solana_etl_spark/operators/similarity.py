"""Similarity search over an embedding column (``embeddings(vec_id,
embedding float[], label)``) — charter §2.11.

Scale design:

* **brute-force cosine top-k** — the correctness baseline: one pass computing
  dot(query, v) per row with ``zip_with``+``aggregate`` (JVM, no UDF), then a
  global top-k. The query vector is a broadcast-sized literal; the scan is
  embarrassingly parallel. This is the right plan up to ~10^8 vectors.
* **bucketed near-dup / LSH** — pair generation keyed by bucket (label or a
  deterministic sign-projection signature), never all-pairs; the standard
  sub-quadratic path at 100 TB. IVF-style: probe only matching buckets.

Floating point: dot products are folded sequentially over the array in BOTH
engines (Spark ``aggregate``, DuckDB ``list_reduce``-equivalent comprehension
sum), and inputs are float32 upcast to float64, so scores are bit-identical
and safe to compare at 6 decimals against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solana_etl_spark.functions.parallelism import ensure_compute_parallelism

COSINE_NEARDUP_THRESHOLD = 0.95
TOPK = 10
LSH_SIGN_BITS = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def normalized(embeddings: DataFrame) -> DataFrame:
    """Pre-normalize embeddings once (÷ L2 norm) so pairwise cosine becomes
    a single dot product — norms are NOT recomputed per pair. The oracle
    mirrors this exact normalize-then-dot formula (float division order
    matters bit-for-bit)."""
    emb = F.col("embedding")
    return ensure_compute_parallelism(embeddings).withColumn(
        "_nemb",
        F.transform(emb, lambda x: x.cast("double") / _norm(emb)),
    )


def cosine_topk(embeddings: DataFrame, k: int = TOPK) -> DataFrame:
    """Top-k most-similar vectors to the corpus's min-vec_id query vector
    (deterministic choice), ties broken by vec_id.

    Plan: broadcast the 1-row query side (cross join with a literal-sized
    dim), score per row, global top-k via sort+limit (Spark runs this as
    TakeOrderedAndProject — no full sort materialization)."""
    nemb = normalized(embeddings)
    q = nemb.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("q_id"), F.col("_nemb").alias("q_vec")
    )
    scored = nemb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
    return (
        scored.select(
            "vec_id",
            F.round(_dot(F.col("_nemb"), F.col("q_vec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = COSINE_NEARDUP_THRESHOLD
) -> DataFrame:
    """Near-duplicate vector pairs: candidates share a sign-projection LSH
    bucket (:func:`lsh_sign_buckets`), then each candidate pair is verified
    exactly with one dot product over pre-normalized embeddings.

    Scale shape: the join is keyed by the 2^LSH_SIGN_BITS-value bucket
    column, so the candidate count is Σ_buckets n_b², sub-quadratic whenever
    the projection spreads the corpus — vs the r1 label-bucket form, which
    degenerated to all-pairs-per-label with O(1) labels. Near-identical
    vectors agree on sign comparisons except at coordinates near the
    hyperplane, so recall is high by construction; the oracle mirrors the
    same candidate definition, making the operator deterministic
    (approximate-by-definition, not approximate-by-race)."""
    space = normalized(embeddings).select(
        "vec_id", "_nemb", _sign_bucket(LSH_SIGN_BITS).alias("bucket")
    )
    a, b = space.alias("a"), space.alias("b")
    sim = F.round(_dot(F.col("a._nemb"), F.col("b._nemb")), 6)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ann_bucketed_topk(embeddings: DataFrame, k: int = TOPK) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket (IVF-style
    probe). At scale the bucket column is the partition key, so a probe
    reads one partition instead of the corpus; recall is traded for a
    ~2^bits scan reduction. Same deterministic scoring as the exact path."""
    scored_space = normalized(embeddings).select(
        "vec_id", "_nemb", _sign_bucket(LSH_SIGN_BITS).alias("bucket")
    )
    q = (
        scored_space.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("_nemb").alias("q_vec"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    candidates = scored_space.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    return (
        candidates.select(
            "vec_id",
            F.round(_dot(F.col("_nemb"), F.col("q_vec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def semantic_dedup(
    embeddings: DataFrame, threshold: float = COSINE_NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-level corpus dedup, the semantic analog of the text dedup
    capstone: sign-LSH candidate pairs verified by exact cosine
    (:func:`embedding_neardup_pairs`) → transitive clusters (pointer-jumping
    connected components) → one keeper per cluster (min vec_id).

    Returns (vec_id, cluster_id, is_keeper) for EVERY input vector —
    singletons are their own keeper — so a training pipeline can
    ``filter(is_keeper)`` to drop semantic duplicates in one join.

    Scale shape: candidates are bucket-keyed (sub-quadratic), the cluster
    step is O(log diameter) rounds, and the final join is on vec_id only —
    no step touches all-pairs or collects to the driver.

    Why CC consumes verified PAIRS here (unlike the text-dedup cluster
    family, which feeds CC from ``dedup.lsh_star_edges``): the text
    clusters' edge relation IS bucket co-membership — an equivalence
    generator — so a per-bucket star spans identical components with
    linear edges. Here the edge relation is ``cosine ≥ threshold``,
    verified per pair; a bucket star would union every bucket co-member
    regardless of cosine (coarser, WRONG clusters — e.g. two far vectors
    that merely share a sign bucket). The verified pair set is the
    semantic definition, and its volume is already bounded by the bucket
    join (Σ_buckets n_b²) — at 100 TB you size LSH_SIGN_BITS so buckets
    stay small, which bounds pairs and CC edges together.
    """
    from solana_etl_spark.operators.dedup import connected_components

    pairs = embedding_neardup_pairs(embeddings, threshold)
    cc = connected_components(pairs, src="vec_a", dst="vec_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
    return (
        embeddings.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col("cluster_id") == F.col("vec_id"))
    )


def _sign_bucket(bits: int = LSH_SIGN_BITS) -> Column:
    """Sign-projection bucket expression over the raw ``embedding`` column:
    bit j compares coordinate j against coordinate j+bits (a fixed,
    data-independent hyperplane family). A per-row expression, so callers
    fuse it into their projection instead of joining a separate bucket
    relation (one scan, no join)."""
    emb = F.col("embedding")
    bucket = None
    for j in range(bits):
        bit = F.when(
            F.element_at(emb, j + 1).cast("double")
            > F.element_at(emb, j + 1 + bits).cast("double"),
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_sign_buckets(embeddings: DataFrame, bits: int = LSH_SIGN_BITS) -> DataFrame:
    """Deterministic sign-projection LSH bucket per vector. Bucket-equal
    vectors are ANN candidates; at scale this is the IVF/LSH partitioning
    key."""
    return embeddings.select(
        "vec_id", "label", _sign_bucket(bits).alias("bucket")
    )


# --- IVF with learned centroids (deterministic integer k-means) ------------
IVF_K = 8  # centroid count
IVF_ITERS = 2  # fixed Lloyd iterations (no convergence check → SQL-unrollable)
IVF_SCALE = 1_000_000  # float → scaled-int64 quantization factor
IVF_DIM = 64
IVF_NPROBE = 2


def quantized(embeddings: DataFrame) -> DataFrame:
    """vec_id + embedding quantized to scaled int64 (round(x·1e6)).

    All downstream k-means math is EXACT integer arithmetic: distances,
    centroid sums, and the truncating mean are bit-identical across engines
    AND across partitionings (float accumulation order can never leak in).
    dim 64 · (3·10⁵)² per term keeps every sum far inside int64.
    """
    return ensure_compute_parallelism(embeddings).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * IVF_SCALE, 0).cast("long"),
        ).alias("qvec"),
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector (tiebreak: smaller cid). The centroid set
    is k rows → broadcast; assignment is an embarrassingly parallel scan."""
    d = _sqdist(F.col("qvec"), F.col("cvec"))
    return (
        vecs.crossJoin(F.broadcast(centroids))
        .select("vec_id", "qvec", F.struct(d.alias("dist"), F.col("cid")).alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").alias("dc"), F.first("qvec").alias("qvec"))
        .select("vec_id", "qvec", F.col("dc.cid").alias("cid"), F.col("dc.dist").alias("dist"))
    )


TRAIN_CAP = 100_000  # default k-means training-set bound (vectors)


def bounded_training(
    stream: DataFrame, count_src: DataFrame, train_cap: int
) -> DataFrame:
    """Bound a k-means training scan to ~``train_cap`` vectors: keep rows
    whose vec_id hashes into the first ceil(10000·cap/n) of the 10000
    sample buckets, where n is the IN-PLAN row count of ``count_src`` (a
    broadcast 1-row cross join — no driver action, no collect). Exact
    integer arithmetic (ceil-div), so the kept set is deterministic,
    retry-stable, and the DuckDB oracles mirror the predicate verbatim.
    While n ≤ cap the predicate is vacuously true (keep_bp = 10000) and
    training sees the whole input — which is why the small-sf oracle
    values are unchanged by the bounded default."""
    from solana_etl_spark.operators.sampling import sample_bucket

    n = count_src.agg(F.count(F.lit(1)).alias("_n"))
    keep_bp = F.expr(
        f"least(cast(10000 as bigint), "
        f"(cast({10000 * train_cap} as bigint) + _n - 1) div _n)"
    )
    return (
        stream.crossJoin(F.broadcast(n))
        .filter(sample_bucket(F.col("vec_id")) < keep_bp)
        .drop("_n")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    train_bp: int = 10000,
    train_cap: int | None = TRAIN_CAP,
) -> DataFrame:
    """(cid, cvec): centroids after ``iters`` exact-integer Lloyd rounds.

    Init = the k vectors with the smallest (hash64(vec_id), vec_id) — a
    deterministic pseudo-random draw, computed as orderBy+limit
    (TakeOrderedAndProject: per-partition top-k, no global sort) with the
    cid ranking as a row_number over just those k rows. Update =
    per-dimension truncating integer mean, computed as (s − s % n) / n so
    Spark's `div` and DuckDB agree on negative sums. Empty clusters keep
    their previous centroid (never arises with hash-drawn init on this
    data, but defined behavior).

    Training is BOUNDED BY DEFAULT: unless ``train_bp`` < 10000 requests
    an explicit hash-sample rate, ``train_cap`` (default 10⁵ vectors)
    bounds the Lloyd scan via :func:`bounded_training` — centroid quality
    needs ~10⁴–10⁶ vectors, not the corpus, so at 100 TB training is
    sample-scale by default and only ASSIGNMENT touches every row (one
    broadcast-join scan, handled by the callers). Each Lloyd round = one
    narrow shuffle keyed by (cid, dim) for the partial per-dimension sums
    — exchange count per round is unchanged by sampling; only the scan
    width shrinks. ``train_cap=None`` restores full-corpus training.
    """
    from solana_etl_spark.functions.hashing import hash64
    from solana_etl_spark.operators.sampling import sample_bucket

    vecs = quantized(embeddings)
    if train_bp < 10000:
        vecs = vecs.filter(sample_bucket(F.col("vec_id")) < train_bp)
    elif train_cap is not None:
        vecs = bounded_training(vecs, vecs, train_cap)
    sel = (
        vecs.select(
            hash64(F.col("vec_id").cast("string")).alias("_h"),
            "vec_id",
            "qvec",
        )
        .orderBy("_h", "vec_id")
        .limit(k)
    )
    centroids = (
        sel.withColumn(
            "_rn", F.row_number().over(Window.orderBy("_h", "vec_id"))
        )
        .select((F.col("_rn") - 1).alias("cid"), F.col("qvec").alias("cvec"))
    )
    for _ in range(iters):
        assigned = _assign(vecs, centroids)
        dims = assigned.select(
            "cid", F.posexplode("qvec").alias("dim", "v")
        )
        per_dim = dims.groupBy("cid", "dim").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )
        new_centroids = (
            per_dim.select(
                "cid",
                "dim",
                F.expr("(s - (s % n)) div n").alias("m"),
            )
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("_dm")
            )
            .select("cid", F.expr("transform(_dm, x -> x.m)").alias("cvec"))
        )
        # empty clusters (no assigned rows) fall back to the previous centroid
        centroids = (
            centroids.alias("old")
            .join(new_centroids.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"),
            )
        )
    return centroids


def ivf_assignments(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    train_bp: int = 10000,
    train_cap: int | None = TRAIN_CAP,
) -> DataFrame:
    """The IVF index: (vec_id, cid, dist) — every vector's inverted-list
    assignment under the learned centroids. All-integer output → value-exact
    oracle for the entire k-means. Training is capped at ``train_cap``
    vectors by default (``train_bp`` < 10000 requests an explicit sample
    rate instead) while still assigning EVERY vector — the 100 TB shape:
    bounded training scan, full assignment."""
    centroids = kmeans_centroids(embeddings, k, iters, train_bp, train_cap)
    return ivf_assign_with(quantized(embeddings), centroids)


def ivf_assign_with(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    return _assign(vecs, centroids).select("vec_id", "cid", "dist")


def ivf_topk(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    topk: int = TOPK,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` centroids nearest the query (the
    min-vec_id vector, deterministic), then exact top-k within those
    inverted lists only — the scan touches nprobe/k of the corpus instead
    of all of it. Output (vec_id, dist) is exact integer math."""
    vecs = quantized(embeddings)
    centroids = kmeans_centroids(embeddings, k, iters)
    query = vecs.orderBy("vec_id").limit(1).select(F.col("qvec").alias("q"))
    probe_cids = (
        centroids.crossJoin(F.broadcast(query))
        .select("cid", _sqdist(F.col("cvec"), F.col("q")).alias("qd"))
        .orderBy("qd", "cid")
        .limit(nprobe)
        .select("cid")
    )
    assigned = _assign(vecs, centroids)
    candidates = assigned.join(F.broadcast(probe_cids), "cid")
    return (
        candidates.crossJoin(F.broadcast(query))
        .select("vec_id", _sqdist(F.col("qvec"), F.col("q")).alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(topk)
    )


def ivf_batch_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    topk: int = TOPK,
) -> DataFrame:
    """Batch ANN: every vector matching ``query_pred`` is a query, answered
    in ONE pass over the index — the shape of eval-set retrieval and
    semantic-dedup probes at scale.

    Plan: the query batch (broadcast-sized) picks its ``nprobe`` probe
    lists against the k-row centroid table; the corpus joins its inverted-
    list assignment to the broadcast probe set (no corpus shuffle), scores
    |Q| x nprobe/k of the corpus, and a per-query window takes top-k over
    that candidate stream only. Exact integer math end-to-end, same
    determinism contract as :func:`ivf_topk`.
    """
    from pyspark.sql.window import Window

    vecs = quantized(embeddings)
    centroids = kmeans_centroids(embeddings, k, iters)
    queries = vecs.filter(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("qvec").alias("q")
    )
    probe_rank = F.row_number().over(
        Window.partitionBy("q_id").orderBy("qd", "cid")
    )
    probes = (
        centroids.crossJoin(F.broadcast(queries))
        .select("q_id", "cid", _sqdist(F.col("cvec"), F.col("q")).alias("qd"))
        .withColumn("_rn", probe_rank)
        .filter(F.col("_rn") <= nprobe)
        .select("q_id", "cid")
    )
    assigned = _assign(vecs, centroids)
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id", "vec_id", _sqdist(F.col("qvec"), F.col("q")).alias("dist")
        )
    )
    top_rank = F.row_number().over(
        Window.partitionBy("q_id").orderBy("dist", "vec_id")
    )
    return (
        scored.withColumn("_rn", top_rank)
        .filter(F.col("_rn") <= topk)
        .select("q_id", "vec_id", "dist")
    )


def ivf_batch_recall(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    topk: int = TOPK,
) -> DataFrame:
    """PER-QUERY recall@k of the IVF probe over a whole query batch —
    (q_id, n_hit, k, recall_at_k), one row per query. The single-query
    :func:`ivf_recall` measures one operating point; this is the eval-set
    version a deployment actually reads (mean/min recall over Q queries).

    Plan: centroids are collected to a literal (k rows — the only driver
    state) so the exact and approx branches share them without re-running
    Lloyd; the approx branch is the :func:`ivf_batch_topk` shape
    (broadcast probe join, no corpus shuffle), the exact branch scores
    |corpus|×Q via a broadcast query cross join and per-query windows.
    Queries with zero probe hits still report (left join, n_hit 0)."""
    from pyspark.sql.window import Window

    spark = embeddings.sparkSession
    vecs = quantized(embeddings)
    trained = kmeans_centroids(embeddings, k, iters)
    centroids = spark.createDataFrame(trained.collect(), trained.schema)
    queries = vecs.filter(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("qvec").alias("q")
    )
    rank = lambda: F.row_number().over(  # noqa: E731
        Window.partitionBy("q_id").orderBy("dist", "vec_id")
    )

    exact = (
        vecs.crossJoin(F.broadcast(queries))
        .select("q_id", "vec_id", _sqdist(F.col("qvec"), F.col("q")).alias("dist"))
        .withColumn("_rn", rank())
        .filter(F.col("_rn") <= topk)
        .select("q_id", "vec_id", F.lit(1).alias("is_rel"))
    )
    probe_rank = F.row_number().over(
        Window.partitionBy("q_id").orderBy("qd", "cid")
    )
    probes = (
        centroids.crossJoin(F.broadcast(queries))
        .select("q_id", "cid", _sqdist(F.col("cvec"), F.col("q")).alias("qd"))
        .withColumn("_rn", probe_rank)
        .filter(F.col("_rn") <= nprobe)
        .select("q_id", "cid")
    )
    approx = (
        _assign(vecs, centroids)
        .join(F.broadcast(probes), "cid")
        .join(F.broadcast(queries), "q_id")
        .select("q_id", "vec_id", _sqdist(F.col("qvec"), F.col("q")).alias("dist"))
        .withColumn("_rn", rank())
        .filter(F.col("_rn") <= topk)
        .select("q_id", "vec_id")
    )
    return (
        approx.join(exact, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(F.sum(F.coalesce("is_rel", F.lit(0))).alias("n_hit"))
        .select(
            "q_id",
            "n_hit",
            F.lit(topk).alias("k"),
            F.round(F.col("n_hit") / F.lit(float(topk)), 6).alias("recall_at_k"),
        )
    )


def _probe_scored(
    embeddings: DataFrame, k: int, iters: int, nprobe: int
) -> tuple[DataFrame, DataFrame]:
    """Shared eval scaffolding: the corpus assigned and scored against the
    min-vec_id query ONCE (persisted — both the exact and the approx
    branch read it), plus the nprobe probe-list cids. Single source of
    truth for the probe/assignment logic the recall and NDCG evals (and
    their oracles) must agree on.

    Lifetime contract: the caller must materialize its final (tiny)
    result and then ``scored.unpersist()`` — see :func:`_finalize_eval` —
    otherwise each eval leaks a cached corpus-sized block in a long-lived
    session."""
    vecs = quantized(embeddings)
    centroids = kmeans_centroids(embeddings, k, iters)
    query = vecs.orderBy("vec_id").limit(1).select(F.col("qvec").alias("q"))
    probe_cids = (
        centroids.crossJoin(F.broadcast(query))
        .select("cid", _sqdist(F.col("cvec"), F.col("q")).alias("qd"))
        .orderBy("qd", "cid")
        .limit(nprobe)
        .select("cid")
    )
    scored = (
        _assign(vecs, centroids)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id", "cid", _sqdist(F.col("qvec"), F.col("q")).alias("qd")
        )
        .persist()
    )
    return scored, probe_cids


def _finalize_eval(result: DataFrame, scored: DataFrame) -> DataFrame:
    """Materialize a (single-row) eval result while ``scored`` is still
    cached, then release the corpus-sized cache. The 1-row result block
    stays persisted (negligible); if it is ever evicted the lineage simply
    recomputes without the cache."""
    out = result.persist()
    out.count()
    scored.unpersist()
    return out


def ivf_recall(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    topk: int = TOPK,
) -> DataFrame:
    """Recall@k of the IVF probe against exact search under the SAME
    quantized metric — the measurement every ANN deployment needs before
    trusting nprobe ("measure, don't guess" applied to the index itself).

    One index pass: the corpus is assigned and scored ONCE; the exact
    top-k (all inverted lists) and the approximate top-k (nprobe lists)
    are two TakeOrdered reductions over that shared scored stream.
    Output is a single row (n_hit, k, recall_at_k) — all-integer until
    the final rounded division, so the oracle is value-exact."""
    scored, probe_cids = _probe_scored(embeddings, k, iters, nprobe)
    exact = scored.orderBy("qd", "vec_id").limit(topk).select("vec_id")
    approx = (
        scored.join(F.broadcast(probe_cids), "cid")
        .orderBy("qd", "vec_id")
        .limit(topk)
        .select("vec_id")
    )
    result = approx.join(exact, "vec_id").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.lit(topk).alias("k"),
        F.round(F.count(F.lit(1)) / F.lit(float(topk)), 6).alias(
            "recall_at_k"
        ),
    )
    return _finalize_eval(result, scored)


def ivf_ndcg(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    topk: int = TOPK,
) -> DataFrame:
    """NDCG@k of the IVF probe against exact search (binary relevance:
    membership in the exact top-k). Where recall@k ignores ORDER, NDCG
    weights each hit by 1/log2(position+1) — a probe that finds the right
    vectors in the wrong order scores below one that ranks them correctly.

    Same one-pass shape as :func:`ivf_recall`; the per-position discount
    terms are rounded to 9 decimals and summed as exact DECIMAL so the
    k-term float sum is addition-order-independent (cross-engine + any
    partitioning)."""
    import math

    from pyspark.sql.window import Window

    scored, probe_cids = _probe_scored(embeddings, k, iters, nprobe)
    exact = scored.orderBy("qd", "vec_id").limit(topk).select("vec_id")
    approx = scored.join(F.broadcast(probe_cids), "cid").orderBy(
        "qd", "vec_id"
    ).limit(topk)
    pos = F.row_number().over(Window.orderBy("qd", "vec_id"))
    ranked = approx.select("vec_id", pos.alias("pos"))
    # discount of a hit at position i: round(1/log2(i+1), 9), summed exact
    term = F.round(
        F.lit(1.0) / F.log(2.0, F.col("pos") + F.lit(1.0)), 9
    ).cast("decimal(28,9)")
    dcg = (
        ranked.join(exact, "vec_id")
        .agg(F.coalesce(F.sum(term), F.lit(0).cast("decimal(28,9)")).alias("_dcg"))
    )
    idcg = sum(round(1.0 / math.log2(i + 1), 9) for i in range(1, topk + 1))
    result = dcg.select(
        F.col("_dcg").cast("double").alias("dcg"),
        F.lit(topk).alias("k"),
        F.round(F.col("_dcg").cast("double") / F.lit(idcg), 6).alias(
            "ndcg_at_k"
        ),
    )
    return _finalize_eval(result, scored)


# --- late-interaction (MaxSim) retrieval -----------------------------------

MAXSIM_M = 8  # subvectors per vector (matches pq.PQ_M)
MAXSIM_SUBDIM = 8
MAXSIM_QUERIES = 4
MAXSIM_K = 5


def _subvecs(col: Column, m: int, subdim: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(col, s * subdim + 1, subdim).alias("sv"),
            )
            for s in range(m)
        ]
    )


def maxsim_topk(
    embeddings: DataFrame,
    n_queries: int = MAXSIM_QUERIES,
    k: int = MAXSIM_K,
    m: int = MAXSIM_M,
    subdim: int = MAXSIM_SUBDIM,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval [Khattab & Zaharia 2020]:
    each vector decomposes into ``m`` contiguous subvectors (its
    "token embeddings"); a candidate's score for a query is
    MaxSim — Σ over query subvectors of the MAX dot product against any
    candidate subvector. Late interaction ranks by fine-grained partial
    matches a single pooled dot product averages away.

    (q_id, rank, vec_id, maxsim_score): top-``k`` per query, deterministic
    ties by vec_id. Float discipline: per-(query-subvector) maxima round
    at 9 and sum as exact DECIMAL (an 8-term double sum would be
    addition-order-dependent), score emitted at 6.

    Plan: per-row subvector explode on both sides, bounded query batch
    broadcast against one corpus-subvector scan, then two aggregates
    keyed by (query, candidate[, subvector]) and one per-query window —
    volume is queries × corpus × m², bounded by the query batch."""
    subs = _subvecs(F.col("embedding"), m, subdim)
    docs = embeddings.select(
        "vec_id", F.explode(subs).alias("d")
    ).select("vec_id", F.col("d.sv").alias("dv"))
    queries = (
        embeddings.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("q_id"), F.explode(subs).alias("q"))
        .select("q_id", F.col("q.sub").alias("qsub"), F.col("q.sv").alias("qv"))
    )
    scored = (
        docs.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "qsub",
            _dot(F.col("qv"), F.col("dv")).alias("dot"),
        )
    )
    per_qsub = scored.groupBy("q_id", "vec_id", "qsub").agg(
        F.max("dot").alias("mx")
    )
    per_pair = (
        per_qsub.select(
            "q_id",
            "vec_id",
            F.round("mx", 9).cast("decimal(28,9)").alias("mx"),
        )
        .groupBy("q_id", "vec_id")
        .agg(F.sum("mx").cast("double").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        per_pair.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            F.col("rnk").alias("rank"),
            "vec_id",
            F.round("score", 6).alias("maxsim_score"),
        )
    )


SQ8_LEVELS = 255  # 8-bit code range [0, 255]
SQ8_REFINE_FACTOR = 4  # candidates kept per final result before exact rerank


def sq8_dim_stats(embeddings: DataFrame) -> list[tuple[float, float]]:
    """Per-dimension (min, range) over the corpus — the SQ8 codebook.

    posexplode → groupBy(dim) is one map-side-combined aggregate whose
    shuffle is |dims| rows per map task; the collect is bounded driver
    state (|dims| pairs — same posture as the IVF/PQ centroid collects).
    Constant dimensions get range 1.0 so every vector quantizes to code 0
    there (contributing nothing to any score) instead of dividing by zero.
    """
    rows = (
        embeddings.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    stats = sorted((r["dim"], r["mn"], r["mx"]) for r in rows)
    return [(mn, (mx - mn) if mx > mn else 1.0) for _, mn, mx in stats]


def _sq8_codes(emb: Column, stats: list[tuple[float, float]]) -> Column:
    """Quantize a float vector to int codes: round((x − min)·255 / range).
    Written as ((x − mn) * 255.0) / rng — the exact association the DuckDB
    oracle uses, so the doubles (hence the rounded codes) are bit-identical.
    """
    mins = F.array(*[F.lit(float(mn)) for mn, _ in stats])
    rngs = F.array(*[F.lit(float(rng)) for _, rng in stats])
    diffs = F.zip_with(emb, mins, lambda x, m: x.cast("double") - m)
    return F.zip_with(
        diffs, rngs, lambda d, r: F.round(d * F.lit(255.0) / r, 0).cast("long")
    )


def sq8_topk(
    embeddings: DataFrame, k: int = TOPK, refine_factor: int = SQ8_REFINE_FACTOR
) -> DataFrame:
    """Scalar-quantized (SQ8) top-k with exact rerank — the third rung of
    the quantization ladder (sign-LSH 1 bit/dim → SQ8 8 bits/dim → PQ
    sub-byte/dim): per-dimension min/max affine quantization to 8-bit
    codes, integer-dot-product candidate scoring at 4× less memory
    traffic than float32, then exact cosine on the top
    ``k·refine_factor`` candidates only.

    Scale shape: the codebook is 2·|dims| doubles (broadcast literal);
    scoring is a single scan with an integer fold (JVM codegen, no UDF);
    both top-k cuts are sort+limit (TakeOrderedAndProject — no global
    sort materialization). Integer scores make the candidate cut
    engine-exact, so unlike float-scored ANN the operator is fully
    value-hash oracle-checkable end to end.
    """
    stats = sq8_dim_stats(embeddings)
    space = normalized(embeddings).withColumn(
        "_codes", _sq8_codes(F.col("embedding"), stats)
    )
    q = space.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("q_id"),
        F.col("_codes").alias("q_codes"),
        F.col("_nemb").alias("q_vec"),
    )
    score = F.aggregate(
        F.zip_with(F.col("_codes"), F.col("q_codes"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        space.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("vec_id", "_nemb", "q_vec", score.alias("score_sq8"))
        .orderBy(F.desc("score_sq8"), F.asc("vec_id"))
        .limit(k * refine_factor)
    )
    return (
        cand.select(
            "vec_id",
            "score_sq8",
            F.round(_dot(F.col("_nemb"), F.col("q_vec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


RP_OUT_DIM = 8  # Johnson-Lindenstrauss target dimensionality
RP_REFINE_FACTOR = 4


def rp_signs(in_dim: int, out_dim: int = RP_OUT_DIM) -> list[list[float]]:
    """Deterministic ±1 random-projection matrix (out_dim × in_dim):
    sign(i, j) = parity of the cross-engine md5 hash32 of "i|j" (1-based
    dims) — the same bits the oracle derives in SQL, so the matrix is a
    pure function of dimensions, identical everywhere, and never needs to
    be stored or shipped."""
    import hashlib

    def sign(i: int, j: int) -> float:
        h = int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [
        [sign(i, j) for i in range(1, in_dim + 1)]
        for j in range(1, out_dim + 1)
    ]


def rp_project(embeddings: DataFrame, out_dim: int = RP_OUT_DIM) -> DataFrame:
    """Append ``_rp``: the embedding projected to ``out_dim`` dims by the
    deterministic ±1 matrix (Johnson-Lindenstrauss: sign projections
    preserve dot products in expectation with variance 1/out_dim).

    Scale shape: the matrix is an (out_dim × in_dim) literal — broadcast
    with the plan, no join, no state table; each projection component is
    a sequential JVM fold over the input array (bit-reproducible, mirrors
    the oracle's list_reduce), so the whole step fuses into the scan.

    Note: the input dimensionality is probed from one row at plan-build
    time (an eager 1-row job, like the n-gram guard's estimate) — the
    embeddings contract is fixed-width vectors, the same assumption the
    IVF/PQ/SQ8 codebooks make. An empty corpus projects to empty sketches
    (no crash, no job output)."""
    first = embeddings.select("embedding").first()
    if first is None:
        return ensure_compute_parallelism(embeddings).withColumn(
            "_rp", F.array().cast("array<double>")
        )
    in_dim = len(first["embedding"])
    sign_rows = [
        F.array(*[F.lit(s) for s in row]) for row in rp_signs(in_dim, out_dim)
    ]
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), row, lambda x, r: x.cast("double") * r
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for row in sign_rows
        ]
    )
    return ensure_compute_parallelism(embeddings).withColumn("_rp", proj)


def rp_topk(
    embeddings: DataFrame,
    k: int = TOPK,
    out_dim: int = RP_OUT_DIM,
    refine_factor: int = RP_REFINE_FACTOR,
) -> DataFrame:
    """Random-projection ANN: candidate scoring in the out_dim-dimensional
    sketch (a 4-8× cheaper dot product than full precision; the JL bound
    makes high-cosine neighbors keep high sketch scores), exact cosine
    rerank on the top k·refine_factor only — the dimensionality-REDUCTION
    rung of the compression ladder, complementing the quantization rungs
    (sign-LSH / SQ8 / PQ) which shrink precision, not dimensionality.

    Candidate scores round at 6 decimals with vec_id tie-breaks, so the
    cut is deterministic and the operator value-hash oracle-checkable."""
    space = normalized(rp_project(embeddings, out_dim))
    q = space.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("q_id"),
        F.col("_rp").alias("q_rp"),
        F.col("_nemb").alias("q_vec"),
    )
    cand = (
        space.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            "_nemb",
            "q_vec",
            F.round(_dot(F.col("_rp"), F.col("q_rp")), 6).alias("rp_score"),
        )
        .orderBy(F.desc("rp_score"), F.asc("vec_id"))
        .limit(k * refine_factor)
    )
    return (
        cand.select(
            "vec_id",
            "rp_score",
            F.round(_dot(F.col("_nemb"), F.col("q_vec")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )
