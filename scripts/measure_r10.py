"""Round-9 optimization measurement harness (guide §1).

Two modes:
  python scripts/measure_r10.py plans [suffix] [name ...]
      Capture .explain("formatted") for the headline queries into
      plans/r10/<name>_<suffix>.txt  (suffix default: before).
  python scripts/measure_r10.py time [n_reps] [name ...]
      Time each query in isolation with the noop sink (computes every
      column, discards output — guide §1.4) and with .count() (the bench
      statistic), printing one JSON line per query.

Never used by the bench itself; bench.py stays the driver contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solana_etl_spark.session import get_spark  # noqa: E402
from solana_etl_spark import queries as _q  # noqa: E402

HEADLINE = [
    "q1_pricing_summary", "q3_topk_revenue", "q5_revenue_by_nation",
    "q6_forecast_revenue", "a9_conditional_rollup", "m1_balance_modes",
    "j2_full_outer_coalesce", "w1_topk_per_group", "set_ops",
    "x1_semantic_extract", "dedup_exact", "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs", "dedup_ngram_jaccard", "sim_cosine_topk",
    "sim_neardup_pairs", "text_quality", "text_fingerprint",
    "st_sessionize", "pipeline_clean_corpus", "j6_asof_join",
    "j7_range_join", "s2_stratified_sample", "a14_kmv_distinct",
    "mm_frame_sample", "solana_e2e",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"measure-r10-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _q.all_queries()

    if mode == "plans":
        suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
        names = sys.argv[3:] or HEADLINE
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r10",
        )
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            try:
                df = qs[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as e:  # noqa: BLE001
                plan = f"ERROR building {name}: {e}"
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    elif mode == "time":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        names = sys.argv[3:] or HEADLINE
        # same warm-up as bench.py
        for t in ("lineitem", "orders", "events", "documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        spark.range(0, 64, 1, 32).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).count()
        results = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"r10-measure:{name}")
            reps_noop, reps_count = [], []
            try:
                for _ in range(n):
                    t0 = time.time()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    reps_noop.append(round(time.time() - t0, 3))
                for _ in range(n):
                    t0 = time.time()
                    qs[name](spark, sf_dir).count()
                    reps_count.append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                results[name] = {"error": str(e)[:200]}
                print(json.dumps({name: results[name]}))
                continue
            results[name] = {"noop": reps_noop, "count": reps_count}
            print(json.dumps({name: results[name]}))
        print(json.dumps({"ALL": results}))
    spark.stop()


if __name__ == "__main__":
    main()
