"""Headline-only mini-bench for optimization iteration (guide §1): the
same 26 registry queries + 2 e2e workloads, same warm-up and best-of-2
`.count()` statistic as bench.py, WITHOUT the scaling decades — so a
32-vs-8-core or before/after comparison of the judged comparable total
takes ~3 minutes instead of ~35. Never used by the driver; bench.py
stays the contract.

  SPARK_GRAFT_CPUS=8 python scripts/bench_headline.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solana_etl_spark.session import get_spark  # noqa: E402
from solana_etl_spark import queries as _q  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "headline"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"bench-headline-{label}")
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    qs = _q.all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"{label}:{name}")
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                best = dt if best < 0 else min(best, dt)
        except Exception:
            best = -1.0
        timings[name] = best

    try:
        from solana_etl_spark.sources import read_blocks
        from solana_etl_spark.plans.tasks import (
            run_all_tasks,
            run_all_tasks_with_handle,
        )
        from solana_etl_spark.sources.synth import ensure_e2e_corpus

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
        pass

    r2_added = {"solana_e2e", "solana_e2e_corpus_all_tasks"}
    comparable = round(
        sum(v for k, v in timings.items() if v > 0 and k not in r2_added), 3
    )
    print(json.dumps({"label": label, "comparable": comparable,
                      "queries": timings}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
