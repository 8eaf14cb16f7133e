"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the engine's operator inventory
(SURVEY.md §2 families + charter LLM-data-pipeline extensions) as
(Spark builder, DuckDB oracle) pairs — see solana_etl_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solana_etl_spark.session import apply_semantic_confs  # noqa: E402
from solana_etl_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 5-way broadcast join + rollup at sf0.001."""
    apply_semantic_confs(spark)
    return _q.queries()["q5_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def _wrap(fn: _q.QueryFn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_semantic_confs(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
