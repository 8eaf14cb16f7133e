"""solana_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of zuyezheng/solana-etl, re-expressed Spark-first.

The reference is a single-process Python/dask object pipeline; this engine is
a columnar DataFrame engine: declarative plans, Catalyst optimization,
zero-shuffle intra-transaction transforms, and LLM-data-pipeline extension
operators (dedup / similarity / text analysis / multimodal) designed for
100 TB scale.

Layout:
    schemas    — explicit StructTypes for raw block JSON and output tables
    sources    — readers (gzip JSON blocks, parquet star schema)
    plans      — normalized views + the three reference task pipelines
    operators  — extension operators (dedup, similarity, text, multimodal)
    functions  — shared column expressions (hashing, fixed-point, balance aggs)
    streaming  — structured-streaming wrappers reusing the batch plans
"""

__version__ = "0.1.0"
