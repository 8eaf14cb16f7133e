from solana_etl_spark.sources.blocks import read_blocks
from solana_etl_spark.sources.tables import TESTDATA_TABLES, load_tables

__all__ = ["read_blocks", "load_tables", "TESTDATA_TABLES"]
