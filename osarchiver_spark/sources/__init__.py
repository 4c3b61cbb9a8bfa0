from osarchiver_spark.sources.files import read_csv, read_jsonl
from osarchiver_spark.sources.parquet import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables", "read_csv", "read_jsonl"]
