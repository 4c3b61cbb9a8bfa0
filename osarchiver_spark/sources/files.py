"""File-drop sources: JSONL and CSV ingestion.

The parquet catalog (sources/parquet.py) covers the benchmark tables
and JDBC (sources/jdbc.py) covers the reference's database source;
this module covers the third way data actually arrives in a
training-data pipeline — a drop directory of compressed JSON-Lines or
CSV shards from a crawler or an upstream export (the same formats the
sink side already writes: JsonlSink / CsvSink in sinks/base.py).

Design rules for the 100 TB read path:

- **Explicit schema, never inference.** Schema inference is a full
  extra pass over the input; at scale it is also WRONG for JSONL
  (a sampled shard can miss rare keys and silently drop them). Both
  readers take a required ``schema``.
- **Malformed rows are a policy, not a crash.** ``bad_records``
  selects Spark's reader mode: ``"fail"`` (FAILFAST — default, a
  corrupt shard should stop an archival job), ``"drop"``
  (DROPMALFORMED — crawl ingest where junk lines are expected), or
  ``"keep"`` (PERMISSIVE + a ``_corrupt_record`` column so the bad
  lines can be quarantined with a filter instead of lost). NOTE:
  Spark refuses plans that prune a raw file scan down to only the
  corrupt-record column — cache/persist the parsed DataFrame before
  splitting it into clean/quarantine halves.
- Compression is transparent (.gz/.zst per shard via Hadoop codecs);
  shard count drives scan parallelism exactly like any file source,
  and column pruning/filter pushdown work as usual on the projected
  DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MODES = {"fail": "FAILFAST", "drop": "DROPMALFORMED", "keep": "PERMISSIVE"}

CORRUPT_COL = "_corrupt_record"


def _mode(bad_records: str) -> str:
    try:
        return _MODES[bad_records]
    except KeyError:
        raise ValueError(
            f"bad_records must be one of {sorted(_MODES)}, got {bad_records!r}"
        ) from None


def _with_corrupt_col(schema: T.StructType, bad_records: str) -> T.StructType:
    if bad_records != "keep" or CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    bad_records: str = "fail",
    multiline: bool = False,
) -> DataFrame:
    """Read a JSON-Lines drop (one document per line; .gz/.zst shards
    transparent). ``schema`` is required — see module docstring."""
    reader = (
        spark.read.schema(_with_corrupt_col(schema, bad_records))
        .option("mode", _mode(bad_records))
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
    )
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    bad_records: str = "fail",
    multiline: bool = False,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read a CSV drop with an explicit schema. ``multiline=True``
    enables quoted embedded newlines (free-text columns) at the cost
    of per-file instead of per-split parallelism — prefer JSONL for
    document payloads."""
    reader = (
        spark.read.schema(_with_corrupt_col(schema, bad_records))
        .option("mode", _mode(bad_records))
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .option("sep", delimiter)
        .option("multiLine", multiline)
        .option("escape", '"')
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)
