"""Parquet table catalog over the driver fixtures.

The reference discovers databases/tables with ``SHOW DATABASES`` /
``SHOW TABLES`` (osarchiver/common/db.py:393-414, S1/S2 in SURVEY §2);
here the "catalog" is a directory of parquet tables. Reads stay lazy
and schema'd so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns that have shipped as TIMESTAMP(NANOS) in older fixture
# builds. Spark reads those as long (spark.sql.legacy.parquet.
# nanosAsLong); we floor-divide to microseconds — the same truncation
# DuckDB applies — so oracle comparisons see identical values.
# Current fixture builds store timestamp[us] (isAdjustedToUTC=false);
# both layouts normalize to TIMESTAMP (LTZ) under a UTC session.
_NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def ensure_session_defaults(spark: SparkSession) -> None:
    """Runtime-settable confs the engine's correctness contract
    assumes, applied defensively for externally-built sessions (the
    driver passes its own SparkSession): nanos timestamps readable,
    naive parquet timestamps read as TIMESTAMP (not NTZ, whose type
    rules reject unix_micros & friends), UTC semantics for
    timestamp<->naive comparisons so epoch arithmetic matches DuckDB."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan; filters/projections push down via Catalyst."""
    ensure_session_defaults(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in _NANOS_TS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Defensive: if a scan was resolved before the NTZ conf landed (or a
    # caller built the frame itself), pull any NTZ column back to LTZ —
    # under a UTC session the wall-clock values are identical.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def discover_tables(sf_dir: str) -> list[str]:
    """Table discovery à la SHOW TABLES (reference common/db.py:402-414):
    enumerate ``*.parquet`` entries in the scale-factor directory."""
    out = []
    for entry in sorted(os.listdir(sf_dir)):
        if entry.endswith(".parquet"):
            out.append(entry[: -len(".parquet")])
    return out
