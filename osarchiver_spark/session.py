"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same config block is what we'd
ship to a 1000-executor cluster (AQE on, adaptive coalesce, skew-join
handling, Arrow for the few Pandas-UDF paths). Shuffle partitions are
sized from the env so the driver's bench (local[$SPARK_GRAFT_CPUS])
doesn't over-parallelize tiny SFs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "osarchiver_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    AQE is enabled so runtime statistics re-plan joins (broadcast
    promotion, skew splitting, partition coalescing) — on a real
    cluster this is what keeps a 100 TB shuffle from being dominated
    by a skewed key or thousands of tiny reducers.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Older fixture builds store TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long, converted to micros in the catalog
        # (sources/parquet.py) to match DuckDB's truncation.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Current fixture builds store naive timestamp[us]; read as
        # TIMESTAMP (LTZ, UTC session) rather than TIMESTAMP_NTZ so
        # epoch functions (unix_micros etc.) type-check and semantics
        # match DuckDB's naive-as-UTC interpretation.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
