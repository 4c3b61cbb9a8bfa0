"""SCD Type-2 (slowly changing dimension) apply — the CDC upsert
pattern for archival dimensions without Delta: anti-join + union +
window, emulating ``MERGE ... WHEN MATCHED THEN UPDATE SET
valid_to = <ts> ... WHEN NOT MATCHED THEN INSERT``.

History layout: one row per (key, version) with
``valid_from/valid_to`` timestamps; the current version has
``valid_to IS NULL``. Applying a batch of updates:

1. current rows whose key appears in the batch get closed
   (valid_to = batch ts);
2. unchanged rows pass through;
3. batch rows insert as new open versions.

One shuffle on the key; no driver involvement; idempotent when the
same batch is re-applied (closing an already-closed version is a
no-op because only OPEN versions join)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(dim: DataFrame, valid_from: datetime) -> DataFrame:
    """Bootstrap the history table from a plain dimension snapshot."""
    return dim.withColumn("valid_from", F.lit(valid_from)).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )


def scd2_apply(history: DataFrame, updates: DataFrame, key: str, ts: datetime) -> DataFrame:
    """Apply an update batch at time ``ts``; returns the new history.

    ``updates`` has the dimension's business columns (no
    valid_from/valid_to)."""
    batch_keys = updates.select(key).distinct()
    open_rows = history.filter(F.col("valid_to").isNull())
    closed_rows = history.filter(F.col("valid_to").isNotNull())

    closing = open_rows.join(batch_keys, key, "left_semi").withColumn(
        "valid_to", F.lit(ts)
    )
    untouched_open = open_rows.join(batch_keys, key, "left_anti")
    new_versions = updates.withColumn("valid_from", F.lit(ts)).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )
    return (
        closed_rows.unionByName(closing)
        .unionByName(untouched_open)
        .unionByName(new_versions.select(*closed_rows.columns))
    )


def scd2_current(history: DataFrame) -> DataFrame:
    return history.filter(F.col("valid_to").isNull())


def scd2_as_of(history: DataFrame, ts: datetime) -> DataFrame:
    """Dimension snapshot as of ``ts`` (time travel)."""
    return history.filter(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    )
