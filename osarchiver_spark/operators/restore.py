"""Restore (un-archive): the reverse of the archival pipeline.

The reference has no restore path — once rows leave the source they
live only in the archive db / dump files. Any operator of a 100 TB
archive eventually needs the reverse: an application bug soft-deleted
live rows, the nightly run archived-and-deleted them, and they must
go back. This is the same two-step discipline as archival, mirrored:

1. ``restore_candidates`` — archived rows within the requested window
   that are NOT in the current source (pk anti-join, the exact inverse
   of the sink's insert-if-absent guard). Idempotent by construction:
   re-running a restore selects nothing the first pass already put
   back.
2. append the candidates to the source (caller-owned write, mirroring
   the Archiver's caller-owned source_rewriter) and only then, if
   desired, drop them from the archive.

The window predicate pushes into the archive scan; with the archive
date-partitioned (`ParquetArchiveSink(partition_column=...)`) restore
of one day touches one partition.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def restore_candidates(
    archive: DataFrame,
    source: DataFrame,
    primary_key: str | list[str],
    deleted_column: str | None = None,
    window: tuple[datetime, datetime] | None = None,
) -> DataFrame:
    """Archived rows to put back: optionally bounded to a
    (lo, hi] window of ``deleted_column``, minus everything already
    present in the source (pk anti-join)."""
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    cand = archive
    if "_archive_dt" in cand.columns:
        cand = cand.drop("_archive_dt")
    if window is not None:
        if deleted_column is None:
            raise ValueError("window restore needs deleted_column")
        lo, hi = window
        cand = cand.filter(
            (F.col(deleted_column) > F.lit(lo)) & (F.col(deleted_column) <= F.lit(hi))
        )
    return cand.join(source.select(*pk), on=pk, how="left_anti")


def restore_report(
    archive: DataFrame,
    source: DataFrame,
    primary_key: str | list[str],
) -> DataFrame:
    """Dry-run accounting: how many archived rows are restorable vs
    already present — the restore twin of the Archiver's dry-run."""
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    arch = archive.drop("_archive_dt") if "_archive_dt" in archive.columns else archive
    total = arch.count()
    present = arch.join(source.select(*pk), on=pk, how="left_semi").count()
    spark = archive.sparkSession
    return spark.createDataFrame(
        [(total, present, total - present)],
        "archived_rows long, already_in_source long, restorable long",
    )
