"""Retention-predicate scan + anti-join "delete" materialization.

The reference's flagship semantics (SURVEY P2/P3/S19):

- rows qualify for archival when ``deleted_at <= SUBDATE('{now}',
  INTERVAL retention)`` with ``{now}`` frozen once per run
  (osarchiver/source/db.py:59-65, archiver_sample.ini:35);
- NULL ``deleted_at`` is never archived (row not soft-deleted,
  reference README.md:10-11) — ``<=`` on NULL is already
  three-valued-false, matching MySQL;
- the "delete" step is re-expressed as a source rewrite: keep
  ``src LEFT ANTI JOIN archived ON pk`` (source/db.py:300-374).

Keyset pagination (source/db.py:216-277) disappears: partition
parallelism replaces page loops, and Catalyst pushes the retention
predicate into the parquet scan (row-group pruning), which is what
makes this viable at 100 TB — the scan skips row groups whose
``deleted_at`` max is newer than the cutoff.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TIMEDELTA_UNITS = {
    "WEEK": timedelta(weeks=1),
    "DAY": timedelta(days=1),
    "HOUR": timedelta(hours=1),
    "MINUTE": timedelta(minutes=1),
    "SECOND": timedelta(seconds=1),
}


@dataclass(frozen=True)
class Retention:
    """A MySQL-style retention interval (``INTERVAL n unit``). The
    reference substitutes the raw string into SQL, so ANY interval
    unit works there (source/db.py:64-65, archiver_sample.ini:40);
    this is the engine-side equivalent."""

    n: int
    unit: str = "MONTH"  # MONTH | YEAR | WEEK | DAY | HOUR | MINUTE | SECOND

    def normalized_unit(self) -> str:
        u = self.unit.upper().rstrip("S")
        if u not in {"MONTH", "YEAR", *_TIMEDELTA_UNITS}:
            raise ValueError(f"unsupported retention unit {self.unit!r}")
        return u


def frozen_now() -> datetime:
    """One frozen UTC timestamp per run (reference source/db.py:59-65).

    Substituted as a *literal* into every table's predicate so parent
    and child tables see the same cutoff — the snapshot-consistency
    invariant that prevents FK races.
    """
    return datetime.now(tz=timezone.utc).replace(tzinfo=None)


def retention_cutoff(now: datetime, retention: int | Retention) -> datetime:
    """``SUBDATE(now, INTERVAL n unit)`` with MySQL semantics,
    computed driver-side so the cutoff is a plain literal in the plan.

    MONTH/YEAR clamp the day to the target month's last day (Mar 31 -
    1 MONTH = Feb 28/29); WEEK/DAY/HOUR/MINUTE/SECOND are plain
    timedelta arithmetic — exactly what MySQL's SUBDATE does. A bare
    int is shorthand for that many months (the reference's default
    granularity)."""
    if isinstance(retention, int):
        retention = Retention(retention, "MONTH")
    unit = retention.normalized_unit()
    if unit in _TIMEDELTA_UNITS:
        return now - retention.n * _TIMEDELTA_UNITS[unit]
    months = retention.n * 12 if unit == "YEAR" else retention.n
    month_index = (now.year * 12 + (now.month - 1)) - months
    year, month = divmod(month_index, 12)
    month += 1
    day = min(now.day, _days_in_month(year, month))
    return now.replace(year=year, month=month, day=day)


def _days_in_month(year: int, month: int) -> int:
    if month == 12:
        nxt = datetime(year + 1, 1, 1)
    else:
        nxt = datetime(year, month + 1, 1)
    return (nxt - datetime(year, month, 1)).days


def retention_predicate(deleted_column: str, cutoff: datetime) -> Column:
    """``deleted_at <= cutoff`` — NULLs excluded by SQL semantics."""
    return F.col(deleted_column) <= F.lit(cutoff)


def retention_filter(df: DataFrame, deleted_column: str, cutoff: datetime) -> DataFrame:
    """Rows eligible for archival. The predicate is a literal
    comparison, so it pushes down to the parquet scan."""
    return df.filter(retention_predicate(deleted_column, cutoff))


def remaining_after_archive(source: DataFrame, archived: DataFrame, primary_key: str) -> DataFrame:
    """The source after the delete step: everything not archived.

    ``LEFT ANTI`` join on the primary key — the Spark rewrite of the
    reference's chunked ``DELETE ... WHERE pk IN (...)`` loops
    (source/db.py:300-374). At scale, when ``archived`` derives from
    ``source`` by a pure predicate, prefer ``negate_predicate`` (no
    join at all); the anti-join form is the general contract when the
    archived set came from elsewhere (e.g. an idempotent re-run).
    """
    return source.join(archived.select(primary_key), on=primary_key, how="left_anti")
