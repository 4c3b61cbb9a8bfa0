"""Declarative archival job spec.

The reference's "query language" is an INI file with interpolated
sections (osarchiver/config.py:19-156, archiver_sample.ini). Here a
job is a plain dataclass: the driver-level plan that the DataFrame
pipeline builder executes. Parquet carries no PK/FK metadata, so keys
and the FK graph are declared explicitly (SURVEY §1.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # annotation-only: avoids plans <-> operators cycle
    from osarchiver_spark.operators.retention import Retention


@dataclass(frozen=True)
class TableSpec:
    """One archivable table (reference: source/db.py:122-185).

    foreign_keys maps fk column -> (parent_table, parent_column);
    used only for plan-level topological ordering — Spark enforces no
    FK constraints, ordering discipline replaces them (SURVEY O4/X3).
    """

    name: str
    primary_key: str
    deleted_column: str | None = None
    foreign_keys: dict[str, tuple[str, str]] = field(default_factory=dict)


@dataclass
class ArchiveJobSpec:
    """A pipeline = one source + N destinations (reference archiver.py:14-33).

    ``now`` is frozen once per run and substituted into every table's
    retention predicate so parent/child tables see identical cutoffs
    (reference source/db.py:59-65, SURVEY P3).
    """

    tables: list[TableSpec]
    # int = months (the reference's default granularity); a Retention
    # carries any MySQL interval unit (30 DAY, 12 HOUR, ...)
    retention_months: int | Retention = 12
    now: datetime | None = None
    db_exclusions: list[str] = field(default_factory=list)
    table_exclusions: list[str] = field(default_factory=list)
    archive_data: bool = True
    delete_data: bool = True
    dry_run: bool = False

    def eligible_tables(self) -> list[TableSpec]:
        """Tables that qualify for archival: must carry the deleted
        column (reference source/db.py:153-166) and not match an
        exclusion regex (source/db.py:168-174, anchored)."""
        out = []
        for t in self.tables:
            if t.deleted_column is None:
                continue
            if any(re.match(f"^{pat}$", t.name) for pat in self.table_exclusions):
                continue
            out.append(t)
        return out
