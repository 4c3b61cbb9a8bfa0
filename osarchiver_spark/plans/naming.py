"""Archive namespace rules (SURVEY S12).

The reference guards against archiving a database into itself: when
source and destination hosts match it force-appends an ``_archive``
suffix (osarchiver/destination/db/db.py:74-91), supports ``{date}``
templating in db/table suffixes (db.py:93-94,112-113), and applies a
configurable table suffix (db.py:103-115). Here the namespace is an
output path/table name; the self-overwrite guard is a hard error
(the reference warns + sleeps 10 s — a batch engine should refuse).
"""

from __future__ import annotations

import os
from datetime import datetime


class SelfOverwriteError(Exception):
    """Archive destination resolves to the source location."""


def render_suffix(template: str, now: datetime) -> str:
    """``{date}`` templating, reference db.py:93-94 (strftime '%F_%T'
    → filesystem-safe variant here)."""
    return template.replace("{date}", now.strftime("%Y-%m-%d_%H-%M-%S"))


def resolve_archive_path(
    source_path: str,
    archive_root: str,
    table: str,
    suffix: str = "",
    now: datetime | None = None,
) -> str:
    """Build ``<archive_root>/<table><suffix>`` and refuse any layout
    where the archive would overwrite its own source."""
    suffix = render_suffix(suffix, now or datetime.now()) if suffix else ""
    out = os.path.join(archive_root, f"{table}{suffix}")
    src = os.path.normpath(os.path.abspath(source_path))
    dst = os.path.normpath(os.path.abspath(out))
    if dst == src or dst.startswith(src + os.sep) or src.startswith(dst + os.sep):
        raise SelfOverwriteError(
            f"archive path {dst} overlaps source {src}; pick a disjoint archive root "
            "(the reference forces an _archive suffix in this situation)"
        )
    return out
