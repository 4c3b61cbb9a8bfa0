"""Schema-drift detection between source and archive.

The reference compares ``SHOW CREATE TABLE`` text modulo an
``AUTO_INCREMENT=\\d+`` normalization and raises on any difference
(osarchiver/destination/db/db.py:246-277, errors.py:11-30). The Spark
equivalent is StructType equality with explicit normalizations:
nullability is ignored by default (parquet round-trips can flip it,
the moral equivalent of AUTO_INCREMENT noise) while names and types
must match exactly.
"""

from __future__ import annotations

from pyspark.sql.types import StructType


class SchemaDriftError(Exception):
    """Archive table exists but its schema differs from the source
    (reference OSArchiverNotEqualDbError/NotEqualTableError)."""


def _normalize(schema: StructType, ignore_nullability: bool) -> list[tuple[str, str]]:
    return [
        (f.name, f.dataType.simpleString() + ("" if ignore_nullability else f":{f.nullable}"))
        for f in schema.fields
    ]


def check_schema_drift(
    source: StructType,
    archive: StructType,
    ignore_nullability: bool = True,
) -> None:
    """Raise SchemaDriftError on any column-name/type difference."""
    src = _normalize(source, ignore_nullability)
    dst = _normalize(archive, ignore_nullability)
    if src != dst:
        src_set, dst_set = set(src), set(dst)
        only_src = sorted(src_set - dst_set)
        only_dst = sorted(dst_set - src_set)
        raise SchemaDriftError(
            f"schema drift: source-only={only_src} archive-only={only_dst} "
            f"(order-or-type mismatch if both empty: {src} != {dst})"
        )


def additive_columns(
    source: StructType,
    archive: StructType,
    ignore_nullability: bool = True,
) -> list[str]:
    """Additive-evolution check (beyond the reference's strict
    equality — the lakehouse policy): the source may GROW new columns
    (returned, so the caller can log/merge them), but every archived
    column must still exist in the source with an identical type —
    renames, drops and type changes still raise. Column ORDER is
    irrelevant here (parquet is name-addressed; only the strict check
    treats order as drift, mirroring SHOW CREATE TABLE equality)."""
    src = dict(_normalize(source, ignore_nullability))
    dst = dict(_normalize(archive, ignore_nullability))
    missing = {n: t for n, t in dst.items() if src.get(n) != t}
    if missing:
        raise SchemaDriftError(
            f"non-additive drift: archive columns missing or retyped in "
            f"source: {sorted(missing.items())}"
        )
    return sorted(set(src) - set(dst))
