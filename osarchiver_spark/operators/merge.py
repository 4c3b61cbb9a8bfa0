"""MERGE INTO emulation for plain-parquet targets (SURVEY S10 scale
mapping: 'Delta MERGE ... WHEN NOT MATCHED THEN INSERT').

Delta/Iceberg jars are not in this image, so the upsert is composed
from built-ins with the same semantics:

- merge_insert_if_absent: the reference's ``ON DUPLICATE KEY UPDATE
  pk=pk`` no-op upsert (destination/db/db.py:392-400) — new keys
  append, existing keys stay untouched.
- merge_upsert: WHEN MATCHED THEN UPDATE + WHEN NOT MATCHED THEN
  INSERT — source wins on conflict.

Both are pure-DataFrame (anti-join + union): one shuffle each, no
driver involvement, safe to express at any scale. On Delta these
become a single ``MERGE INTO`` statement; the call sites wouldn't
change shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_insert_if_absent(target: DataFrame, source: DataFrame, pk: str) -> DataFrame:
    """target ∪ (source ∖ target) keyed on pk."""
    new_rows = source.join(target.select(pk), on=pk, how="left_anti")
    return target.unionByName(new_rows)


def merge_upsert(target: DataFrame, source: DataFrame, pk: str) -> DataFrame:
    """source wins on pk conflict; unmatched target rows survive."""
    kept = target.join(source.select(pk), on=pk, how="left_anti")
    return kept.unionByName(source.select(*target.columns))
