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


def cdc_apply(
    changelog: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the current state from a CDC changelog: for each
    key the operation with the highest sequence number wins; a winning
    delete removes the row, anything else emits its payload. This is
    the apply step of a Debezium/binlog-style feed (and of Delta's
    CDF) expressed as ONE map-combinable ``max_by`` aggregation on the
    key — no window (which would sort every partition), no self-join,
    so it scales as a plain hash agg and is exactly the shape a
    foreachBatch streaming upsert uses per micro-batch. Sequence
    numbers must be unique per key (binlog offsets are)."""
    from pyspark.sql import functions as F

    payload = [c for c in changelog.columns if c not in (key_col, seq_col, op_col)]
    winner = changelog.groupBy(key_col).agg(
        F.max_by(F.struct(op_col, *payload), F.col(seq_col)).alias("w"),
        F.max(seq_col).alias("last_seq"),
    )
    return (
        winner.filter(F.col(f"w.{op_col}") != delete_op)
        .select(key_col, *[F.col(f"w.{c}").alias(c) for c in payload], "last_seq")
    )
