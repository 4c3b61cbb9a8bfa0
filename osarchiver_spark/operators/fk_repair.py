"""FK-integrity repair artifacts (reference common/db.py:505-547).

On a foreign-key integrity error the reference parses the exception
and logs two ready-to-run statements: a SELECT retrieving the
offending child rows and an UPDATE that marks still-live children
deleted with their parent's deletion date
(integrity_exception_select_statement / _potential_fix).

Spark-first the same repair is a set-level computation — no exception
parsing, no per-row loop:

- ``fk_repair_patch``: one join producing the patch DataFrame — for
  every live child referencing an archived parent, the child key and
  the deletion date it should inherit;
- ``apply_fk_repair``: the UPDATE-equivalent — left join the patch
  back and coalesce the deleted column;
- ``fk_repair_statements``: the human-actionable artifact — the
  reference's exact SELECT/UPDATE text per offending row, rendered
  distributed with built-in expressions.

Applying the patch empties the orphan report (pytest-pinned), which
is the invariant the reference's manual UPDATE restores.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_repair_patch(
    children: DataFrame,
    parents: DataFrame,
    fk: str,
    parent_key: str,
    child_keys: list[str],
    child_deleted: str,
    parent_deleted: str,
    cutoff: datetime,
) -> DataFrame:
    """Children that would orphan when their parents archive: still
    live at the cutoff (NULL or newer deletion date) but referencing
    an archived parent. Output: child keys + fk + ``patched_deleted``
    (the parent's deletion date the child should inherit — the
    reference UPDATE's SET clause)."""
    archived = parents.filter(F.col(parent_deleted) <= F.lit(cutoff)).select(
        F.col(parent_key), F.col(parent_deleted).alias("patched_deleted")
    )
    live = children.filter(
        F.col(child_deleted).isNull() | ~(F.col(child_deleted) <= F.lit(cutoff))
    )
    joined = live.join(archived, live[fk] == archived[parent_key], "inner")
    return joined.select(*child_keys, fk, "patched_deleted") if fk not in child_keys else joined.select(*child_keys, "patched_deleted")


def apply_fk_repair(
    children: DataFrame,
    patch: DataFrame,
    child_keys: list[str],
    child_deleted: str,
) -> DataFrame:
    """The UPDATE-equivalent: children with the patched deletion date
    applied (patched rows inherit it, others keep their own)."""
    p = patch.select(*child_keys, F.col("patched_deleted"))
    return (
        children.join(p, on=child_keys, how="left")
        .withColumn(child_deleted, F.coalesce("patched_deleted", child_deleted))
        .drop("patched_deleted")
    )


def fk_repair_statements(
    patch: DataFrame,
    db: str,
    child_table: str,
    parent_table: str,
    fk: str,
    parent_key: str,
    child_deleted: str,
    parent_deleted: str | None = None,
) -> DataFrame:
    """Render the reference's per-row artifacts (common/db.py:505-547):
    ``select_stmt`` fetches the offending children, ``update_stmt`` is
    the potential fix. Built-in concat expressions — rendered on
    executors, never collected. The reference assumes one
    deleted_column name on both tables; ``parent_deleted`` overrides
    the SET source when the parent names it differently."""
    parent_deleted = parent_deleted or child_deleted
    val = F.col(fk).cast("string")
    quoted = F.concat(F.lit("'"), val, F.lit("'"))
    # digits stay bare, like the reference's isdigit() branch
    rendered = F.when(val.rlike("^[0-9]+$"), val).otherwise(quoted)
    select_stmt = F.concat(
        F.lit(f"SELECT * FROM `{db}`.`{child_table}` WHERE `{fk}` = '"),
        val,
        F.lit("'"),
    )
    update_stmt = F.concat(
        F.lit(
            f"UPDATE `{db}`.`{child_table}` INNER JOIN `{db}`.`{parent_table}` ON "
            f"`{db}`.`{parent_table}`.`{parent_key}` = `{db}`.`{child_table}`.`{fk}` "
            f"SET `{db}`.`{child_table}`.`{child_deleted}` = "
            f"`{db}`.`{parent_table}`.`{parent_deleted}` WHERE {fk} = "
        ),
        rendered,
        F.lit(f" AND `{db}`.`{child_table}`.`{child_deleted}` IS NULL"),
    )
    return patch.select(
        fk,
        select_stmt.alias("select_stmt"),
        update_stmt.alias("update_stmt"),
    ).distinct()
