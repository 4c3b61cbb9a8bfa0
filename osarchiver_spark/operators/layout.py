"""Z-order (Morton-curve) data layout for multi-column data skipping.

At 100 TB, file-level min/max statistics only prune scans when rows
that are close in the FILTER columns are also close in the FILE
layout. A single-column sort gives that for one column; interleaving
the bits of two columns (a space-filling Z-curve) gives it for both
at once: sorting by the interleaved value makes every output file a
small rectangle in (x, y) space, so a predicate on either column
skips most files. This is the layout step a lakehouse engine runs at
compaction time (cf. the OPTIMIZE ... ZORDER BY idiom).

The bit-interleave is plain integer arithmetic — one codegen'd
expression, no UDF, identical text in Spark SQL and DuckDB so the
layout derivation is exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The Morton interleave of two ``bits``-wide non-negative ints as
    an engine-portable SQL expression: bit i of x lands at position
    2i, bit i of y at 2i+1. Shift-right + mask + multiply-by-power-of-
    two only, so Spark and DuckDB evaluate it bit-identically."""
    x = f"(({x_expr}) & {(1 << bits) - 1})"
    y = f"(({y_expr}) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def zorder_col(x_expr: str, y_expr: str, bits: int = 16) -> Column:
    return F.expr(zorder_sql(x_expr, y_expr, bits))


def zorder_layout(df: DataFrame, x_expr: str, y_expr: str, bits: int = 16,
                  num_files: int | None = None) -> DataFrame:
    """Re-layout a DataFrame along the Z-curve: range-partition by the
    interleaved value (each output file = one contiguous curve
    segment = a small (x, y) rectangle) and sort within partitions so
    row groups inside a file stay clustered too. Write the result
    with any sink; parquet min/max stats then prune on BOTH columns."""
    with_z = df.withColumn("_z", zorder_col(x_expr, y_expr, bits))
    parted = (
        with_z.repartitionByRange(num_files, "_z")
        if num_files
        else with_z.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")
