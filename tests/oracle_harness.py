"""Local mirror of the driver's Spark-vs-DuckDB differential check.

Stricter than (our best guess of) the driver: row count, sorted
column names, and an order-insensitive canonical value comparison
with tight float tolerance. Run this before the driver does.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from osarchiver_spark.sources.parquet import TABLES, table_path

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("n", float(v))
    if isinstance(v, Decimal):
        return ("n", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("n", v)
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("t", datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def _values_close(a, b) -> bool:
    if a == b:
        return True
    if a[0] == "n" and b[0] == "n":
        return math.isclose(a[1], b[1], rel_tol=FLOAT_REL_TOL, abs_tol=FLOAT_ABS_TOL)
    if a[0] == "l" and b[0] == "l" and len(a[1]) == len(b[1]):
        return all(_values_close(x, y) for x, y in zip(a[1], b[1]))
    return False


def compare_query(spark, name: str, query_fn, oracle: str, sf_dir: str) -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    duck_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_canon = sorted(tuple(_canon(r[i]) for i in order) for r in spark_rows)
    d_canon = sorted(tuple(_canon(r[i]) for i in duck_order) for r in duck_rows)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        if not all(_values_close(a, b) for a, b in zip(sr, dr)):
            mismatches.append((i, sr, dr))
            if len(mismatches) >= 3:
                break
    assert not mismatches, f"{name}: value mismatches (first 3 of sorted rows): {mismatches}"
