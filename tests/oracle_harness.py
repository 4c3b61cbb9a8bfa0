"""Local mirror of the driver's Spark-vs-DuckDB differential check.

Default mode is BIT-EXACT (driver round 4 taught us why: `psi_drift`
and `token_budget_sample` passed 630 local tests under a 1e-9
tolerance and then hash-failed adjudication, because the driver
hashes exact values). Numbers are canonicalized to `fractions.
Fraction` — exact for int, Decimal and float alike — so a one-ulp or
one-decimal-boundary divergence fails here first. The 1e-9-tolerant
comparison survives behind ``exact=False`` for callers that
deliberately compare against a non-identical formulation.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal
from fractions import Fraction

import duckdb

from osarchiver_spark.sources.parquet import TABLES, table_path

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        # driver fixtures are single files; self-built scale fixtures
        # (tools/make_scale_fixture.py) are Spark-written DIRECTORIES
        # of part files — glob those so sf1/sf10 parity sweeps run
        # through the same harness
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v, exact: bool = False):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("n", Fraction(v)) if exact else ("n", float(v))
    if isinstance(v, Decimal):
        return ("n", Fraction(v)) if exact else ("n", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if math.isinf(v):
            return ("inf", v > 0)
        return ("n", Fraction(v)) if exact else ("n", v)
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("t", datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x, exact) for x in v))
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


def compare_query(
    spark, name: str, query_fn, oracle: str, sf_dir: str, exact: bool = True,
    on_connection=None,
) -> None:
    """Raise AssertionError with a readable diff on any mismatch.

    ``exact=True`` (default) mirrors the driver's value hash: every
    number must agree to the bit. ``exact=False`` falls back to the
    1e-9-tolerant float comparison.

    ``on_connection`` (optional) receives the live DuckDB connection
    before the oracle runs — a watchdog can ``con.interrupt()`` it,
    which Spark job-group cancellation cannot reach (the sf1 sweep's
    per-query wall cap needs BOTH: a timed-out oracle otherwise keeps
    burning every core as a zombie)."""
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    if on_connection is not None:
        on_connection(con)
    try:
        rel = con.sql(oracle)
        duck_cols = list(rel.columns)
        duck_types = [str(t) for t in rel.types]
        duck_rows = rel.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )

    # Carrier-type guard (driver-r07 root-cause of the r04-r06 chronic
    # hash-fails): fetchall() gives Python ints for HUGEINT so the
    # Fraction canonicalization above is blind to it, but the DRIVER's
    # fetch renders HUGEINT as float64 (pandas) or decimal128 (Arrow)
    # and hashes a different carrier than Spark's int64 — rows and
    # name-based schema still match, only the value hash fails. Of 213
    # oracles exactly the two chronic failers emitted HUGEINT.
    # WHITELIST (not blacklist) of carrier-stable types: these seven
    # are the complete set the 219-oracle registry emits today, and
    # every one maps 1:1 onto a Spark/pandas/Arrow carrier. Anything
    # else (HUGEINT, UHUGEINT, DECIMAL, TIME, INTERVAL, UUID, LIST,
    # nested…) must be CAST in the oracle before it reaches an output
    # column — exotic carriers are exactly where three rounds of
    # hash-fails lived.
    _STABLE = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
               "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP")
    bad_types = {
        c: t
        for c, t in zip(duck_cols, duck_types)
        if str(t).upper() not in _STABLE
    }
    assert not bad_types, (
        f"{name}: oracle output columns with fetch-unstable carrier types "
        f"{bad_types} — the driver's pandas/Arrow fetch can render these "
        f"on a different carrier than Spark's (HUGEINT -> float64/"
        f"decimal128 was three rounds of hash-fails); CAST them in the "
        f"oracle (AS BIGINT / AS DOUBLE / AS VARCHAR)"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    duck_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_canon = sorted(tuple(_canon(r[i], exact) for i in order) for r in spark_rows)
    d_canon = sorted(tuple(_canon(r[i], exact) for i in duck_order) for r in duck_rows)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        row_ok = (
            sr == dr
            if exact
            else all(_values_close(a, b) for a, b in zip(sr, dr))
        )
        if not row_ok:
            mismatches.append((i, _pretty(sr), _pretty(dr)))
            if len(mismatches) >= 3:
                break
    mode = "bit-exact" if exact else "tolerant"
    assert not mismatches, (
        f"{name}: {mode} value mismatches (first 3 of sorted rows): {mismatches}"
    )


def _pretty(row):
    """Readable mismatch rendering: Fractions back to floats/hex."""
    out = []
    for cell in row:
        if cell[0] == "n" and isinstance(cell[1], Fraction):
            f = float(cell[1])
            out.append(f"{f!r}({f.hex()})")
        else:
            out.append(cell)
    return tuple(out)
