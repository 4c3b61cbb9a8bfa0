"""Differential property tests for functions/precision.py — the
fixed-point discipline every cross-engine float emission relies on.

The claim under test: ``floor(x*10^n + 0.5)/10^n`` (and its bigint
``quantize`` twin) produce BIT-IDENTICAL doubles in Spark, DuckDB and
CPython for any shared double input, because multiply/add/floor/divide
are plain IEEE-754 ops with no decimal-string step. If any engine
disagreed on a single bit, every query hardened with these helpers
would be one driver round away from a hash-fail — so this test is the
foundation the round-5 hardening stands on.

Adversarial inputs: exact decimal .5 boundaries (k + 5)/10^(n+1),
their float neighbors (nextafter up/down), and random doubles across
magnitudes — precisely the population where Spark's round() (HALF_UP
on the shortest repr) and DuckDB's round() (exact binary expansion)
are KNOWN to disagree (see module docstring of precision.py; the
psi_drift / token_budget_sample driver-r04 hash fails).
"""

from __future__ import annotations

import math
import struct

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import (
    exact_round,
    quantize,
    sql_exact_round,
    sql_quantize,
)


def _bits(x: float) -> str:
    return struct.pack("<d", x).hex()


def _py_exact_round(x: float, n: int) -> float:
    scale = float(10**n)
    return math.floor(x * scale + 0.5) / scale


def _py_quantize(x: float, n: int) -> int:
    scale = float(10**n)
    return int(math.floor(x * scale + 0.5))


def _boundary_floats() -> list[float]:
    vals: list[float] = []
    for n in (2, 4, 6):
        for k in (0, 1, 12345, 999_999):
            b = (10 * k + 5) / (10.0 ** (n + 1))  # exact .5 boundary at n dp
            vals += [b, math.nextafter(b, 0.0), math.nextafter(b, math.inf)]
    return vals


_FINITE = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(xs=st.lists(_FINITE, min_size=1, max_size=64), n=st.integers(0, 8))
def test_exact_round_and_quantize_agree_across_three_engines(spark, xs, n):
    xs = xs + _boundary_floats()
    sdf = spark.createDataFrame([(float(x),) for x in xs], "x double").select(
        exact_round(F.col("x"), n).alias("r"), quantize(F.col("x"), n).alias("q")
    )
    got = sdf.collect()
    con = duckdb.connect()
    for (s_r, s_q), x in zip(got, xs):
        d_r, d_q = con.execute(
            f"SELECT {sql_exact_round('?', n)}, {sql_quantize('?', n)}",
            [float(x), float(x)],
        ).fetchone()
        p_r, p_q = _py_exact_round(float(x), n), _py_quantize(float(x), n)
        assert _bits(s_r) == _bits(d_r) == _bits(p_r), (x, n, s_r, d_r, p_r)
        assert int(s_q) == int(d_q) == p_q, (x, n, s_q, d_q, p_q)


def test_known_spark_duckdb_round_divergence_is_fixed(spark):
    """0.0005045 is a MEASURED divergence (scanned 200k decimal .5
    boundaries at 6 dp on this engine pair): its shortest repr ends
    in 5, so Spark's HALF_UP-on-repr round(…, 6) gives 0.000505,
    while its exact binary expansion is …44999…, so DuckDB's
    exact-expansion round gives 0.000504 — precisely the class of
    one-digit disagreement behind the driver-r04 psi_drift /
    token_budget_sample hash fails (~1.7% of boundary values diverge).
    Which side the fixed-point form lands on is an IEEE detail; what
    this pins is that all three engines land on the SAME side, while
    the builtin round()s demonstrably do not."""
    x = 0.0005045
    con = duckdb.connect()
    (d_r,) = con.execute(f"SELECT {sql_exact_round('?', 6)}", [x]).fetchone()
    (s_r,) = (
        spark.createDataFrame([(x,)], "x double")
        .select(exact_round(F.col("x"), 6).alias("r"))
        .collect()[0]
    )
    assert _bits(s_r) == _bits(d_r) == _bits(_py_exact_round(x, 6))
    # and the hazard itself is real on this engine pair: the builtin
    # decimal rounds disagree with each other on this input
    (d_round,) = con.execute("SELECT round(?, 6)", [x]).fetchone()
    (s_round,) = (
        spark.createDataFrame([(x,)], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()[0]
    )
    assert s_round != d_round  # Spark HALF_UP-on-repr vs DuckDB exact expansion


def test_sql_helpers_pin_the_inlined_oracle_spelling():
    """Pin the canonical helper spelling so a future change cannot
    silently drift. NOTE the ~20 oracles that hand-pasted the
    pre-r07 spelling (bare ``100.0`` literals, un-cast HUGEINT
    division) deliberately KEEP it: they are driver-green with it,
    every value is identical under either typing in DuckDB 1.0.0,
    and rewriting 100 green sites would put churn ahead of evidence
    (the r07 root cause was HUGEINT at OUTPUT, not internal HUGEINT
    arithmetic). New oracles should call these helpers and get the
    version-pinned CAST('…' AS DOUBLE) spelling."""
    from osarchiver_spark.functions.precision import sql_cent_sum, sql_money_sum

    assert sql_cent_sum("value") == (
        "(CAST(sum(CAST(floor((value) * CAST('100' AS DOUBLE)"
        " + CAST('0.5' AS DOUBLE)) AS BIGINT)) AS DOUBLE)"
        " / CAST('100' AS DOUBLE))"
    )
    assert sql_money_sum("l_extendedprice * (1 - l_discount)", 4, 2) == (
        "(floor(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))"
        " * CAST('10000' AS DOUBLE) + CAST('0.5' AS DOUBLE)) AS BIGINT))"
        " + 50 AS DOUBLE) / CAST('100' AS DOUBLE)) / CAST('100' AS DOUBLE))"
    )
    assert sql_money_sum("x", 4, 4) == (
        "(CAST(sum(CAST(floor((x) * CAST('10000' AS DOUBLE)"
        " + CAST('0.5' AS DOUBLE)) AS BIGINT)) AS DOUBLE)"
        " / CAST('10000' AS DOUBLE))"
    )
    import pytest

    with pytest.raises(ValueError):
        sql_money_sum("x", 2, 4)


def test_money_sum_guards_and_exactness(spark):
    """money_sum: (a) rejects grid refinement (in < out) like its SQL
    twin; (b) over exact 2-dp data its sums equal exact Fraction
    arithmetic at every in>=out grid combination, independent of
    partitioning (the order-proofness it exists for)."""
    import random
    from fractions import Fraction

    import pytest
    from pyspark.sql import functions as F

    from osarchiver_spark.functions.precision import money_sum

    with pytest.raises(ValueError):
        money_sum(F.col("x"), 2, 4)

    rng = random.Random(17)
    cents = [rng.randrange(0, 10_000_000) for _ in range(500)]
    rows = [(c / 100.0,) for c in cents]
    exact = sum(Fraction(c, 100) for c in cents)
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "x double").repartition(parts)
        for in_d, out_d in ((2, 2), (4, 2), (6, 2), (4, 4)):
            got = df.agg(money_sum(F.col("x"), in_d, out_d).alias("s")).first()["s"]
            # rescale exact to the out grid with the same half-up rule
            scaled = exact * 10**out_d
            want = float(
                Fraction(
                    (scaled.numerator * 2 + scaled.denominator)
                    // (2 * scaled.denominator)
                )
                / 10**out_d
            )
            assert got == want, (in_d, out_d, parts, got, want)


def test_pinned_ln_accuracy_and_cross_engine_bit_identity(spark):
    """pinned_ln's two contracts, property-style: (a) accuracy — within
    2e-10 absolute of libm over the argument range psi-like consumers
    produce (e^-18..e^18); (b) the load-bearing one — BIT identity
    between the Spark expression and sql_pinned_ln in DuckDB on the
    same inputs, which holds by construction (sqrt,+,−,×,÷ are all
    correctly rounded per IEEE-754) and is what lets a registry hash
    depend on a data-dependent logarithm at all."""
    import math
    import random
    import struct

    import duckdb
    from pyspark.sql import functions as F

    from osarchiver_spark.functions.precision import pinned_ln, sql_pinned_ln

    rng = random.Random(43)
    xs = [math.exp(rng.uniform(-18.0, 18.0)) for _ in range(200)]
    xs += [1.0, 0.5, 2.0, 1e-9, 1e9, 1.0000001, 0.9999999]

    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r["y"]
        for r in df.select(pinned_ln(F.col("x")).alias("y")).collect()
    ]
    for x, y in zip(xs, got):
        assert abs(y - math.log(x)) < 2e-10, (x, y, math.log(x))

    con = duckdb.connect()
    # bind x once via a subquery: sql_pinned_ln textually duplicates
    # its argument, so a bare '?' would demand one bind per copy
    sql = f"SELECT {sql_pinned_ln('x')} FROM (SELECT CAST(? AS DOUBLE) AS x)"
    duck = [con.execute(sql, [x]).fetchone()[0] for x in xs]
    bits = lambda v: struct.pack("<d", v)  # noqa: E731
    for x, s, d in zip(xs, got, duck):
        assert bits(s) == bits(d), (x, s.hex(), d.hex())


def test_pinned_ln_staged_ctes_are_bit_identical_to_one_shot():
    """The staged tower/z/series decomposition (what the psi_drift
    oracle embeds, with pln_y/pln_z bound as named CTE columns) must
    produce the SAME double, bit-for-bit, as the one-shot
    sql_pinned_ln expansion — same ops on the same values, just
    evaluated through named columns instead of ~10 textual copies."""
    import math
    import random
    import struct

    import duckdb

    from osarchiver_spark.functions.precision import (
        sql_pinned_ln,
        sql_pinned_ln_series,
        sql_pinned_ln_tower,
        sql_pinned_ln_z,
    )

    rng = random.Random(47)
    xs = [math.exp(rng.uniform(-18.0, 18.0)) for _ in range(100)]
    xs += [1.0, 0.5, 2.0, 1e-9, 1e9, 1.0000001, 0.9999999]

    con = duckdb.connect()
    staged = f"""
        WITH base AS (SELECT CAST(? AS DOUBLE) AS x),
        lny AS (SELECT {sql_pinned_ln_tower('x')} AS pln_y FROM base),
        lnz AS (SELECT {sql_pinned_ln_z('pln_y')} AS pln_z FROM lny)
        SELECT {sql_pinned_ln_series('pln_z')} FROM lnz
    """
    one_shot = f"SELECT {sql_pinned_ln('x')} FROM (SELECT CAST(? AS DOUBLE) AS x)"
    bits = lambda v: struct.pack("<d", v)  # noqa: E731
    for x in xs:
        s = con.execute(staged, [x]).fetchone()[0]
        o = con.execute(one_shot, [x]).fetchone()[0]
        assert bits(s) == bits(o), (x, s.hex(), o.hex())


def test_round_half_up_py_matches_spark_round(spark):
    """round_half_up_py is documented as a bit-for-bit replica of
    Spark's F.round on DoubleType (shortest-repr HALF_UP); the
    driver-collapsed trainer loops rely on that. Pin it directly on
    boundary-heavy values at every quantization the trainers use."""
    import random

    from osarchiver_spark.functions.precision import round_half_up_py

    xs = [
        0.5, -0.5, 1.5, 2.5, -2.5, 0.05, -0.05, 2.675, -2.675, 1.005,
        0.285, 1e-13, -1e-13, 0.1 + 0.2, 1.0 / 3.0, 123456.789999999,
        5e-10, -5e-10, 4.999999999e-10, 0.0, -0.0, 1e15 + 0.5,
    ]
    rng = random.Random(12)
    xs += [rng.uniform(-2, 2) for _ in range(200)]
    xs += [rng.uniform(-1e-9, 1e-9) for _ in range(100)]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    for nd in (0, 6, 9, 12):
        got = [
            r["r"]
            for r in df.select(F.round(F.col("x"), nd).alias("r")).collect()
        ]
        want = [round_half_up_py(x, nd) for x in xs]
        assert got == want, f"divergence at ndigits={nd}"
