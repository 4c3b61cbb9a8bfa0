"""operators/quantiles.py — exact integer-rational order statistics.

Contracts pinned here:
1. The numerator/denominator pair equals the EXACT Fraction value of
   the Hyndman-Fan-7 linear interpolation (the definition Spark
   ``percentile``, DuckDB ``quantile_cont`` and NumPy default all
   document), computed independently in Python rationals.
2. The Spark helper and its DuckDB SQL twin agree bit-for-bit on the
   same input — the property the r07 winsorize_events sf1 hash-fail
   proved float interpolation does NOT have.
3. Partitioning independence (the helper is a histogram aggregate).
"""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F

from osarchiver_spark.operators.quantiles import (
    exact_quantile_nums,
    sql_exact_quantile_nums,
)

QS = {"q05": (1, 20), "q25": (1, 4), "q50": (1, 2), "q95": (19, 20)}


def _reference(values: list[int], a: int, b: int) -> Fraction:
    """Hyndman-Fan 7 in exact rationals."""
    v = sorted(values)
    n = len(v)
    pos = Fraction((n - 1) * a, b)
    idx = int(pos)
    frac = pos - idx
    hi = v[idx + 1] if idx + 1 < n else v[idx]
    return v[idx] + (hi - v[idx]) * frac


@pytest.mark.parametrize("seed", [3, 11])
def test_exact_quantiles_match_rational_reference(spark, seed):
    rng = random.Random(seed)
    groups = {
        "a": [rng.randrange(0, 1000) for _ in range(rng.randrange(1, 400))],
        "b": [rng.randrange(-500, 500) for _ in range(rng.randrange(1, 400))],
        "c": [7],  # single-row group: v_hi is NULL, coalesce path
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    for parts in (1, 5):
        df = spark.createDataFrame(rows, "g string, x long").repartition(parts)
        got = {
            r["g"]: r
            for r in exact_quantile_nums(df, "g", "x", QS).collect()
        }
        for g, vals in groups.items():
            assert got[g]["n"] == len(vals)
            for name, (a, b) in QS.items():
                num, den = got[g][f"{name}_num"], got[g][f"{name}_den"]
                assert den == b
                assert Fraction(num, den) == _reference(vals, a, b), (
                    g, name, parts, num, den,
                )


def test_exact_quantiles_sql_twin_is_identical(spark):
    rng = random.Random(29)
    rows = [
        (rng.choice("pqr"), rng.randrange(0, 10_000)) for _ in range(2_000)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    got = sorted(
        tuple(r) for r in exact_quantile_nums(df, "g", "x", QS).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.execute(sql_exact_quantile_nums("t", "g", "x", QS)).fetchall()
    )
    assert got == want


def test_exact_quantiles_ignore_nulls_on_both_engines(spark):
    """NULL int_col rows must not shift rank selection on either side:
    Spark windows sort NULLS FIRST, DuckDB NULLS LAST, so an unfiltered
    NULL bucket would desynchronize cum on exactly one engine. Both
    helpers drop NULLs (and exclude them from n)."""
    rng = random.Random(59)
    rows = [
        ("g", rng.randrange(0, 1_000) if rng.random() < 0.8 else None)
        for _ in range(1_000)
    ]
    non_null = [x for _, x in rows if x is not None]
    df = spark.createDataFrame(rows, "g string, x long")
    got = exact_quantile_nums(df, "g", "x", QS).collect()[0]
    assert got["n"] == len(non_null)
    for name, (a, b) in QS.items():
        assert Fraction(got[f"{name}_num"], got[f"{name}_den"]) == _reference(
            non_null, a, b
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(sql_exact_quantile_nums("t", "g", "x", QS)).fetchall()
    assert sorted(tuple(r) for r in [got]) == sorted(want)


def test_exact_quantiles_match_spark_percentile_off_boundary(spark):
    """Sanity vs the engine: wherever the float interpolation is NOT
    at a representation edge, Spark's own percentile(x, q) must equal
    num/den to double precision — the helper is the same definition,
    just exact."""
    rng = random.Random(41)
    rows = [("g", rng.randrange(0, 100_000)) for _ in range(5_001)]
    df = spark.createDataFrame(rows, "g string, x long")
    qn = exact_quantile_nums(df, "g", "x", QS).collect()[0]
    pct = df.agg(
        *[
            F.expr(f"percentile(x, {a}/{b})").alias(name)
            for name, (a, b) in QS.items()
        ]
    ).collect()[0]
    for name in QS:
        exact = Fraction(qn[f"{name}_num"], qn[f"{name}_den"])
        assert abs(float(exact) - pct[name]) < 1e-9 * max(1.0, pct[name])


def test_exact_quantiles_plan_is_single_shuffle_no_join(spark):
    """Scale pin for the r08 shape change: the group total comes from
    a whole-partition window over the SAME exchange as the cumsum
    window — not a separate totals aggregate broadcast-joined back.
    The plan must show exactly the histogram exchange (group, value)
    + the window exchange (group), and no join of any kind."""
    import contextlib
    import io

    df = spark.range(1000).selectExpr("id % 3 AS g", "id % 37 AS x")
    out = exact_quantile_nums(df, "g", "x", QS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan, plan
    # formatted explain prints one "(N) Exchange" node header per
    # shuffle; "hashpartitioning" appears on its Arguments line
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 2, plan
    assert plan.count("hashpartitioning") == 2, plan


def test_multi_population_matches_single_with_zero_count_cells(spark):
    """exact_quantile_nums_multi over a shared histogram (zero-count
    cells included for the sparser population) must equal
    exact_quantile_nums_hist run on each population's own FILTERED
    histogram — the inertness argument in its docstring, pinned."""
    import random

    from osarchiver_spark.operators.quantiles import (
        exact_quantile_nums_hist,
        exact_quantile_nums_multi,
    )

    rng = random.Random(77)
    rows = []
    for g in ("a", "b", "c"):
        for v in range(1, 30):
            ca = rng.choice([0, 0, 1, 2, 5])   # plenty of zero cells
            cb = rng.choice([0, 1, 3])
            if ca or cb:
                rows.append((g, v, ca, cb))
    hist = spark.createDataFrame(rows, "g string, v long, ca long, cb long")
    qlevels = {"p25": 0.25, "p50": 0.5, "p99": 0.99}
    # per-population quantile NAMES must be distinct (they become
    # output column names)
    multi = exact_quantile_nums_multi(
        hist, "g", "v",
        {
            "ca": ("n_a", {f"a_{k}": q for k, q in qlevels.items()}),
            "cb": ("n_b", {f"b_{k}": q for k, q in qlevels.items()}),
        },
    ).collect()
    got = {r["g"]: r.asDict() for r in multi}
    for cnt, n_alias, pfx in (("ca", "n_a", "a_"), ("cb", "n_b", "b_")):
        single = exact_quantile_nums_hist(
            hist.filter(F.col(cnt) > 0), "g", "v", cnt, qlevels
        ).collect()
        for r in single:
            m = got[r["g"]]
            assert m[n_alias] == r["n"]
            for name in qlevels:
                assert m[f"{pfx}{name}_num"] == r[f"{name}_num"], (cnt, r["g"], name)
                assert m[f"{pfx}{name}_den"] == r[f"{name}_den"]


def test_multi_population_zero_total_yields_null_numerators(spark):
    """A population with zero TOTAL count in a group must yield NULL
    numerators (the documented caller contract — the join shape it
    replaced dropped such groups), never a crash or a bogus value."""
    from osarchiver_spark.operators.quantiles import exact_quantile_nums_multi

    hist = spark.createDataFrame(
        [("g1", 1, 2, 0), ("g1", 5, 3, 0), ("g2", 2, 1, 4)],
        "g string, v long, ca long, cb long",
    )
    out = {
        r["g"]: r.asDict()
        for r in exact_quantile_nums_multi(
            hist, "g", "v",
            {"ca": ("n_a", {"a50": 0.5}), "cb": ("n_b", {"b50": 0.5})},
        ).collect()
    }
    # ca in g1 is populated: {1:2, 5:3} -> n=5, p50 = value at rank 3 = 5
    assert out["g1"]["n_a"] == 5 and out["g1"]["a50_num"] == 2 * 5
    # cb in g1: zero total -> NULL numerator, den still the literal
    assert out["g1"]["n_b"] == 0
    assert out["g1"]["b50_num"] is None and out["g1"]["b50_den"] == 2
    # g2 has both populated
    assert out["g2"]["n_a"] == 1 and out["g2"]["n_b"] == 4
