"""Cross-engine-exact fixed-point rounding helpers.

Why this module exists: ``round(double, n)`` is NOT portable across
engines at ``.xxx5`` decimal boundaries. Spark rounds the SHORTEST
decimal representation of the double with HALF_UP; DuckDB rounds the
EXACT binary expansion — so a value whose shortest repr is exactly
``0.1234565`` rounds to ``0.123457`` in Spark but ``0.123456`` in
DuckDB (its exact expansion is ``0.12345649999...``). That one-ulp
disagreement is invisible to row/schema checks and flips a value-hash
comparison (observed on ``psi_drift`` and ``token_budget_sample`` in
driver round 4).

The portable alternative used here is ``floor(x * 10^n + 0.5) / 10^n``:
multiply, add, floor, divide are all IEEE-754 operations that every
engine executes identically on identical inputs — there is no decimal
string anywhere, so there is nothing to disagree about. For
non-negative inputs this equals round-half-up; for negative inputs it
rounds halves toward +inf (still engine-identical, just a different
tie convention — callers with signed data should note it).

For cross-partition SUMs of doubles the quantization must happen
BEFORE the sum (parallel accumulation order differs per engine/run):
quantize each term to a bigint grid with :func:`quantize`, sum the
exact integers, then rescale. See ``queries/ml.py`` /
``target_encode_loo`` for the original statement of this discipline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_round(col: Column, ndigits: int) -> Column:
    """``floor(x*10^n + 0.5)/10^n`` — portable fixed-point rounding.

    Engine-identical wherever the input doubles are engine-identical
    (i.e. the input is a fixed-order, row-local IEEE expression over
    identical operands — NOT an unordered double sum; quantize before
    summing in that case, see :func:`quantize`).
    """
    scale = float(10**ndigits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def round_half_up_py(x: float, ndigits: int) -> float:
    """Driver-side replica of Spark's ``F.round`` on DoubleType.

    Spark rounds the SHORTEST decimal representation of the double
    with HALF_UP (``BigDecimal.valueOf`` goes through
    ``Double.toString``); Python's ``repr`` produces the same shortest
    round-trip string, so ``Decimal(repr(x))`` + ``ROUND_HALF_UP``
    reproduces Spark's result bit-for-bit. Used by the driver-side
    trainer loops (operators/boost.py) whose per-round quantization
    was previously an ``F.round`` over the distributed relation — the
    collapse to model-sized sufficient statistics must keep the exact
    rounding semantics or the declared query outputs would drift."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-ndigits), rounding=ROUND_HALF_UP
        )
    )


def quantize(col: Column, ndigits: int) -> Column:
    """Quantize a double onto an integer grid (bigint) so downstream
    sums are exact integer arithmetic — accumulation-order-proof."""
    scale = float(10**ndigits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def cent_sum(col: Column, exact: bool = False) -> Column:
    """Exact SUM of a 2-decimal (cents-valued) double column: quantize
    each row to bigint cents (exact — the fixture's ``value`` is
    generated at 2 dp, so floor(v*100+0.5) recovers the integer cents
    with zero error), sum the integers (order-proof), divide once by
    100.0 (one IEEE op on the identical integer in every engine).
    Replaces ``round(sum(double), 4)``, which sums doubles in an
    engine/partitioning-dependent order before rounding.

    OVERFLOW BOUND (r06 ADVICE): the default long sum wraps silently
    past 2^63−1 under non-ANSI mode, while the DuckDB twin sums into
    HUGEINT — the engines would silently diverge. Safe iff
    rows_per_group × max_abs_cents < 9.2e18 (e.g. 9×10^11 rows of
    10^7-cent values). Pass ``exact=True`` beyond that bound: sums
    as decimal(38,0) (no wrap; ~3× slower agg, measured 0.55 s vs
    1.74 s over 60M cached rows on local[16]) and converts once to
    double — both engines' integer→double casts are correctly
    rounded, so the result stays engine-identical (past 2^53 cents
    the cast rounds, identically on both sides; no floor follows, so
    no further ceiling applies).
    """
    q = quantize(col, 2)
    if exact:
        return F.sum(q.cast("decimal(38,0)")).cast("double") / F.lit(100.0)
    return F.sum(q) / F.lit(100.0)


def sql_cent_sum(expr: str) -> str:
    """DuckDB twin of :func:`cent_sum` (either mode: DuckDB's sum
    already accumulates HUGEINT, and CAST-to-DOUBLE-then-divide equals
    the bare HUGEINT/DOUBLE division on every value — both are one
    correctly-rounded int→double conversion and one IEEE divide)."""
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {sql_double('100')}"
        f" + {sql_double('0.5')}) AS BIGINT)) AS DOUBLE) / {sql_double('100')})"
    )


def money_sum(
    col: Column, in_digits: int, out_digits: int, exact: bool = False
) -> Column:
    """Exact SUM of a fixed-decimal money expression: quantize each
    row onto its INTRINSIC decimal grid (2 dp for a price, 4 dp for
    price*(1-disc), 6 dp for price*(1-disc)*(1+tax) — exact, because
    the fixture's money columns are generated at 2 dp), sum the
    bigints (order-proof), then rescale to ``out_digits``. The
    replacement for ``round(sum(money_double), out_digits)`` — the
    exact shape that flipped Q9's cents boundary between engines at
    sf0.1 (288b3fa).

    The rescale divisions are IEEE double ops, not integer ops — past
    2^53 they round — but both engines divide the SAME exact integer
    by the same power of ten, so the result stays engine-identical at
    any magnitude; what the bigint sum buys is independence from
    accumulation order. Requires ``in_digits >= out_digits`` (coarser
    output only — refining a sum's grid after the fact is
    meaningless and the half-offset arithmetic assumes it).

    OVERFLOW BOUND (r06 ADVICE): the default long sum wraps silently
    past 2^63−1 (non-ANSI), while the DuckDB twin sums HUGEINT. Safe
    iff rows_per_group × max_abs_value × 10^in_digits < 9.2e18 — at
    in_digits=6 and ~1e5-magnitude money values that is ~10^8 rows
    per group; the TPC-H fixtures sit orders below it, but a 100 TB
    deployment aggregating to few groups should pass ``exact=True``
    (decimal(38,0) accumulator, ~3× slower agg). What exact buys is
    freedom from the accumulator's silent int64 WRAP; the rescale
    path has its own (much higher) ceilings: past 2^53 the
    int→double cast rounds — identically in both engines, so
    cross-engine identity holds but the floor boundary is the
    double's, not the integer's — and Spark's floor-of-double
    returns LongType, which saturates at 2^63 where DuckDB's floor
    stays DOUBLE, so engine identity holds only while the FLOORED
    quotient < 2^63 (sum < 2^63 × 10^(in-out); at in=6/out=2 that is
    money totals below ~9.2e16 — far past any physical ledger, but a
    bound, not "any magnitude")."""
    if in_digits < out_digits:
        raise ValueError("money_sum requires in_digits >= out_digits")
    q = quantize(col, in_digits)
    if exact:
        s: Column = F.sum(q.cast("decimal(38,0)"))
    else:
        s = F.sum(q)
    out_scale = float(10**out_digits)
    if in_digits == out_digits:
        return s.cast("double") / F.lit(out_scale)
    div = 10 ** (in_digits - out_digits)
    # the half-offset add stays in the exact integer domain (long or
    # decimal); the division is double, so past 2^53 the floor
    # boundary is the double's — approximate vs the true integer
    # quotient but IDENTICAL in both engines (same correctly-rounded
    # cast, same IEEE divide); see the docstring for the 2^63
    # floor-saturation ceiling on engine identity
    return (
        F.floor((s + F.lit(div // 2)).cast("double") / F.lit(float(div)))
        / F.lit(out_scale)
    )


def sql_money_sum(expr: str, in_digits: int, out_digits: int) -> str:
    """DuckDB twin of :func:`money_sum` (either mode — DuckDB's sum
    is HUGEINT already; the explicit CAST-to-DOUBLE mirrors the Spark
    side op-for-op and removes the version-mobile HUGEINT-op-DECIMAL
    literal shapes)."""
    if in_digits < out_digits:
        raise ValueError("sql_money_sum requires in_digits >= out_digits")
    in_scale = 10**in_digits
    out_scale = 10**out_digits
    q = (
        f"CAST(floor(({expr}) * {sql_double(str(in_scale))}"
        f" + {sql_double('0.5')}) AS BIGINT)"
    )
    if in_digits == out_digits:
        return f"(CAST(sum({q}) AS DOUBLE) / {sql_double(str(out_scale))})"
    div = 10 ** (in_digits - out_digits)
    return (
        f"(floor(CAST(sum({q}) + {div // 2} AS DOUBLE)"
        f" / {sql_double(str(div))}) / {sql_double(str(out_scale))})"
    )


def sql_double(lit: str) -> str:
    """A DOUBLE literal for oracle SQL, spelled the only version-stable
    way: ``CAST('<digits>' AS DOUBLE)``.

    Why not a bare ``0.5``: DuckDB types bare decimal literals as
    DECIMAL — ``typeof(bigint + 0.5)`` is ``DECIMAL(21,1)`` — and
    DECIMAL inference/division/widening rules are version-mobile
    across DuckDB releases (1.0.0 lowers DECIMAL/DECIMAL division to
    DOUBLE; later builds keep it DECIMAL at an engine-chosen scale).
    The driver-r06 probe campaign proved the string→DOUBLE parse is
    correctly rounded and identical in both engines
    (``probe_double_17sig`` green), so this spelling pins the whole
    expression onto the pure-DOUBLE path the probes verified; a bare
    literal re-opens the one arithmetic class the probes never
    covered (the r06 verdict's top remaining suspect for the
    psi_drift / token_budget_sample chronic hash-fails).
    """
    return f"CAST('{lit}' AS DOUBLE)"


def sql_exact_round(expr: str, ndigits: int) -> str:
    """DuckDB twin of :func:`exact_round` for oracle SQL strings."""
    scale = 10**ndigits
    return (
        f"floor(({expr}) * {sql_double(str(scale))} + {sql_double('0.5')})"
        f" / {sql_double(str(scale))}"
    )


def sql_quantize(expr: str, ndigits: int) -> str:
    """DuckDB twin of :func:`quantize`."""
    scale = 10**ndigits
    return (
        f"CAST(floor(({expr}) * {sql_double(str(scale))}"
        f" + {sql_double('0.5')}) AS BIGINT)"
    )


# --- engine-pinned natural log ---------------------------------------
#
# ``F.log`` (Java Math.log) and DuckDB's libm ``ln`` are NOT required
# to agree in the last ulp at arbitrary arguments — probe_ln2 (r06,
# green) pinned only ln(2). When a registry hash depends on a
# data-dependent ln, a 1-ulp libm disagreement can straddle a quantize
# boundary and flip the hash deterministically. The fix is structural:
# compute ln from IEEE-pinned primitives only. sqrt, +, −, ×, ÷ are
# all correctly rounded on every IEEE-754 engine, so any FIXED
# composition of them is bit-identical across engines by construction.
#
# Scheme: range-reduce with k repeated sqrts, y = x^(1/2^k), then the
# 3-term atanh series  ln y ≈ 2 z (1 + z²(1/3 + z²·1/5)),
# z = (y−1)/(y+1), and rescale:  ln x = 2^k · ln y.
# With k = 16 and |ln x| ≤ 20 (x ∈ [2e-9, 5e8]): |ln y| ≤ 3.1e-4,
# |z| ≤ 1.6e-4, series truncation ~ z⁷/7 ≈ 1e-27 relative-to-z, and
# the dominant error is sqrt rounding, ~16·0.5 ulp amplified by 2^16:
# ≈ 1e-10 ABSOLUTE on ln x. That is 4 orders below the 1e-6 grid every
# registry consumer quantizes onto — accurate enough to stay a real
# logarithm, and (unlike libm) identical in both engines bit-for-bit.

PINNED_LN_SQRTS = 16
_PINNED_LN_SCALE = float(2 * 2**PINNED_LN_SQRTS)  # 131072.0, exact
_LN_C3 = "0.3333333333333333"  # nearest double to 1/3 (17 sig digits)
_LN_C5 = "0.2"  # parses to the nearest double to 1/5 in both engines


def pinned_ln(col: Column) -> Column:
    """ln(col) from IEEE-pinned ops only (col must be > 0).

    Bit-identical to :func:`sql_pinned_ln` on any IEEE-754 engine —
    use the pair whenever a registry hash depends on a
    data-dependent logarithm (psi_drift was the motivating case:
    three rounds of driver hash-fails with libm ln in the loop).
    """
    y = col
    for _ in range(PINNED_LN_SQRTS):
        y = F.sqrt(y)
    z = (y - F.lit(1.0)) / (y + F.lit(1.0))
    z2 = z * z
    series = z * (
        F.lit(1.0) + z2 * (F.lit(float(_LN_C3)) + z2 * F.lit(float(_LN_C5)))
    )
    return F.lit(_PINNED_LN_SCALE) * series


def sql_pinned_ln_tower(expr: str) -> str:
    """The y stage of pinned-ln: the 16-deep nested-sqrt tower.

    Bind the result to a named column (one CTE) and feed that name to
    :func:`sql_pinned_ln_z`, then that to :func:`sql_pinned_ln_series`,
    to evaluate the tower once instead of the ~10 textual copies the
    one-shot :func:`sql_pinned_ln` expansion produces.
    """
    y = expr
    for _ in range(PINNED_LN_SQRTS):
        y = f"sqrt({y})"
    return y


def sql_pinned_ln_z(y: str) -> str:
    """The z = (y-1)/(y+1) stage, given the (named) tower column."""
    one = sql_double("1")
    return f"((({y}) - {one}) / (({y}) + {one}))"


def sql_pinned_ln_series(z: str) -> str:
    """The final atanh-series stage, given the (named) z column."""
    one = sql_double("1")
    series = (
        f"({z} * ({one} + ({z} * {z}) * ({sql_double(_LN_C3)}"
        f" + ({z} * {z}) * {sql_double(_LN_C5)})))"
    )
    return f"({sql_double(str(int(_PINNED_LN_SCALE)))} * {series})"


def sql_pinned_ln(expr: str) -> str:
    """DuckDB twin of :func:`pinned_ln` — same ops, same order.

    One-shot textual expansion: value-safe (pure deterministic
    expressions) but the sqrt tower is duplicated ~10x through z and
    the series. Oracles embedding it should instead stage the three
    parts (:func:`sql_pinned_ln_tower` / :func:`sql_pinned_ln_z` /
    :func:`sql_pinned_ln_series`) through named CTE columns — same
    ops on the same values, so bit-identical, and the SQL stays
    readable (see the psi_drift oracle).
    """
    return sql_pinned_ln_series(sql_pinned_ln_z(sql_pinned_ln_tower(expr)))
