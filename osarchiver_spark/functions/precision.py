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


def quantize(col: Column, ndigits: int) -> Column:
    """Quantize a double onto an integer grid (bigint) so downstream
    sums are exact integer arithmetic — accumulation-order-proof."""
    scale = float(10**ndigits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def cent_sum(col: Column) -> Column:
    """Exact SUM of a 2-decimal (cents-valued) double column: quantize
    each row to bigint cents (exact — the fixture's ``value`` is
    generated at 2 dp, so floor(v*100+0.5) recovers the integer cents
    with zero error), sum the integers (order-proof), divide once by
    100.0 (one IEEE op on the identical integer in every engine).
    Replaces ``round(sum(double), 4)``, which sums doubles in an
    engine/partitioning-dependent order before rounding."""
    return F.sum(quantize(col, 2)) / F.lit(100.0)


def sql_cent_sum(expr: str) -> str:
    """DuckDB twin of :func:`cent_sum` (aggregate form)."""
    return f"(sum(CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)) / 100.0)"


def money_sum(col: Column, in_digits: int, out_digits: int) -> Column:
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
    meaningless and the half-offset arithmetic assumes it)."""
    if in_digits < out_digits:
        raise ValueError("money_sum requires in_digits >= out_digits")
    q = quantize(col, in_digits)
    out_scale = float(10**out_digits)
    if in_digits == out_digits:
        return F.sum(q) / F.lit(out_scale)
    div = 10 ** (in_digits - out_digits)
    return F.floor((F.sum(q) + F.lit(div // 2)) / F.lit(div)) / F.lit(out_scale)


def sql_money_sum(expr: str, in_digits: int, out_digits: int) -> str:
    """DuckDB twin of :func:`money_sum`."""
    if in_digits < out_digits:
        raise ValueError("sql_money_sum requires in_digits >= out_digits")
    in_scale = float(10**in_digits)
    out_scale = float(10**out_digits)
    q = f"CAST(floor(({expr}) * {in_scale} + 0.5) AS BIGINT)"
    if in_digits == out_digits:
        return f"(sum({q}) / {out_scale})"
    div = 10 ** (in_digits - out_digits)
    return f"(floor((sum({q}) + {div // 2}) / {div}) / {out_scale})"


def sql_exact_round(expr: str, ndigits: int) -> str:
    """DuckDB twin of :func:`exact_round` for oracle SQL strings."""
    scale = float(10**ndigits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def sql_quantize(expr: str, ndigits: int) -> str:
    """DuckDB twin of :func:`quantize`."""
    scale = float(10**ndigits)
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"
