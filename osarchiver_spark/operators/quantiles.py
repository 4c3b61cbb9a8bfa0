"""Exact distributed quantiles over integer-grid columns — engine-
identical by construction.

Why this exists (r07 sf1 parity sweep): ``percentile(col, q)`` /
``quantile_cont`` interpolate between two order statistics with
DOUBLE arithmetic whose operation order is engine-specific, so the
band they return can differ between Spark and another engine in the
last ulp. A query that COMPARES values against such a band
(winsorization clip flags, curriculum bucket edges) flips a boolean
for any value within an ulp of it — invisible at small fixtures,
demonstrated at sf1 (``winsorize_events``: one event sat exactly on
the p95 interpolation and the two engines disagreed on
``was_clipped``). The deeper issue is the same class as libm ``ln``
(functions/precision.py::pinned_ln): data-dependent engine arithmetic
feeding a hash.

The fix is to compute the SAME mathematical definition — linear
interpolation between order statistics, exactly what
``quantile_cont`` specifies — in EXACT INTEGER arithmetic, which is
possible whenever the column lives on an integer grid (cents-valued
money, token counts, any quantized measure):

  for q = a/b over n rows (0-indexed ranks):
      pos = (n-1)·a / b,   idx = ⌊pos⌋,   rem = (n-1)·a mod b
      quantile = v[idx] + (v[idx+1] − v[idx]) · rem/b
  ⇒  NUM = b·v[idx] + (v[idx+1] − v[idx])·rem          (exact bigint)
      quantile = NUM / b                                 (exact rational)

Comparisons against the band become pure integer comparisons
(``x <= NUM/b  ⇔  x·b <= NUM``), and the band's decimal-rounded value
is derivable as one exact-int → double cast plus one IEEE division —
both correctly rounded and identical on every IEEE-754 engine.

Scale shape: one map-combinable ``groupBy(group, value).count()``
(the value histogram — tiny for any realistically-gridded column), a
window cumsum over the HISTOGRAM (not the fact table), and a one-row-
per-group aggregate. Measured vs engine ``percentile`` at sf10
(BENCH_SF10_QUANTILES.json, 2M rows x ~10k distinct cents per group):
the exact shape costs ~2-5x — Spark's ``percentile`` is itself
histogram-based (a per-group value->count OpenHashMap in ONE
aggregation buffer, sorted at eval), so there is no throughput
crossover to win. What the exact shape buys instead: (1) cross-engine
bit-identity, the reason it exists; (2) the histogram is DISTRIBUTED
— partitioned by (group, value) across executors and spillable, while
``percentile`` concentrates each group's whole distinct-value map in
a single unspillable buffer, which at 100 TB with a pathological
value grid (distinct-per-group approaching row count) is an executor
OOM, not a slowdown. Cost bound either way: rows shuffled = distinct
(group, value) pairs; on a dense grid that degrades toward a sort of
the distinct values, never worse.

Reference semantics: linear interpolation per Hyndman & Fan type 7 —
the definition shared by Spark ``percentile``, DuckDB
``quantile_cont``, NumPy default, and PostgreSQL ``percentile_cont``.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_ratio(q) -> tuple[int, int]:
    """Quantile as an exact (numerator, denominator) pair."""
    if isinstance(q, tuple):
        a, b = q
    else:
        fr = Fraction(str(q))  # str() so 0.05 means 1/20, not its float
        a, b = fr.numerator, fr.denominator
    if not (0 <= a <= b) or b <= 0:
        raise ValueError(f"quantile must be in [0,1]: {q}")
    return int(a), int(b)


def exact_quantile_nums(
    df: DataFrame,
    group_col: str,
    int_col: str,
    quantiles: dict[str, object],
) -> DataFrame:
    """Per-group exact quantile NUMERATORS for an integer column.

    Returns one row per group with ``n`` (bigint group row count) and,
    for each ``name -> q`` in ``quantiles``: ``{name}_num`` (bigint,
    the quantile times ``{name}_den``) and a literal column
    ``{name}_den`` (the ratio denominator b). ``quantile = num / den``
    exactly; compare ``x <= quantile`` as ``x * den <= num``.

    NULL ``int_col`` rows are excluded (and excluded from ``n``) —
    matching the aggregate-quantile convention AND keeping the two
    engines identical: Spark's window ORDER BY sorts NULLS FIRST while
    DuckDB's sorts NULLS LAST, so an unfiltered NULL bucket would shift
    ``cum`` (hence rank selection) on one engine only.
    """
    df = df.filter(F.col(int_col).isNotNull())
    hist = df.groupBy(group_col, int_col).agg(F.count(F.lit(1)).alias("cnt"))
    return exact_quantile_nums_hist(hist, group_col, int_col, "cnt", quantiles)


def exact_quantile_nums_hist(
    hist: DataFrame,
    group_col: str,
    int_col: str,
    cnt_col: str,
    quantiles: dict[str, object],
) -> DataFrame:
    """:func:`exact_quantile_nums` starting from a PRE-AGGREGATED
    value histogram ``(group_col, int_col, cnt_col)`` with positive
    counts — the shape that lets several quantile reports over the
    same fact scan share ONE histogram aggregation (r11 optimization
    round: ``q_sampled_percentiles`` computes sample and full-data
    percentiles from one scan by counting both populations per value
    cell, instead of scanning + shuffling the fact table once per
    report; the shared first Exchange is deduplicated by Spark's
    exchange reuse). Zero-count cells MUST be filtered by the caller:
    the selection scans for ``cum >= idx + k`` tolerate them only
    when they are not the running maximum, so exclusion is the safe
    contract (and matches what grouping the filtered rows would have
    produced)."""
    w = W.partitionBy(group_col).orderBy(int_col)
    cums = hist.withColumn("cum", F.sum(cnt_col).over(w))
    # Group total as a whole-partition window over the SAME key: the
    # cumsum window already exchanged by group_col, so this adds zero
    # shuffles, vs the former groupBy(totals) + broadcast-join round
    # trip (same value: max over an unbounded frame == max(cum)).
    j = cums.withColumn(
        "n", F.max("cum").over(W.partitionBy(group_col))
    )

    aggs: list[Column] = [F.max("n").cast("long").alias("n")]
    for name, q in quantiles.items():
        a, b = _as_ratio(q)
        pos = (F.col("n") - 1) * F.lit(a)
        rem = pos % F.lit(b)
        # (pos - rem)/b is an exact integer, so the double division is
        # exact and the cast is the true floor — no float-boundary risk
        idx = ((pos - rem) / F.lit(b)).cast("long")
        v_lo = F.min(F.when(F.col("cum") >= idx + 1, F.col(int_col)))
        v_hi = F.min(F.when(F.col("cum") >= idx + 2, F.col(int_col)))
        num = (
            F.lit(b) * v_lo
            + (F.coalesce(v_hi, v_lo) - v_lo) * F.max(rem)
        )
        aggs.append(num.cast("long").alias(f"{name}_num"))
        aggs.append(F.lit(b).cast("long").alias(f"{name}_den"))
    return j.groupBy(group_col).agg(*aggs)


def exact_quantile_nums_multi(
    hist: DataFrame,
    group_col: str,
    int_col: str,
    specs: dict[str, tuple[str, dict[str, object]]],
) -> DataFrame:
    """Exact quantile numerators for SEVERAL count populations over
    ONE value histogram, in one window pass (r11 optimization round).

    ``hist`` holds one row per (group, value) with one count column
    per population; ``specs`` maps each count column to
    ``(n_alias, {name: q})``. All populations share the single
    (group)-partitioned value-ordered window — one shuffle and one
    sort total — instead of one scan + shuffle per population (the
    shape ``q_sampled_percentiles`` had: sample and full-data
    percentiles each re-aggregated the fact table).

    Zero-count cells of a population are provably inert: a cell with
    cnt 0 carries the same cumsum as its predecessor, so the
    ``cum >= idx + k`` selections (min over values at-or-after a
    rank) either already contain the smaller predecessor value or
    exclude the cell — ``v_lo``/``v_hi`` match the filtered
    per-population histogram exactly. A population with zero TOTAL
    count yields NULL numerators (callers drop or guard such
    groups — the two-sided join shape this replaces dropped them).
    NULL values must already be excluded from ``hist``."""
    w = W.partitionBy(group_col).orderBy(int_col)
    j = hist
    for cnt_col in specs:
        j = j.withColumn(f"_cum_{cnt_col}", F.sum(cnt_col).over(w))
    for cnt_col in specs:
        j = j.withColumn(
            f"_n_{cnt_col}",
            F.max(f"_cum_{cnt_col}").over(W.partitionBy(group_col)),
        )
    aggs: list[Column] = []
    for cnt_col, (n_alias, quantiles) in specs.items():
        cum = F.col(f"_cum_{cnt_col}")
        n = F.col(f"_n_{cnt_col}")
        aggs.append(F.max(n).cast("long").alias(n_alias))
        for name, q in quantiles.items():
            a, b = _as_ratio(q)
            pos = (n - 1) * F.lit(a)
            rem = pos % F.lit(b)
            idx = ((pos - rem) / F.lit(b)).cast("long")
            v_lo = F.min(F.when(cum >= idx + 1, F.col(int_col)))
            v_hi = F.min(F.when(cum >= idx + 2, F.col(int_col)))
            num = F.lit(b) * v_lo + (F.coalesce(v_hi, v_lo) - v_lo) * F.max(rem)
            aggs.append(num.cast("long").alias(f"{name}_num"))
            aggs.append(F.lit(b).cast("long").alias(f"{name}_den"))
    return j.groupBy(group_col).agg(*aggs)


def sql_exact_quantile_nums(
    table_sql: str,
    group_col: str,
    int_col: str,
    quantiles: dict[str, object],
) -> str:
    """DuckDB twin of :func:`exact_quantile_nums` — same integer ops.

    Returns a complete SELECT (wrap as a CTE). ``table_sql`` is a
    table name or parenthesized subquery providing ``group_col`` and
    ``int_col``. NULL ``int_col`` rows are excluded on both sides (see
    :func:`exact_quantile_nums` — engines disagree on NULL sort order).
    """
    cols = ["CAST(max(n) AS BIGINT) AS n"]
    for name, q in quantiles.items():
        a, b = _as_ratio(q)
        pos = f"((n - 1) * {a})"
        rem = f"({pos} % {b})"
        idx = f"CAST(({pos} - {rem}) / {b} AS BIGINT)"
        v_lo = f"min(CASE WHEN cum >= {idx} + 1 THEN v END)"
        v_hi = f"min(CASE WHEN cum >= {idx} + 2 THEN v END)"
        cols.append(
            f"CAST({b} * {v_lo} + (coalesce({v_hi}, {v_lo}) - {v_lo})"
            f" * max({rem}) AS BIGINT) AS {name}_num,"
            f" CAST({b} AS BIGINT) AS {name}_den"
        )
    cols_sql = ",\n           ".join(cols)
    return f"""
        SELECT {group_col}, {cols_sql}
        FROM (
            SELECT h.{group_col}, h.v, h.cum, t.n
            FROM (
                SELECT {group_col}, v,
                       sum(cnt) OVER (PARTITION BY {group_col}
                                      ORDER BY v) AS cum
                FROM (SELECT {group_col}, {int_col} AS v, count(*) AS cnt
                      FROM {table_sql}
                      WHERE {int_col} IS NOT NULL
                      GROUP BY 1, 2)) h
            JOIN (
                SELECT {group_col}, count(*) AS n
                FROM {table_sql}
                WHERE {int_col} IS NOT NULL
                GROUP BY 1) t USING ({group_col}))
        GROUP BY {group_col}
    """
