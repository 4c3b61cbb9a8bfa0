"""One-row engine-probe queries: a discrimination instrument for the
driver's oracle environment.

Why these exist: ``psi_drift`` and ``token_budget_sample`` hash-failed
in driver rounds 4 AND 5 while reproducing bit-exact against DuckDB
1.0.0 in this sandbox — two rounds of float discipline aimed blind at
a divergence that is not locally observable. The only channel that
round-trips through the driver's actual oracle stack is the registry
itself, so these probes use it: each emits ONE constant row whose
value isolates exactly one cross-engine behavior. rows/schema match
trivially; the per-probe ``hash_match`` bit in CORRECTNESS_r06 then
*identifies* the divergence class definitively:

- ``probe_bigint_control``  BIGINT constant. Fails => the divergence
  is harness plumbing, not numerics (nothing else is interpretable).
- ``probe_double_canon``    0.1 + 0.2 (exactly 0.30000000000000004 on
  every IEEE-754 engine; no libm, no rounding). Fails => the driver's
  value-hash canonicalizes DOUBLE columns differently per engine
  (formatting / struct packing), and NO float discipline can ever
  pass — integer-only output schemas are the only fix.
- ``probe_double_17sig``    a 17-significant-digit double literal.
  Fails (canon passes) => string->double parsing differs between the
  engines' SQL readers. NOTE the oracle must spell it
  CAST('<digits>' AS DOUBLE): a bare DuckDB literal parses as
  DECIMAL(17,17) first and the DECIMAL->DOUBLE cast is NOT correctly
  rounded (measured locally: one ulp high on this literal, where
  Spark, CPython and DuckDB's own string cast all agree on the
  correctly-rounded double).
- ``probe_ln2``             ln(2.0) at full precision. Fails (canon
  passes) => Java Math.log vs the oracle's libm disagree in the last
  ulp => pre-rounding transcendental outputs to a coarse grid is
  load-bearing, keep it everywhere.
- ``probe_round_half5``     round(0.1234565, 6): the double's exact
  expansion is 0.12345649999... but its shortest repr is .1234565, so
  HALF_UP-on-shortest (Spark, DuckDB 1.0.0) gives 0.123457 while
  round-on-exact-expansion gives 0.123456. Fails => the driver's
  DuckDB build rounds the exact expansion => never use decimal
  ``round`` on doubles in registry output (the repo already doesn't;
  this proves the rule is necessary, not cargo cult).
- ``probe_exact_round_half5`` the repo's portable floor(x*1e6+0.5)/1e6
  on the same literal. Should match on ANY IEEE engine; fails only if
  probe_double_canon also fails (same canonicalization class).
- ``probe_regexp_split``    whitespace-regexp token count of
  ' a  b\\tc ' (= 3). Fails => regexp semantics differ, implicating
  every tokenizer-derived count.

The probes are honest registry entries (real Spark plans, real
oracles); they cost one row each and ride the tier-1 never-checked
slot of the adjudication order right behind the two re-fixed queries.

R06 VERDICT (driver-adjudicated, CORRECTNESS_r06 — the instrument's
outcome, recorded here so it is self-contained): ALL SEVEN probes came
back hash-GREEN while psi_drift + token_budget_sample hash-failed a
third time with BIGINT-only schemas. Decision table readout:
- double canonicalization, 17-digit literal parsing, ln(2), HALF_UP
  rounding on shortest-repr, portable exact_round, and whitespace
  regexp splitting are all IDENTICAL in the driver's two engines;
- probe_round_half5 green CLEARS the ~35 deferred decimal-round gate
  sites repo-wide — do NOT convert them (a prior round nearly did);
- therefore the chronic divergence had to be data- or type-dependent:
  something the one-row constant probes structurally cannot carry.

R07 ROOT CAUSE (found by auditing every oracle's DuckDB OUTPUT types,
not its arithmetic): of 213 oracles, exactly the two chronic failers
emitted HUGEINT columns (un-cast sum()/windowed sum() over BIGINT).
DuckDB's pandas fetch renders HUGEINT as float64 and its Arrow fetch
as decimal128 — so the driver hashed 123.0 / Decimal(123) against
Spark's int64 123: rows match, name-based schema matches, value hash
fails, and every arithmetic fix is powerless because the VALUES were
always equal. fetchall() (this sandbox's path) yields Python ints,
which is why three rounds of local sweeps were bit-exact. Fixes:
CAST ... AS BIGINT on those columns; a carrier-type guard in
tests/oracle_harness.py now bans HUGEINT/UHUGEINT/DECIMAL oracle
outputs registry-wide.

R07 DECOMPOSITION PROBES (registered below, per the r06 verdict's
item 2 — cheap insurance should the carrier-type fix not adjudicate
green, and a bisection instrument either way). All are one-row BIGINT
aggregates over the REAL fixtures (data-dependent, unlike the r06
constants):
- ``probe_decimal_literal_div``/``..._div15`` bare DECIMAL literals on
  the oracle side (the one arithmetic class the r06 probes never
  covered: DuckDB types bigint+0.5 as DECIMAL(21,1) and its
  DECIMAL division/widening rules are version-mobile). Fails =>
  every oracle must spell literals CAST('x' AS DOUBLE)
  (sql_double); the chronic oracles already do as of r07.
- ``probe_psi_cells``      cell-keyed checksum of psi's (event_type,
  bin, n_ref, n_cur) histogram. Fails => the binning floor/least
  arithmetic diverges on real doubles.
- ``probe_psi_ln_terms``   cell-keyed sum of 1e-6-quantized LIBM
  ln(p_cur/p_ref) — the only remaining transcendental class
  (probe_ln2 pinned only ln(2)). Fails => every data-dependent
  F.log feeding a registry hash must use precision.pinned_ln
  (psi_drift already does as of r07; bm25/source_divergence/
  survival_curve would need the same).
- ``probe_token_total``    doc-keyed sum of whitespace-token counts
  over the real corpus. Fails => regexp tokenization diverges on
  real text (fixture is printable-ASCII-only, so this would be an
  engine regexp change, not a char-class edge).
- ``probe_quality_ppm_sum`` doc-keyed sum of the exact quality_ppm
  expression token_budget_sample ranks by, without the window.
  Fails while probe_token_total passes => the quality arithmetic;
  passes while token_budget_sample fails => the window/filter stage.

R07 ADJUDICATION (CORRECTNESS_r07 — the program's close-out): all SIX
decomposition probes came back hash-GREEN on first stamp, alongside
psi_drift and token_budget_sample themselves (green after three red
rounds) — the HUGEINT carrier root cause is CONFIRMED, and the probe
decision table settles the standing deferrals:
- ``probe_decimal_literal_div``/``_div15`` GREEN => the ~20
  hand-inlined bare-decimal-literal money oracles are safe AS-IS; the
  100-site sql_double rewrite is cancelled.
- ``probe_psi_ln_terms`` GREEN => libm ln agrees between the driver's
  engines on real fixture arguments; bm25 / source_divergence /
  survival_curve KEEP F.log (precision.pinned_ln stays in psi_drift
  only, as defense-in-depth).
- ``probe_psi_cells``/``probe_token_total``/``probe_quality_ppm_sum``
  GREEN => binning, tokenization and quality arithmetic all match on
  real data; no further decomposition needed.

R08 RETIREMENT: with every class adjudicated green, the 7 CONSTANT r06
probes moved out of the registry into RETIRED_QUERIES/RETIRED_ORACLES
(pytest-only parity via tests/test_probes_retired.py) — 13 probe rows
were consuming ~26% of the driver's ~50-slot round window. The 6
data-dependent probes remain registered as canaries: they exercise the
driver's engines on REAL fixture data every few rounds, which a local
pytest cannot (the r04–r07 lesson is precisely that this sandbox's
DuckDB fetch path can differ from the driver's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _one_row(spark: SparkSession, col) -> DataFrame:
    return spark.range(1).select(col.alias("v"))


def q_probe_bigint_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(spark, F.lit(1234567890123456789).cast("long"))


def q_probe_double_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(spark, F.lit(0.1) + F.lit(0.2))


def q_probe_double_17sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(spark, F.lit(0.12345678901234567))


def q_probe_ln2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(spark, F.log(F.lit(2.0)))


def q_probe_round_half5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(spark, F.round(F.lit(0.1234565), 6))


def q_probe_exact_round_half5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(
        spark, F.floor(F.lit(0.1234565) * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    )


def q_probe_regexp_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(
        spark, F.size(F.split(F.trim(F.lit(" a  b\tc ")), r"\s+")).cast("int")
    )


# --- r07 data-dependent decomposition probes --------------------------
#
# Shared cell/doc "key" trick: multiplying each partial by a small
# md5-derived key (mod 9973, so products stay far inside int64 at
# every fixture SF) makes the one-row sum sensitive to WHICH cell/doc
# carried a value, not just the total — compensating errors across
# rows can't cancel. md5 is the one hash both engines share; the
# UBIGINT hex cast twin below is the registry-wide established
# pattern (queries/sampling.py).
#
# SCALE BOUND on the keyed checksums (same class as cent_sum /
# money_sum's documented bound): the Spark side accumulates
# key * weight in non-ANSI int64, which wraps silently, while the
# DuckDB twin accumulates HUGEINT exactly before the final BIGINT
# cast — so the probes are carrier-equal only while the TRUE sum fits
# int64. Worst cell term is ~_KEY_MOD * 1000003 * n_cell ≈ 1e10 *
# n_cell; the fixtures adjudicate at sf0.01 (n ≈ 1e4-1e5 rows,
# sum ≈ 1e15-1e16) and stay safe through sf1 (~1e17) but NOT to
# arbitrary SF (int64 max ≈ 9.2e18). These are adjudication-scale
# diagnostic instruments, not data operators; if a probe is ever run
# at a larger fixture, shrink the 1000003 multiplier or mod the
# per-term product by a prime ON BOTH SIDES before summing.

_KEY_MOD = 9973


def _md5_key(col) -> "F.Column":
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % _KEY_MOD
    )


def _sql_md5_key(expr: str) -> str:
    return (
        f"(CAST(CAST(('0x' || substr(md5({expr}), 1, 8)) AS UBIGINT)"
        f" AS BIGINT) % {_KEY_MOD})"
    )


def q_probe_decimal_literal_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(
        spark,
        F.floor(
            ((F.lit(5) + F.lit(0.5)) / (F.lit(7) + F.lit(0.5) * F.lit(3)))
            * F.lit(1000000000.0)
            + F.lit(0.5)
        ).cast("long"),
    )


def q_probe_decimal_literal_div15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _one_row(
        spark,
        F.floor(
            ((F.lit(5) + F.lit(0.5)) / (F.lit(7) + F.lit(0.5) * F.lit(3)))
            * F.lit(1000000000000000.0)
            + F.lit(0.5)
        ).cast("long"),
    )


def q_probe_psi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osarchiver_spark.queries.events_analytics import psi_probs

    cells = psi_probs(spark, sf_dir)
    key = _md5_key(
        F.concat_ws(":", F.col("event_type"), F.col("bin").cast("string"))
    )
    return cells.agg(
        F.sum(key * (F.col("n_ref") * F.lit(1000003) + F.col("n_cur")))
        .cast("long")
        .alias("v")
    )


def q_probe_psi_ln_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DELIBERATELY F.log (libm), not precision.pinned_ln: this probe
    # measures whether Java Math.log and the driver's libm agree at
    # the psi pipeline's real data-dependent arguments after the
    # 1e-6 quantize — the class that stays in play for bm25 idf,
    # source_divergence and survival_curve (all currently green).
    from osarchiver_spark.functions.precision import quantize
    from osarchiver_spark.queries.events_analytics import psi_probs

    cells = psi_probs(spark, sf_dir)
    key = _md5_key(
        F.concat_ws(":", F.col("event_type"), F.col("bin").cast("string"))
    )
    lnq = quantize(F.log(F.col("p_cur") / F.col("p_ref")), 6)
    return cells.agg(F.sum(key * lnq).cast("long").alias("v"))


def q_probe_token_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osarchiver_spark.functions.text import token_count
    from osarchiver_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id") % _KEY_MOD + F.lit(1)
    return docs.agg(
        F.sum(key * token_count(F.col("text")).cast("long"))
        .cast("long")
        .alias("v")
    )


def q_probe_quality_ppm_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osarchiver_spark.queries.sampling import quality_ppm_col
    from osarchiver_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id") % _KEY_MOD + F.lit(1)
    return docs.agg(F.sum(key * quality_ppm_col()).cast("long").alias("v"))


# The 6 DATA-DEPENDENT r07 probes stay registered: they are live
# canaries for the arithmetic classes (decimal literals, libm ln on
# real arguments, regexp tokenization on the real corpus, the quality
# arithmetic) that a driver-side engine upgrade could silently move.
QUERIES = {
    "probe_decimal_literal_div": q_probe_decimal_literal_div,
    "probe_decimal_literal_div15": q_probe_decimal_literal_div15,
    "probe_psi_cells": q_probe_psi_cells,
    "probe_psi_ln_terms": q_probe_psi_ln_terms,
    "probe_token_total": q_probe_token_total,
    "probe_quality_ppm_sum": q_probe_quality_ppm_sum,
}

# The 7 CONSTANT r06 probes are RETIRED from the registry (r08): their
# question — does the driver's oracle stack canonicalize constants the
# same way this sandbox's DuckDB does — was answered GREEN in r06 and
# is a property of literals, not of fixture data, so a local pytest
# re-asks it just as faithfully (tests/test_probes_retired.py) without
# spending 7 of the ~50 per-round adjudication slots real operators
# need. The functions and oracles stay here, text-identical to what
# the driver stamped, so the instrument can be re-registered in one
# line if a driver engine upgrade ever flips the local canary.
RETIRED_QUERIES = {
    "probe_bigint_control": q_probe_bigint_control,
    "probe_double_canon": q_probe_double_canon,
    "probe_double_17sig": q_probe_double_17sig,
    "probe_ln2": q_probe_ln2,
    "probe_round_half5": q_probe_round_half5,
    "probe_exact_round_half5": q_probe_exact_round_half5,
    "probe_regexp_split": q_probe_regexp_split,
}

RETIRED_ORACLES = {
    "probe_bigint_control": "SELECT CAST(1234567890123456789 AS BIGINT) AS v",
    "probe_double_canon": (
        "SELECT CAST('0.1' AS DOUBLE) + CAST('0.2' AS DOUBLE) AS v"
    ),
    "probe_double_17sig": "SELECT CAST('0.12345678901234567' AS DOUBLE) AS v",
    "probe_ln2": "SELECT ln(2.0) AS v",
    "probe_round_half5": "SELECT round(CAST('0.1234565' AS DOUBLE), 6) AS v",
    "probe_exact_round_half5": (
        "SELECT floor(CAST('0.1234565' AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS v"
    ),
    "probe_regexp_split": (
        "SELECT CAST(len(regexp_split_to_array("
        "trim(' a  b' || chr(9) || 'c '), '\\s+')) AS INT) AS v"
    ),
}

ORACLES: dict[str, str] = {}


def _decomposition_oracles() -> dict[str, str]:
    # local import: events_analytics/sampling are earlier in the
    # registry load order, so this is cycle-free and keeps the probe
    # SQL textually identical to the chronic queries' own stages.
    from osarchiver_spark.functions.precision import sql_quantize
    from osarchiver_spark.queries.events_analytics import PSI_PROBS_SQL_CTES
    from osarchiver_spark.queries.sampling import (
        _SQL_TOKS_RAW,
        SQL_DOCS_TOKENIZED,
        SQL_QUALITY_PPM,
    )

    # concat_ws on BOTH sides: Spark's concat_ws skips NULL args while
    # SQL || propagates NULL through md5 and silently drops the cell
    # from the sum — a latent cross-engine key divergence should a
    # future fixture carry a NULL event_type (none do today)
    cell_key = _sql_md5_key("concat_ws(':', event_type, CAST(bin AS VARCHAR))")
    doc_key = f"(doc_id % {_KEY_MOD} + 1)"
    return {
        # bare DECIMAL literals on purpose — the class under test
        "probe_decimal_literal_div": (
            "SELECT CAST(floor(((5 + 0.5) / (7 + 0.5 * 3))"
            " * 1000000000.0 + 0.5) AS BIGINT) AS v"
        ),
        "probe_decimal_literal_div15": (
            "SELECT CAST(floor(((5 + 0.5) / (7 + 0.5 * 3))"
            " * 1000000000000000.0 + 0.5) AS BIGINT) AS v"
        ),
        "probe_psi_cells": f"""
            WITH {PSI_PROBS_SQL_CTES}
            SELECT CAST(sum({cell_key} * (n_ref * 1000003 + n_cur))
                        AS BIGINT) AS v
            FROM probs
        """,
        "probe_psi_ln_terms": f"""
            WITH {PSI_PROBS_SQL_CTES}
            SELECT CAST(sum({cell_key}
                            * {sql_quantize('ln(p_cur / p_ref)', 6)})
                        AS BIGINT) AS v
            FROM probs
        """,
        "probe_token_total": f"""
            SELECT CAST(sum((doc_id % {_KEY_MOD} + 1)
                            * CAST(len({_SQL_TOKS_RAW}) AS BIGINT))
                        AS BIGINT) AS v
            FROM documents
        """,
        "probe_quality_ppm_sum": f"""
            SELECT CAST(sum({doc_key} * {SQL_QUALITY_PPM}) AS BIGINT) AS v
            FROM {SQL_DOCS_TOKENIZED}
        """,
    }


ORACLES.update(_decomposition_oracles())
