"""Property-based differential tests (hypothesis) for the pure-Python
plan-level logic: retention cutoff arithmetic is checked example-by-
example against DuckDB's own INTERVAL subtraction (the same engine the
oracles run on), and FK toposort ordering invariants are checked on
random forests. These run without a SparkSession, so hundreds of
examples cost milliseconds."""

from __future__ import annotations

from datetime import datetime

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from osarchiver_spark.operators.retention import Retention, retention_cutoff
from osarchiver_spark.plans.jobspec import TableSpec
from osarchiver_spark.plans.toposort import sort_tables, table_generations

_TS = st.datetimes(min_value=datetime(1970, 1, 2), max_value=datetime(2100, 1, 1)).map(
    lambda d: d.replace(microsecond=0)
)


def _duck_cutoff(now: datetime, n: int, unit: str) -> datetime:
    (row,) = duckdb.sql(
        f"SELECT TIMESTAMP '{now:%Y-%m-%d %H:%M:%S}' - INTERVAL {n} {unit}"
    ).fetchall()
    return row[0]


@settings(max_examples=200, deadline=None)
@given(now=_TS, n=st.integers(0, 240), unit=st.sampled_from(["MONTH", "YEAR"]))
def test_month_year_cutoff_matches_duckdb(now, n, unit):
    # MySQL SUBDATE and DuckDB both clamp to the target month's last
    # day (Mar 31 - 1 MONTH = Feb 28/29) — the engine must agree with
    # the oracle engine on every input, not just fixture dates
    assert retention_cutoff(now, Retention(n, unit)) == _duck_cutoff(now, n, unit)


@settings(max_examples=200, deadline=None)
@given(
    now=_TS,
    n=st.integers(0, 5000),
    unit=st.sampled_from(["WEEK", "DAY", "HOUR", "MINUTE", "SECOND"]),
)
def test_sub_month_cutoff_matches_duckdb(now, n, unit):
    assert retention_cutoff(now, Retention(n, unit)) == _duck_cutoff(now, n, unit)


@st.composite
def _fk_forest(draw):
    """A random FK forest: each table may reference one earlier table
    (guaranteed acyclic), plus stray FKs to undeclared tables (the
    reference tolerates those — they order as roots)."""
    n = draw(st.integers(1, 12))
    tables = []
    for i in range(n):
        fks: dict[str, tuple[str, str]] = {}
        if i > 0 and draw(st.booleans()):
            parent = draw(st.integers(0, i - 1))
            fks[f"fk_{i}"] = (f"t{parent}", "id")
        if draw(st.booleans()):
            fks[f"ext_{i}"] = ("not_in_job", "id")
        tables.append(TableSpec(name=f"t{i}", primary_key="id", foreign_keys=fks))
    return draw(st.permutations(tables)).copy()


@settings(max_examples=200, deadline=None)
@given(tables=_fk_forest())
def test_toposort_children_before_parents(tables):
    ordered = sort_tables(tables)
    assert sorted(t.name for t in ordered) == sorted(t.name for t in tables)
    pos = {t.name: i for i, t in enumerate(ordered)}
    declared = {t.name for t in tables}
    for t in tables:
        for parent, _col in t.foreign_keys.values():
            if parent in declared and parent != t.name:
                assert pos[t.name] < pos[parent], (
                    f"child {t.name} must be archived before parent {parent}"
                )


@settings(max_examples=100, deadline=None)
@given(tables=_fk_forest())
def test_generations_are_mutually_independent(tables):
    declared = {t.name for t in tables}
    for gen in table_generations(tables):
        names = {t.name for t in gen}
        for t in gen:
            for parent, _col in t.foreign_keys.values():
                if parent in declared and parent != t.name:
                    assert parent not in names, (
                        "a generation must never contain a child with its parent"
                    )


@settings(max_examples=12, deadline=None)
@given(
    passage_len=st.integers(110, 240),
    prefix_len=st.integers(0, 120),
    seed=st.integers(0, 10_000),
)
def test_span_dedup_always_finds_long_planted_passages(
    spark, passage_len, prefix_len, seed
):
    """Recall guarantee of the WINNOWED span dedup: selection is
    content-defined (forward-window minimum of the anchor hash), so
    both copies of a shared passage select the same relative
    positions regardless of each copy's offset, and any passage of
    length >= window + 2*stride + 6 must be reported for both docs —
    including phase-misaligned copies, which fixed-grid striding
    provably misses."""
    import random

    from osarchiver_spark.operators.dedup import repeated_span_report

    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    passage = "".join(rng.choice(alpha) for _ in range(passage_len))
    uniq = lambda n, tag: "".join(rng.choice(alpha) for _ in range(n)) + tag
    rows = [
        (1, uniq(prefix_len, "@") + passage + uniq(40, "#")),
        (2, uniq(37, "%") + passage + uniq(11, "&")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # window=64, stride=16: guarantee kicks in at >= 102 shared chars
    out = repeated_span_report(df, "doc_id", "text", window=64, stride=16)
    docs_reported = {r.doc_id for r in out.collect()}
    assert {1, 2} <= docs_reported


def _py_greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


_SYM = st.sampled_from(["a", "b", "c", "ab", "bb"])


@settings(max_examples=150, deadline=None)
@given(
    syms=st.lists(_SYM, min_size=1, max_size=10),
    a=_SYM,
    b=_SYM,
)
def test_bpe_oracle_fold_matches_greedy_reference(syms, a, b):
    # the list_reduce fold used by the bpe_train oracle (and mirrored
    # by the Spark F.aggregate fold, equality pinned via parity) must
    # implement left-to-right greedy non-overlapping merge on EVERY
    # input, including overlapping-run and merged-symbol-collision
    # shapes a fixture corpus might never produce
    lit = "[" + ", ".join(f"'{s}'" for s in syms) + "]"
    (row,) = duckdb.sql(
        f"""
        SELECT CASE WHEN len(s) < 2 THEN s ELSE
            list_reduce(list_transform(s, x -> [x]),
                (acc, x) -> CASE WHEN acc[-1] = '{a}' AND x[1] = '{b}'
                            THEN list_append(acc[1:len(acc)-1], '{a}' || '{b}')
                            ELSE list_concat(acc, x) END)
            END
        FROM (SELECT {lit} AS s)
        """
    ).fetchall()
    assert list(row[0]) == _py_greedy_merge(syms, a, b)


def test_stratified_sample_exact_budget_and_proportionality(spark, sf_small):
    """Largest-remainder allocation: the sample hits the budget
    EXACTLY, each source's quota is within 1 of its real-valued
    proportional share (the Hamilton guarantee), and membership is the
    md5-prefix of each source."""
    from osarchiver_spark.queries.sampling import STRAT_TOTAL, q_stratified_sample_exact
    from osarchiver_spark.sources.parquet import load_table

    from pyspark.sql import functions as F

    out = q_stratified_sample_exact(spark, sf_small).collect()
    assert len(out) == STRAT_TOTAL
    docs = load_table(spark, sf_small, "documents")
    n_s = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n = sum(n_s.values())
    got_quota = {}
    for r in out:
        got_quota[r.source] = max(got_quota.get(r.source, 0), r.quota)
    taken = {}
    for r in out:
        taken[r.source] = taken.get(r.source, 0) + 1
    for src, q in got_quota.items():
        share = n_s[src] * STRAT_TOTAL / n
        assert abs(q - share) < 1.0 + 1e-9, (src, q, share)
        assert taken[src] == q  # under-subscribed fixture: quota fully taken


def test_rejection_resample_flattens_hour_histogram(spark, sf_medium):
    """The acceptance rule min_count/count_h must pull every hour's
    surviving count toward the minimum: the after-spread (max/min) is
    strictly tighter than the before-spread, and no hour gains rows."""
    from osarchiver_spark.queries.events_analytics import q_rejection_resample_hour

    rows = q_rejection_resample_hour(spark, sf_medium).collect()
    assert len(rows) == 24
    before = {r.hod: r.n_before for r in rows}
    after = {r.hod: r.n_after for r in rows}
    assert all(after[h] <= before[h] for h in before)
    spread_b = max(before.values()) / min(before.values())
    spread_a = max(after.values()) / min(after.values())
    assert spread_a < spread_b
    # the min-count hour is accepted wholesale (p = 1)
    hmin = min(before, key=lambda h: (before[h], h))
    assert after[hmin] == before[hmin]


def test_leakage_free_split_has_zero_straddles(spark, sf_small):
    """The contamination report measures what split_leakage_free
    eliminates: under the cluster-keyed split no near-dup pair
    straddles a boundary, while the naive split's report shows the
    leakage it was built to fix (on this fixture: at least one leaky
    doc, since the corpus contains near-dup clusters)."""
    from osarchiver_spark.queries.dedup import (
        BANDS, MINHASH_THRESHOLD, NUM_HASHES, minhash_lsh_pairs,
    )
    from osarchiver_spark.queries.sampling import (
        q_split_contamination_report, q_split_leakage_free,
    )
    from osarchiver_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    naive = {r.split: r.n_leaky for r in q_split_contamination_report(spark, sf_small).collect()}
    assert sum(naive.values()) > 0  # the fixture has straddling near-dups

    lf = q_split_leakage_free(spark, sf_small).select("doc_id", "split")
    docs = load_table(spark, sf_small, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS, threshold=MINHASH_THRESHOLD,
    )
    a = lf.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = lf.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    straddles = pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("sa") != F.col("sb")).count()
    assert straddles == 0


@settings(max_examples=50, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30),
    total=st.integers(min_value=1, max_value=300),
)
def test_hamilton_allocation_properties(counts, total):
    """Pure-Python mirror of the stratified_sample_exact allocation:
    quotas sum to min(total, N), each quota within 1 of the real
    proportional share, never exceeding the stratum size."""
    n = sum(counts)
    names = [f"s{i:02d}" for i in range(len(counts))]
    base = {nm: c * total // n for nm, c in zip(names, counts)}
    rem = {nm: (c * total) % n for nm, c in zip(names, counts)}
    k = total - sum(base.values())
    order = sorted(names, key=lambda nm: (-rem[nm], nm))
    quota = {
        nm: min(base[nm] + (1 if order.index(nm) < k else 0), c)
        for nm, c in zip(names, counts)
    }
    assert sum(quota.values()) == min(total, n) or total <= n and sum(quota.values()) == total
    for nm, c in zip(names, counts):
        share = c * total / n
        if quota[nm] == c:  # capped stratum: share may exceed size
            assert share >= c - 1e-9 or abs(quota[nm] - share) < 1.0 + 1e-9
        else:
            assert abs(quota[nm] - share) < 1.0 + 1e-9, (nm, quota[nm], share)
        assert quota[nm] <= c


def test_point_in_time_windows_exclude_anchor_and_future(spark, tmp_path):
    """Leakage safety of the feature/label factory: the trailing frame
    must see strictly-before events only (neither the anchor itself
    nor same-microsecond peers nor the future), and the label frame
    must start strictly after the anchor — on a hand-built timeline
    where every boundary case is pinned by construction."""
    from datetime import datetime

    from osarchiver_spark.queries.events_analytics import (
        q_label_horizon,
        q_point_in_time_features,
    )
    from pyspark.sql import types as T

    rows = [
        # user 1: purchase at T0+2d with one view before, one at the
        # same instant (peer — must NOT count), one after
        (1, 1, "view", datetime(2024, 1, 1), 10.0),
        (2, 1, "view", datetime(2024, 1, 3), 20.0),      # same instant as anchor
        (3, 1, "purchase", datetime(2024, 1, 3), 5.0),   # anchor
        (4, 1, "view", datetime(2024, 1, 4), 30.0),      # future
        # user 1: click at T0, purchase 2 days later -> label true
        (5, 1, "click", datetime(2024, 1, 1, 6), 0.0),
        # user 2: click with no purchase in 7d -> label false
        (6, 2, "click", datetime(2024, 1, 1), 0.0),
        (7, 2, "purchase", datetime(2024, 1, 20), 9.0),  # beyond horizon
    ]
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)

    feats = {r.event_id: r for r in q_point_in_time_features(spark, str(tmp_path)).collect()}
    a = feats[3]
    # only event 1 and the click (event 5) precede strictly; the
    # same-instant view (2) and the future view (4) are excluded
    assert a.n_prev_7d == 2 and a.sum_prev_7d == 10.0 and a.n_prev_purchases_7d == 0

    labels = {r.event_id: r for r in q_label_horizon(spark, str(tmp_path)).collect()}
    assert labels[5].label is True and labels[5].n_future_purchases == 1
    assert labels[6].label is False and labels[6].n_future_purchases == 0


def test_survival_curve_is_a_valid_km_estimate(spark, sf_small):
    """KM invariants on the fixture: survival starts <= 1, is
    monotone non-increasing over event times, and the risk set shrinks
    by exactly the events+censored of the preceding rows."""
    from osarchiver_spark.queries.events_analytics import q_survival_curve

    rows = sorted(
        (r.duration_h, r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in q_survival_curve(spark, sf_small).collect()
    )
    assert rows
    assert all(0.0 <= s <= 1.0 for *_, s in rows)
    assert all(a[4] >= b[4] for a, b in zip(rows, rows[1:]))
    for a, b in zip(rows, rows[1:]):
        # risk set can only shrink between consecutive event times
        assert b[1] <= a[1] - a[2] - a[3]
