"""Accuracy tests for sketch-based operators (no SQL oracle: sketch
internals are engine-specific) and the JDBC option builder."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.queries.relational import (
    q_approx_sketches,
    q_approx_sketches_raw,
)
from osarchiver_spark.sources.jdbc import JdbcTable, jdbc_read_options
from osarchiver_spark.sources.parquet import load_table


def test_approx_distinct_within_5pct(spark, sf_small):
    got = {r.l_returnflag: r.approx_orders for r in q_approx_sketches_raw(spark, sf_small).collect()}
    li = load_table(spark, sf_small, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    for flag, n in exact.items():
        assert abs(got[flag] - n) / n < 0.05, f"{flag}: approx={got[flag]} exact={n}"


def test_percentile_approx_within_10pct(spark, sf_small):
    got = {r.l_returnflag: r.approx_p50_price for r in q_approx_sketches_raw(spark, sf_small).collect()}
    li = load_table(spark, sf_small, "lineitem")
    exact = {
        r.l_returnflag: r.p
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p"))
        .collect()
    }
    for flag, p in exact.items():
        assert abs(got[flag] - p) / p < 0.10


def test_approx_sketches_bounds_hold(spark, sf_small):
    """The registered bounded-error adjudication: every sketch lands
    inside its envelope, so the boolean columns the oracle pins to
    TRUE are true."""
    for r in q_approx_sketches(spark, sf_small).collect():
        assert r.orders_in_bound and r.p50_in_bound, r


def test_jdbc_options_build_keyset_parallel_scan():
    src = JdbcTable(url="jdbc:mysql://db:3306/nova", table="instances", primary_key="id")
    opts = jdbc_read_options(src, 0, 1_000_000, 32, where="deleted_at <= '2001-12-01'")
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "32"
    # retention predicate pushed into the database-side subquery
    assert "WHERE deleted_at <= '2001-12-01'" in opts["dbtable"]
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"


def test_kmv_estimate_within_20pct(spark, sf_medium):
    """KMV at k=32 has relative std-error ~ 1/sqrt(k-2) ~ 18%; the
    fixture estimates sit well inside it (and the estimator itself is
    oracle-checked — this pins the ACCURACY, not the arithmetic)."""
    from osarchiver_spark.queries.events_analytics import q_kmv_distinct

    for r in q_kmv_distinct(spark, sf_medium).collect():
        assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 0.20, r


def test_sampled_percentiles_within_5pct(spark, sf_medium):
    from osarchiver_spark.queries.relational import q_sampled_percentiles

    for r in q_sampled_percentiles(spark, sf_medium).collect():
        assert abs(r.sample_p50 - r.exact_p50) / r.exact_p50 < 0.05, r
        assert 0.10 < r.n_sample / r.n_rows < 0.22  # ~16% Bernoulli rate
