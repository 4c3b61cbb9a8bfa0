"""Salting and merge emulation: results must equal their plain
equivalents exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.operators.merge import merge_insert_if_absent, merge_upsert
from osarchiver_spark.operators.skew import key_skew_profile, salted_count_sum, salted_join
from osarchiver_spark.sources.parquet import load_table


def test_salted_agg_equals_plain(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    plain = {
        tuple(r)[:1]: (r.n, r.total)
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("total"))
        .collect()
    }
    salted = {
        tuple(r)[:1]: (r.n, r.total)
        for r in salted_count_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    part = load_table(spark, sf_small, "part").withColumnRenamed("p_partkey", "l_partkey")
    plain = li.join(part, "l_partkey").count()
    salted = salted_join(li, part, "l_partkey").count()
    assert plain == salted


def test_skew_profile_orders_by_count(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    prof = key_skew_profile(li, "l_returnflag", top_n=3).collect()
    assert len(prof) == 3
    assert prof[0].n >= prof[1].n >= prof[2].n
    assert prof[0].skew_ratio > 0


def test_merge_insert_if_absent_is_idempotent(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    target = orders.filter(F.col("o_orderkey") < 500)
    source = orders.filter(F.col("o_orderkey") < 700)  # overlaps target
    merged = merge_insert_if_absent(target, source, "o_orderkey")
    assert merged.count() == orders.filter(F.col("o_orderkey") < 700).count()
    # existing rows untouched (reference ON DUPLICATE KEY no-op)
    again = merge_insert_if_absent(merged, source, "o_orderkey")
    assert again.count() == merged.count()
    assert merged.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_merge_upsert_source_wins(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    target = orders.filter(F.col("o_orderkey") < 500)
    source = (
        orders.filter((F.col("o_orderkey") >= 400) & (F.col("o_orderkey") < 600))
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    merged = merge_upsert(target, source, "o_orderkey")
    assert merged.count() == orders.filter(F.col("o_orderkey") < 600).count()
    overlap = merged.filter((F.col("o_orderkey") >= 400) & (F.col("o_orderkey") < 500))
    assert overlap.filter(F.col("o_totalprice") != -1.0).count() == 0  # source won
    untouched = merged.filter(F.col("o_orderkey") < 400)
    assert untouched.filter(F.col("o_totalprice") == -1.0).count() == 0
