from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osarchiver_spark.operators.scd import scd2_apply, scd2_as_of, scd2_current, scd2_init
from osarchiver_spark.sources.parquet import load_table

T0 = datetime(2001, 1, 1)
T1 = datetime(2001, 6, 1)
T2 = datetime(2001, 9, 1)


def test_scd2_versions_and_time_travel(spark, sf_small):
    cust = load_table(spark, sf_small, "customer").select("c_custkey", "c_name", "c_acctbal")
    hist = scd2_init(cust, T0)

    # batch 1: customer 0 and 1 change balance
    upd1 = cust.filter(F.col("c_custkey") < 2).withColumn("c_acctbal", F.lit(111.0))
    hist = scd2_apply(hist, upd1, "c_custkey", T1)

    # batch 2: customer 0 changes again
    upd2 = cust.filter(F.col("c_custkey") < 1).withColumn("c_acctbal", F.lit(222.0))
    hist = scd2_apply(hist, upd2, "c_custkey", T2)
    hist = hist.cache()

    n = cust.count()
    assert hist.count() == n + 3  # 3 extra versions
    cur = scd2_current(hist)
    assert cur.count() == n  # exactly one open version per key
    assert cur.filter("c_custkey = 0").collect()[0].c_acctbal == 222.0
    assert cur.filter("c_custkey = 1").collect()[0].c_acctbal == 111.0

    # time travel: between T1 and T2 customer 0 had the first update
    asof = scd2_as_of(hist, datetime(2001, 7, 1))
    assert asof.count() == n
    assert asof.filter("c_custkey = 0").collect()[0].c_acctbal == 111.0
    # before T1: original values
    asof0 = scd2_as_of(hist, datetime(2001, 2, 1))
    orig = cust.filter("c_custkey = 0").collect()[0].c_acctbal
    assert asof0.filter("c_custkey = 0").collect()[0].c_acctbal == orig
    hist.unpersist()
