"""Source/sink format coverage beyond parquet+CSV: ORC and JSON
round trips with explicit schemas (inference never at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.sources.parquet import load_table


def _assert_equal(a, b, key):
    assert a.count() == b.count()
    assert sorted(a.columns) == sorted(b.columns)
    assert a.join(b, key, "left_anti").count() == 0


def test_orc_roundtrip(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders")
    orders.write.mode("overwrite").orc(str(tmp_path / "orders.orc"))
    back = spark.read.orc(str(tmp_path / "orders.orc"))
    _assert_equal(orders, back, "o_orderkey")
    assert back.schema == orders.schema


def test_json_roundtrip(spark, sf_small, tmp_path):
    cust = load_table(spark, sf_small, "customer")
    cust.write.mode("overwrite").json(str(tmp_path / "customer.json"))
    back = spark.read.schema(cust.schema).json(str(tmp_path / "customer.json"))
    _assert_equal(cust, back, "c_custkey")


def test_orc_predicate_pushdown(spark, sf_small, tmp_path):
    import contextlib
    import io

    orders = load_table(spark, sf_small, "orders")
    orders.write.mode("overwrite").orc(str(tmp_path / "o2.orc"))
    read = spark.read.orc(str(tmp_path / "o2.orc")).filter(F.col("o_orderkey") < 100)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        read.explain("formatted")
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in buf.getvalue()
