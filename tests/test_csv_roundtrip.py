"""CSV sink → CSV source round trip: the archive written by CsvSink
must read back (with an explicit schema — never inferSchema at scale)
equal to the parquet original."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.sinks.base import CsvSink
from osarchiver_spark.sources.parquet import load_table


def test_csv_roundtrip_orders(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders")
    CsvSink(str(tmp_path)).write("orders", orders)
    back = (
        spark.read.schema(orders.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(str(tmp_path / "orders.csv"))
    )
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    a = orders.agg(F.sum("o_totalprice"), F.sum("o_orderkey")).collect()[0]
    b = back.agg(F.sum("o_totalprice"), F.sum("o_orderkey")).collect()[0]
    assert abs(a[0] - b[0]) < 1e-6 and a[1] == b[1]
