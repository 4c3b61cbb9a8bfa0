"""CSV sink → CSV source round trip: the archive written by CsvSink
must read back (with an explicit schema — never inferSchema at scale)
equal to the parquet original."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.sinks.base import CsvSink
from osarchiver_spark.sources.parquet import load_table


def test_csv_roundtrip_orders(spark, sf_small, tmp_path):
    from datetime import datetime

    orders = load_table(spark, sf_small, "orders")
    sink = CsvSink(str(tmp_path))
    sink.begin_run(datetime(2001, 12, 1))
    sink.write("orders", orders)
    back = (
        spark.read.schema(orders.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(str(tmp_path / "2001-12-01_00-00-00" / "orders.csv"))
    )
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    a = orders.agg(F.sum("o_totalprice"), F.sum("o_orderkey")).collect()[0]
    b = back.agg(F.sum("o_totalprice"), F.sum("o_orderkey")).collect()[0]
    assert abs(a[0] - b[0]) < 1e-6 and a[1] == b[1]
