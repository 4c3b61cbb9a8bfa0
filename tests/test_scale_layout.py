"""Storage-layout scale disciplines: bucketed co-located joins (no
shuffle) and date-partitioned archives (partition pruning)."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

from pyspark.sql import functions as F

from osarchiver_spark.operators.retention import retention_filter
from osarchiver_spark.sinks.base import ParquetArchiveSink
from osarchiver_spark.sources.parquet import load_table


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_avoids_shuffle(spark, sf_small, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange:
    the physical plan must contain a SortMergeJoin with NO Exchange
    above either scan — the co-location contract that amortizes one
    shuffle across every future join at 100 TB."""
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_lineitem")).saveAsTable("b_lineitem")
    )
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        joined = a.hint("merge").join(b, "o_orderkey")
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # sanity: same result as the plain join
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_archive_prunes(spark, sf_small, tmp_path):
    """ParquetArchiveSink with a partition column lays the archive out
    by date; a date-filtered read must show PartitionFilters (pruned
    scan), not a full-archive read."""
    orders = load_table(spark, sf_small, "orders")
    archived = retention_filter(orders, "o_orderdate", datetime(1998, 12, 1))
    sink = ParquetArchiveSink(
        str(tmp_path / "arch"), {"orders": "o_orderkey"}, partition_column="o_orderdate"
    )
    sink.write("orders", archived)
    read = spark.read.parquet(str(tmp_path / "arch" / "orders")).filter(
        F.col("_archive_dt") == "1997-06-01"
    )
    plan = _explain(read)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "_archive_dt" in pf[0]
    # pruning actually works: only that month's rows come back
    got = read.count()
    want = archived.filter(F.trunc("o_orderdate", "month") == "1997-06-01").count()
    assert got == want and want > 0


def test_zorder_layout_narrows_both_dims(spark, sf_medium):
    """Range-partitioning on the Morton value must yield partitions
    that are narrow in BOTH interleaved dimensions at once — the
    property single-column sorting cannot give. Needs dimensions of
    comparable bit width (sf0.01: custkey 11 bits, day 12 bits) and
    cuts deep enough into the curve that both dims' bits engage."""
    from pyspark.sql import functions as F

    from osarchiver_spark.operators.layout import zorder_layout
    from osarchiver_spark.sources.parquet import load_table

    orders = load_table(spark, sf_medium, "orders")
    laid = zorder_layout(
        orders, "o_custkey", "datediff(o_orderdate, DATE '1992-01-01')",
        bits=14, num_files=32,
    )
    stats = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("o_custkey").alias("c0"), F.max("o_custkey").alias("c1"),
            F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1"),
        )
        .collect()
    )
    g = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_orderdate"), F.max("o_orderdate")
    ).first()
    g_cust = g[1] - g[0]
    g_days = (g[3] - g[2]).days
    import statistics

    cust_w = statistics.mean(r.c1 - r.c0 for r in stats)
    day_w = statistics.mean((r.d1 - r.d0).days for r in stats)
    assert len(stats) > 1
    # every file-to-be covers a fraction of both global ranges
    assert cust_w < 0.7 * g_cust
    assert day_w < 0.7 * g_days
