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


def _rowgroup_minmax(path: str, column: str) -> list[tuple]:
    """(min, max) per parquet row group under ``path`` — read straight
    from the footers, the same statistics a scan's predicate pushdown
    evaluates."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            assert st is not None and st.has_min_max
            out.append((st.min, st.max))
    return out


def test_lsh_index_probe_skips_rowgroups(spark, sf_small, tmp_path):
    """MEASURED file skipping on the persisted LSH band index: with
    the index range-partitioned and sorted by band_key, one arriving
    document's band keys overlap only a few row groups' [min, max]
    ranges — the probe scan reads slivers, not the index. Also pins
    that Spark actually pushes the IN predicate to the scan."""
    from osarchiver_spark.operators.dedup import minhash_lsh_index

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 3)
    idx_dir = str(tmp_path / "lsh_index")
    minhash_lsh_index(
        corpus, "doc_id", "text", shingle_n=3, num_hashes=12, bands=4, num_files=32
    ).write.mode("overwrite").parquet(idx_dir)

    index = spark.read.parquet(idx_dir)
    # one arriving doc = 4 band keys (the per-document probe cost)
    keys = [
        r.band_key
        for r in index.select("band_key").distinct().orderBy("band_key").limit(4).collect()
    ]
    probed = index.filter(F.col("band_key").isin(keys))
    plan = _explain(probed)
    assert "PushedFilters" in plan and "band_key" in plan

    ranges = _rowgroup_minmax(idx_dir, "band_key")
    assert len(ranges) >= 16, "need a multi-row-group layout to measure skipping"
    hit = sum(1 for lo, hi in ranges if any(lo <= k <= hi for k in keys))
    skip_frac = 1 - hit / len(ranges)
    # sorted layout: 4 keys can overlap at most ~4 ranges (plus range
    # boundaries); an unsorted layout would overlap nearly all of them
    assert skip_frac >= 0.7, f"only {skip_frac:.0%} of row groups skippable"
    # correctness: the PRUNED scan returns exactly what a scan with
    # parquet pushdown disabled returns (pruning never drops a match)
    got = probed.count()
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    try:
        want = (
            spark.read.parquet(idx_dir).filter(F.col("band_key").isin(keys)).count()
        )
    finally:
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    assert got == want and want > 0


def test_restore_lookup_skips_rowgroups(spark, sf_small, tmp_path):
    """MEASURED min/max pruning on the archive restore path: an
    archive written pk-sorted (repartitionByRange + sortWithinPartitions
    — the layout ParquetArchiveSink users should choose for restore-
    heavy archives) lets a pk-range restore lookup skip almost every
    row group, where an unsorted archive's row groups all straddle
    the probe range. Both layouts measured from the real footers."""
    orders = load_table(spark, sf_small, "orders")
    archived = retention_filter(orders, "o_orderdate", datetime(1998, 12, 1))

    sorted_dir = str(tmp_path / "arch_sorted")
    (
        archived.repartitionByRange(16, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(sorted_dir)
    )
    shuffled_dir = str(tmp_path / "arch_shuffled")
    archived.repartition(16).write.mode("overwrite").parquet(shuffled_dir)

    lo, hi = archived.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    span = hi - lo
    a, b = lo + span // 2, lo + span // 2 + max(span // 100, 1)  # ~1% restore window

    def skip_frac(path: str) -> float:
        ranges = _rowgroup_minmax(path, "o_orderkey")
        hit = sum(1 for mn, mx in ranges if not (mx < a or mn > b))
        return 1 - hit / len(ranges)

    s_sorted, s_shuffled = skip_frac(sorted_dir), skip_frac(shuffled_dir)
    assert s_sorted >= 0.85, f"sorted archive skips only {s_sorted:.0%}"
    assert s_shuffled <= 0.2, f"control: unsorted archive skipped {s_shuffled:.0%}"

    # the restore scan pushes the range predicate down to those stats
    restore = spark.read.parquet(sorted_dir).filter(
        (F.col("o_orderkey") >= a) & (F.col("o_orderkey") <= b)
    )
    plan = _explain(restore)
    assert "PushedFilters" in plan and "o_orderkey" in plan
    want = archived.filter((F.col("o_orderkey") >= a) & (F.col("o_orderkey") <= b)).count()
    assert restore.count() == want and want > 0
