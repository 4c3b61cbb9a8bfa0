"""JDBC end-to-end against a REAL database (r10 verdict item 6):
every prior round recorded "no DB server in the container"; this
round a DuckDB JDBC driver jar IS present, so the whole reference
loop — keyset-parallel retention read, idempotent archive upsert,
chunked source delete — executes for real against a file-backed
DuckDB through java.sql.DriverManager + Spark's JDBC source/writer.

Runs in a SUBPROCESS because the JDBC jar must be on the driver
JVM's classpath at session construction (the shared test session has
no reason to carry it)."""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest


def _find_jdbc_jar() -> str | None:
    pats = [
        "/root/.cache/coursier/**/duckdb_jdbc*.jar",
        os.path.expanduser("~/.m2/**/duckdb_jdbc*.jar"),
    ]
    for p in pats:
        hits = glob.glob(p, recursive=True)
        if hits:
            return hits[0]
    return None


JAR = _find_jdbc_jar()

SCRIPT = r"""
import os, sys
sys.path.insert(0, os.getcwd())
JAR, TMP, SF = sys.argv[1], sys.argv[2], sys.argv[3]

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", JAR)
    .config("spark.driver.extraClassPath", JAR)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .appName("jdbc_integration")
    .getOrCreate()
)

from osarchiver_spark.sinks.jdbc import JdbcArchiveSink, delete_rows_chunked
from osarchiver_spark.sources.jdbc import JdbcTable, read_table
from osarchiver_spark.sources.parquet import load_table

src_db = f"{TMP}/source.duckdb"
dst_db = f"{TMP}/dest.duckdb"
DRIVER = "org.duckdb.DuckDBDriver"

# ---- stage the SOURCE database from the fixture (python duckdb and
# the JDBC jar are the same storage version here: 1.0.0) ----
orders = load_table(spark, SF, "orders").select(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
)
pdf = orders.toPandas()
con = duckdb.connect(src_db)
con.execute(
    "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, "
    "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP)"
)
con.execute("INSERT INTO orders SELECT * FROM pdf")
n_all = con.execute("SELECT count(*) FROM orders").fetchone()[0]
cutoff = "1996-06-30 00:00:00"
n_old = con.execute(
    f"SELECT count(*) FROM orders WHERE o_orderdate <= TIMESTAMP '{cutoff}'"
).fetchone()[0]
lo, hi = con.execute("SELECT min(o_orderkey), max(o_orderkey) FROM orders").fetchone()
con.close()
assert 0 < n_old < n_all

# ---- 1. keyset-parallel retention read (sources/jdbc.py) ----
src = JdbcTable(url=f"jdbc:duckdb:{src_db}", table="orders", primary_key="o_orderkey")
archived = read_table(
    spark, src, int(lo), int(hi) + 1, num_partitions=4,
    where=f"o_orderdate <= TIMESTAMP '{cutoff}'",
)
# read_table builds options without an explicit 'driver';
# DriverManager resolves the duckdb URL because the jar is on the
# driver classpath (the documented execution requirement).
assert archived.rdd.getNumPartitions() == 4, archived.rdd.getNumPartitions()
got = archived.count()
assert got == n_old, (got, n_old)
# parity with the parquet fixture under the same predicate
expect = orders.filter(F.col("o_orderdate") <= F.lit(cutoff).cast("timestamp"))
sym = archived.select("o_orderkey").exceptAll(expect.select("o_orderkey")).count() \
    + expect.select("o_orderkey").exceptAll(archived.select("o_orderkey")).count()
assert sym == 0, sym
print("KEYSET_READ_OK", got)

# ---- 2. idempotent archive upsert (sinks/jdbc.py) ----
sink = JdbcArchiveSink(
    url=f"jdbc:duckdb:{dst_db}", primary_keys={"orders": "o_orderkey"}, driver=DRIVER
)
sink.write("orders", archived)          # first write: creates + inserts
n1 = sink.read(spark, "orders").count()
sink.write("orders", archived)          # re-run: anti-join drops everything
n2 = sink.read(spark, "orders").count()
assert n1 == n2 == n_old, (n1, n2, n_old)
# a later batch adds ONLY its new rows (overlap deduped by pk)
later = read_table(spark, src, int(lo), int(hi) + 1, num_partitions=4,
                   where="o_orderdate <= TIMESTAMP '1997-06-30 00:00:00'")
sink.write("orders", later)
n3 = sink.read(spark, "orders").count()
assert n3 == later.count() > n1, (n3, later.count(), n1)
# value round-trip: the archived rows equal the source rows
rt = sink.read(spark, "orders")
sym2 = rt.exceptAll(later).count() + later.exceptAll(rt).count()
assert sym2 == 0, sym2
print("UPSERT_OK", n1, n3)

# ---- 2b. parquet-origin frames archive idempotently too: the dest
# reads BIGINT back as decimal(20,0) here (DuckDB dialect), so this
# pins the drift check's round-trip widening with a NON-JDBC incoming
# schema (the common lakehouse-to-DB shape) ----
sink_pq = JdbcArchiveSink(
    url=f"jdbc:duckdb:{TMP}/dest_pq.duckdb",
    primary_keys={"orders": "o_orderkey"}, driver=DRIVER,
)
pq_batch = orders.filter(F.col("o_orderdate") <= F.lit(cutoff).cast("timestamp"))
sink_pq.write("orders", pq_batch)
sink_pq.write("orders", pq_batch)  # would SchemaDriftError pre-widening
assert sink_pq.read(spark, "orders").count() == n_old
print("PARQUET_ORIGIN_UPSERT_OK")

# ---- 3. chunked source delete (S19 via JDBC) ----
keys = rt.select("o_orderkey")
n_del = delete_rows_chunked(
    spark, f"jdbc:duckdb:{src_db}", "orders", "o_orderkey", keys, chunk_size=97
)
assert n_del == n3
remaining = read_table(spark, src, int(lo), int(hi) + 1, num_partitions=4)
assert remaining.count() == n_all - n3, (remaining.count(), n_all, n3)
# archived ∪ remaining == original, disjoint — the no-data-loss invariant
assert remaining.join(rt, "o_orderkey", "inner").count() == 0
print("DELETE_OK", n_del, remaining.count())

# ---- 4. the WHOLE reference shape, INI-driven: backend=db source ->
# backend=jdbc destination through the Archiver ----
from osarchiver_spark.operators.archive import Archiver
from osarchiver_spark.plans.config import load_config

src2_db = f"{TMP}/source2.duckdb"
dst2_db = f"{TMP}/dest2.duckdb"
con = duckdb.connect(src2_db)
con.execute(
    "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, "
    "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP)"
)
con.execute("INSERT INTO orders SELECT * FROM pdf")
con.close()

ini = f'''
[archiver:orders]
src=orders_db
dst=archive_db

[src:orders_db]
backend=db
jdbc_url=jdbc:duckdb:{src2_db}
now=1996-06-30T00:00:00
retention=0 MONTH
deleted_column=o_orderdate
primary_keys=orders:o_orderkey
tables=orders
keyset_upper={int(hi) + 1}

[dst:archive_db]
backend=jdbc
url=jdbc:duckdb:{dst2_db}
driver=org.duckdb.DuckDBDriver
'''
(a,) = load_config(text=ini)
dfs = a.dataframes(spark)
assert dfs["orders"].rdd.getNumPartitions() > 1  # keyset-parallel scan
results = Archiver(a.spec, a.sinks).run(dfs)
assert results[0].error is None, results[0].error
n_cfg = a.sinks[0].read(spark, "orders").count()
n_expect = orders.filter(
    F.col("o_orderdate") <= F.lit("1996-06-30 00:00:00").cast("timestamp")
).count()
assert n_cfg == results[0].archived_rows == n_expect > 0, (n_cfg, n_expect)
# the whole pipeline is idempotent: re-run archives 0 new rows
results2 = Archiver(a.spec, a.sinks).run(a.dataframes(spark))
assert results2[0].error is None
assert a.sinks[0].read(spark, "orders").count() == n_cfg
print("CONFIG_PIPELINE_OK", n_cfg)

# ---- 5. restore: archived rows flow BACK into the source through
# the same insert-if-absent sink pointed at the source DB (the
# reference's recovery story: operators/restore.py picks candidates;
# the upsert's anti-join makes re-insertion idempotent) ----
restore = JdbcArchiveSink(
    url=f"jdbc:duckdb:{src_db}", primary_keys={"orders": "o_orderkey"}, driver=DRIVER
)
restore.write("orders", rt)  # rt = the archived rows deleted in stage 3
restored = read_table(spark, src, int(lo), int(hi) + 1, num_partitions=4)
assert restored.count() == n_all, (restored.count(), n_all)
# canonical projection (JDBC reads can widen types vs the parquet
# fixture, e.g. BIGINT -> DECIMAL(20,0)); compare values as strings
canon = lambda df: df.select(
    F.col("o_orderkey").cast("long").alias("k"),
    F.col("o_totalprice").cast("double").alias("p"),
    F.col("o_orderdate").cast("timestamp").cast("string").alias("d"),
)
sym3 = canon(restored).exceptAll(canon(orders)).count() \
    + canon(orders).exceptAll(canon(restored)).count()
assert sym3 == 0, sym3
restore.write("orders", rt)  # idempotent: nothing re-inserts
assert read_table(spark, src, int(lo), int(hi) + 1, num_partitions=4).count() == n_all
print("RESTORE_OK", n_all)
print("JDBC_INTEGRATION_OK")
"""


@pytest.mark.skipif(JAR is None, reason="no DuckDB JDBC driver jar on this host")
def test_jdbc_full_loop_against_real_database(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(SCRIPT), JAR, str(tmp_path),
         "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "JDBC_INTEGRATION_OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:]
    )


def test_mysql_dialect_renders_backtick_identifiers():
    """The reference's engine (MySQL) rejects ANSI double quotes
    without ANSI_QUOTES; every statement this sink renders for a
    mysql/mariadb URL must use backticks (r11 review finding). No
    server in the container — rendered-text unit check."""
    from pyspark.sql import types as T

    from osarchiver_spark.sinks.jdbc import ddl_for_schema, quote_char

    assert quote_char("jdbc:mysql://h:3306/db") == "`"
    assert quote_char("jdbc:mariadb://h/db") == "`"
    assert quote_char("jdbc:duckdb:/tmp/x.duckdb") == '"'
    assert quote_char("jdbc:postgresql://h/db") == '"'

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("note", T.StringType(), True),
        ]
    )
    ddl = ddl_for_schema("orders", schema, ["id"], quote_char("jdbc:mysql://h/db"))
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS `orders` (`id` BIGINT NOT NULL, "
        "`note` VARCHAR, PRIMARY KEY (`id`))"
    )
    # ANSI engines keep double quotes
    assert ddl_for_schema("orders", schema, ["id"]).startswith(
        'CREATE TABLE IF NOT EXISTS "orders"'
    )


def test_delete_rows_chunked_rejects_unbindable_key_types(spark):
    """Date/timestamp pks can't bind through setObject from Python;
    the delete must refuse up front instead of rendering bare (or
    injectable) literals."""
    from osarchiver_spark.sinks.jdbc import delete_rows_chunked

    keys = spark.createDataFrame([("2024-01-01",)], "d string").selectExpr(
        "cast(d as date) as d"
    )
    with pytest.raises(ValueError, match="not.*bindable"):
        delete_rows_chunked(spark, "jdbc:duckdb:/tmp/x", "t", "d", keys)


def test_small_int_columns_survive_drift_roundtrip():
    """SMALLINT/TINYINT widen to IntegerType through Spark's JDBC
    reader; the drift check must compare in the widened domain or
    every re-archival of such a table false-positives."""
    from pyspark.sql import types as T

    from osarchiver_spark.plans.schema_drift import check_schema_drift
    from osarchiver_spark.sinks.jdbc import _widen_small_ints

    incoming = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("flag", T.ShortType(), True),
            T.StructField("tiny", T.ByteType(), True),
        ]
    )
    roundtripped = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("flag", T.IntegerType(), True),
            T.StructField("tiny", T.IntegerType(), True),
        ]
    )
    check_schema_drift(_widen_small_ints(incoming), _widen_small_ints(roundtripped))
