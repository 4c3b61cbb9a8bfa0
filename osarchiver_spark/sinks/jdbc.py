"""JDBC destination + source-delete: the reference's database half,
executable.

The reference archives INTO a database with idempotent upsert
(osarchiver/destination/db/db.py:374-414, `INSERT ... ON DUPLICATE
KEY UPDATE pk=pk`) and deletes archived rows from the SOURCE in
bounded chunks (source/db.py:279-321, `DELETE ... WHERE pk IN (...)
LIMIT n`). `sources/jdbc.py` already builds the keyset-parallel
retention scan; this module adds the write half:

- :class:`JdbcArchiveSink` — the DB twin of ParquetArchiveSink:
  schema-drift check against the live destination table, pk
  anti-join insert-if-absent (the upsert-as-no-op restated for
  engines without ON DUPLICATE KEY), distributed batched INSERTs via
  Spark's JDBC writer;
- :func:`delete_rows_chunked` — chunked source delete driven by a
  keys DataFrame (``toLocalIterator`` pages the keys through the
  driver one chunk at a time — the reference's own pagination
  discipline; memory is chunk-bounded, never a full collect);
- :func:`jdbc_execute` / :func:`ddl_for_schema` — direct-statement
  plumbing (DDL, DELETE) through java.sql.DriverManager, since the
  Spark JDBC writer only speaks INSERT/CREATE.

Environment note: executing any of this needs a JDBC driver jar on
the DRIVER classpath (``spark.driver.extraClassPath`` — ``spark.jars``
alone reaches executors but not java.sql.DriverManager in the
driver). The integration test (tests/test_jdbc_integration.py) runs
the full loop — keyset read + retention pushdown + idempotent upsert
+ chunked delete — against a file-backed DuckDB via its JDBC driver;
no network database exists in this container (rechecked r11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from osarchiver_spark.plans.schema_drift import check_schema_drift
from osarchiver_spark.sinks.base import Sink

_DDL_TYPES: dict[type, str] = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "FLOAT",
    T.StringType: "VARCHAR",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
}


def ddl_for_schema(table: str, schema: T.StructType, primary_key: list[str]) -> str:
    """CREATE TABLE IF NOT EXISTS from a Spark schema (ANSI types; the
    reference reads the source's SHOW CREATE TABLE instead — Spark's
    schema IS the contract here). Decimal keeps precision/scale."""
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            sql_t = f"DECIMAL({f.dataType.precision},{f.dataType.scale})"
        else:
            sql_t = _DDL_TYPES.get(type(f.dataType))
            if sql_t is None:
                raise ValueError(
                    f"ddl_for_schema: no JDBC DDL mapping for column "
                    f"{f.name!r} of type {f.dataType.simpleString()}"
                )
        nn = "" if f.nullable else " NOT NULL"
        cols.append(f'"{f.name}" {sql_t}{nn}')
    pk = ", ".join(f'"{k}"' for k in primary_key)
    return (
        f'CREATE TABLE IF NOT EXISTS "{table}" ('
        + ", ".join(cols)
        + (f", PRIMARY KEY ({pk})" if primary_key else "")
        + ")"
    )


def jdbc_execute(spark: SparkSession, url: str, sql: str) -> None:
    """Execute one non-query statement (DDL/DELETE) through
    java.sql.DriverManager on the driver JVM."""
    conn = spark.sparkContext._jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def _read_jdbc(spark: SparkSession, url: str, dbtable: str, driver: str | None):
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    if driver:
        reader = reader.option("driver", driver)
    return reader


def _table_exists(spark: SparkSession, url: str, table: str, driver: str | None) -> bool:
    try:
        _read_jdbc(spark, url, f'(SELECT 1 AS one FROM "{table}" LIMIT 1) t', driver).load().collect()
        return True
    except Exception:
        return False


class JdbcArchiveSink(Sink):
    """Archive tables into a database with insert-if-absent semantics
    (reference destination/db/db.py:374-414). First write creates the
    table from the DataFrame schema (primary key declared); later
    writes drift-check against the LIVE destination schema, anti-join
    away already-archived pks, and append the remainder through
    Spark's batched JDBC writer — re-running an archival is a no-op,
    the same invariant ParquetArchiveSink pins for object storage."""

    def __init__(
        self,
        url: str,
        primary_keys: dict[str, str | list[str]],
        driver: str | None = None,
        batch_size: int = 10_000,
    ):
        self.url = url
        self.primary_keys = {
            t: [k] if isinstance(k, str) else list(k)
            for t, k in primary_keys.items()
        }
        self.driver = driver
        self.batch_size = batch_size

    def write(self, table: str, df: DataFrame) -> None:
        spark = df.sparkSession
        pk = self.primary_keys[table]
        if not _table_exists(spark, self.url, table, self.driver):
            jdbc_execute(
                spark, self.url, ddl_for_schema(table, df.schema, pk)
            )
        else:
            existing = _read_jdbc(
                spark, self.url, f'"{table}"', self.driver
            ).load()
            check_schema_drift(df.schema, existing.schema)
            # insert-if-absent: drop rows whose pk already landed (the
            # ON DUPLICATE KEY UPDATE pk=pk no-op upsert, restated)
            df = df.join(existing.select(*pk), on=pk, how="left_anti")
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f'"{table}"')
            .option("batchsize", str(self.batch_size))
            .mode("append")
        )
        if self.driver:
            writer = writer.option("driver", self.driver)
        writer.save()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return _read_jdbc(spark, self.url, f'"{table}"', self.driver).load()


def delete_rows_chunked(
    spark: SparkSession,
    url: str,
    table: str,
    primary_key: str,
    keys: DataFrame,
    chunk_size: int = 10_000,
) -> int:
    """Delete the rows whose pk appears in ``keys`` from the SOURCE
    database, ``chunk_size`` keys per DELETE statement — the
    reference's bounded-chunk delete loop (source/db.py:279-321),
    with the key list streamed through the driver via
    ``toLocalIterator`` (one partition in memory at a time; the
    chunked statements bound both DB transaction size and driver
    memory). Returns the number of keys submitted.

    Only the DELETE itself runs through the driver — producing
    ``keys`` (retention scan, archive verification anti-join) stays
    fully distributed. String keys are quoted/escaped; numeric keys
    are rendered bare."""
    is_string = isinstance(keys.schema[primary_key].dataType, T.StringType)

    def render(v) -> str:
        if is_string:
            return "'" + str(v).replace("'", "''") + "'"
        return str(v)

    n = 0
    chunk: list[str] = []

    def flush():
        nonlocal chunk
        if chunk:
            jdbc_execute(
                spark,
                url,
                f'DELETE FROM "{table}" WHERE "{primary_key}" IN ('
                + ", ".join(chunk)
                + ")",
            )
            chunk = []

    for row in keys.select(primary_key).toLocalIterator():
        chunk.append(render(row[0]))
        n += 1
        if len(chunk) >= chunk_size:
            flush()
    flush()
    return n
