"""JDBC source: the direct Spark upgrade of the reference's keyset
pagination (osarchiver/source/db.py:216-277, SURVEY S8).

The reference pages `WHERE pk > last_id LIMIT n` sequentially to
avoid OFFSET cost; Spark reads the same key ranges IN PARALLEL via
partitionColumn/lowerBound/upperBound/numPartitions — each executor
gets a `pk BETWEEN lo AND hi` slice, the retention predicate pushes
down into each slice's WHERE clause.

Executed for real in tests/test_jdbc_integration.py against a
file-backed DuckDB through its JDBC driver (keyset-parallel
partitions, retention pushdown subquery, row parity with the
fixture); no NETWORK database (MySQL et al.) exists in this
container — swapping the URL/driver is the only difference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcTable:
    url: str  # e.g. jdbc:mysql://host:3306/db
    table: str
    primary_key: str
    user: str = ""
    password: str = ""
    fetch_size: int = 10_000


def jdbc_read_options(
    src: JdbcTable,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    where: str | None = None,
) -> dict[str, str]:
    """Partitioned-read option set. ``where`` (the retention
    predicate) is inlined as a pushdown subquery so the database
    itself filters — exactly where the reference runs its WHERE
    (source/db.py:237-248)."""
    dbtable = src.table if where is None else f"(SELECT * FROM {src.table} WHERE {where}) AS t"
    return {
        "url": src.url,
        "dbtable": dbtable,
        "user": src.user,
        "password": src.password,
        "partitionColumn": src.primary_key,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(src.fetch_size),
    }


def read_table(
    spark: SparkSession,
    src: JdbcTable,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    where: str | None = None,
) -> DataFrame:
    """Build the parallel JDBC scan (lazy; caller executes)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(src, lower_bound, upper_bound, num_partitions, where).items():
        reader = reader.option(k, v)
    return reader.load()
