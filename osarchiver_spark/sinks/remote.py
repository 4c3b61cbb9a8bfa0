"""Remote object-store sink (reference Swift remote store,
destination/file/remote_store/swift.py:32-61, base.py:24-28).

The reference uploads finished local files to Swift under
``<file_name_prefix>/<date>/<basename>``. Spark-first there is no
"upload" step: executors write parquet/csv parts DIRECTLY to the
object store through the Hadoop FileSystem connectors — the store is
just a URI scheme (``file://`` in tests, ``s3a://`` / ``swift://`` /
``abfss://`` on a cluster with the connector jars on the classpath).
No driver staging, no local disk proportional to data size, writes
parallel per partition — which is the only upload shape that works
at 100 TB.

Layout parity: ``<base_uri>/<file_name_prefix>/<date>/<table>.<fmt>``
mirrors the reference object names, so an operator browsing the
container sees the same structure. Re-running with the same frozen
``now`` overwrites the same object prefix — idempotent re-upload
(the reference gets this from Swift object overwrite semantics).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame

from osarchiver_spark.sinks.base import Sink


class RemoteStoreSink(Sink):
    """Direct-to-object-store archive writes.

    store_options: like the reference, ``opt_``-prefixed keys pass
    through to the underlying connector — here they become Hadoop
    configuration entries (e.g. ``opt_fs.s3a.endpoint``) applied at
    write time.
    """

    def __init__(
        self,
        base_uri: str,
        file_name_prefix: str = "",
        fmt: str = "parquet",
        compression: str | None = None,
        store_options: dict[str, str] | None = None,
    ):
        if fmt not in ("parquet", "csv"):
            raise ValueError(f"unsupported remote format {fmt!r}")
        self.base_uri = base_uri.rstrip("/")
        self.file_name_prefix = file_name_prefix.strip("/")
        self.fmt = fmt
        self.compression = compression
        self.store_options = {
            k.removeprefix("opt_"): v
            for k, v in (store_options or {}).items()
            if k.startswith("opt_")
        }
        self._date: str | None = None

    def begin_run(self, now: datetime) -> None:
        self._date = now.strftime("%Y-%m-%d_%H-%M-%S")

    def _object_prefix(self, table: str) -> str:
        date = self._date or datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        parts = [self.base_uri]
        if self.file_name_prefix:
            parts.append(self.file_name_prefix)
        parts.append(date)
        parts.append(f"{table}.{self.fmt}")
        return "/".join(parts)

    def write(self, table: str, df: DataFrame) -> None:
        spark = df.sparkSession
        for k, v in self.store_options.items():
            spark.sparkContext._jsc.hadoopConfiguration().set(k, v)
        writer = df.write.mode("overwrite")
        if self.fmt == "csv":
            writer = writer.option("header", True)
            if self.compression:
                writer = writer.option("compression", self.compression)
            writer.csv(self._object_prefix(table))
        else:
            if self.compression:
                writer = writer.option("compression", self.compression)
            writer.parquet(self._object_prefix(table))
