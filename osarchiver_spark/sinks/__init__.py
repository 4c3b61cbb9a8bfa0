from osarchiver_spark.sinks.base import Sink, CsvSink, ParquetArchiveSink, SqlDumpSink

__all__ = ["Sink", "CsvSink", "ParquetArchiveSink", "SqlDumpSink"]
