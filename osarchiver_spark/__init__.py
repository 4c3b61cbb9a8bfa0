"""osarchiver_spark — a PySpark-native analytics/archival engine.

Re-expresses the data-processing capabilities of ovh/osarchiver
(reference: /root/reference, BSD-3) as idiomatic Spark DataFrame
pipelines, plus large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Architecture (Spark-first, NOT a port):
- the reference's row-batch generators become lazy DataFrames;
- its keyset pagination becomes partition parallelism;
- its archive-then-delete becomes multi-sink write + anti-join rewrite;
- its INI config becomes a declarative ArchiveJobSpec.
"""

from osarchiver_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
