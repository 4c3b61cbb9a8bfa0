"""Archive maintenance: small-file compaction.

Every nightly incremental archival run appends a few files per table;
after a year a 100 TB archive is millions of kilobyte-scale files and
scan planning (footer reads, task scheduling) dominates every restore
query — the classic small-file problem. Compaction rewrites a parquet
directory into ceil(bytes / target) files of ~target size.

The rewrite goes to a sibling temp directory first and swaps in via
rename, so a crash mid-compaction leaves the original intact (the
same archive-before-delete discipline as the pipeline itself). On
HDFS/local the swap is an atomic metadata rename; on object stores
rename is copy+delete — there, prefer writing to a NEW dated prefix
and flipping the catalog/manifest pointer instead of swapping in
place.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def data_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    fs, hpath, _ = _fs_and_path(spark, path)
    n = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet_dir(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Rewrite ``path`` into ~target-sized files; returns
    (files_before, files_after). Row content is preserved exactly —
    compaction is a pure physical re-layout."""
    before, total = data_file_stats(spark, path)
    n_out = max(1, math.ceil(total / target_bytes))
    if before <= n_out:
        return before, before  # already compact enough
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    fs, hpath, jvm = _fs_and_path(spark, path)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(tmp_path):
        fs.delete(tmp_path, True)  # stale leftover from a crashed run
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    # three-step swap: at every instant at least one complete copy
    # exists under a predictable name (old aside -> tmp in -> old gone)
    old = path.rstrip("/") + "__precompact"
    old_path = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(old_path):
        fs.delete(old_path, True)
    fs.rename(hpath, old_path)
    fs.rename(tmp_path, hpath)
    fs.delete(old_path, True)
    after, _ = data_file_stats(spark, path)
    return before, after
