"""Stateful streaming dedup: first occurrence wins across
micro-batches; later re-occurrences are dropped by group state."""

from __future__ import annotations

import time

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_streaming_dedup_across_batches(spark, tmp_path):
    from osarchiver_spark.streaming.dedup import streaming_dedup_first_seen

    watch = tmp_path / "landing"
    watch.mkdir()

    def write_batch(rows, name):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            str(watch / name)
        )

    # batch 1: two distinct texts, one duplicated within the batch
    b1 = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")]
    # batch 2: re-sends batch-1 text (must be dropped) + a new one
    b2 = [(10, "alpha beta"), (11, "epsilon zeta")]

    stream = spark.readStream.format("parquet").schema(SCHEMA).load(str(watch) + "/*")
    out = streaming_dedup_first_seen(stream, "doc_id", "text")
    q = out.writeStream.outputMode("append").format("memory").queryName("sd_test").start()
    try:
        write_batch(b1, "b1")
        q.processAllAvailable()
        first = {(r.fingerprint, r.keep_id) for r in spark.table("sd_test").collect()}
        assert {k for _, k in first} == {1, 3}  # min doc_id per text, within-batch dedup

        write_batch(b2, "b2")
        q.processAllAvailable()
        time.sleep(0.5)
        final = {(r.fingerprint, r.keep_id) for r in spark.table("sd_test").collect()}
        # 'alpha beta' NOT re-emitted; only the new text appears
        assert {k for _, k in final} == {1, 3, 11}
    finally:
        q.stop()
