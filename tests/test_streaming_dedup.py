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


def test_streaming_dedup_watermark_evicts_state(spark, tmp_path):
    """Bounded-state dedup: a fingerprint whose state aged past the
    watermark is evicted, so a late re-arrival re-emits."""
    import datetime as dt
    import uuid

    from osarchiver_spark.streaming.dedup import streaming_dedup_watermarked

    ts_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    watch = tmp_path / "landing"
    watch.mkdir()
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def write_batch(rows, name):
        spark.createDataFrame(rows, ts_schema).coalesce(1).write.mode("append").parquet(
            str(watch / name)
        )

    stream = spark.readStream.format("parquet").schema(ts_schema).load(str(watch) + "/*")
    out = streaming_dedup_watermarked(stream, "doc_id", "text", "ts", delay="10 minutes")
    name = f"sd_wm_{uuid.uuid4().hex[:6]}"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        # b1: emit 'alpha beta'; duplicate within batch dropped
        write_batch([(1, "alpha beta", t0), (2, "alpha beta", t0)], "b1")
        q.processAllAvailable()
        # b2: event time jumps 1h → watermark advances past t0+10min.
        # Eviction is applied at the END of the batch that *runs with*
        # the advanced watermark, so b2 advances it and b3 purges
        # b1's fingerprint state.
        write_batch([(50, "unrelated text", t0 + dt.timedelta(hours=1))], "b2")
        q.processAllAvailable()
        write_batch([(51, "filler text", t0 + dt.timedelta(hours=1, seconds=1))], "b3")
        q.processAllAvailable()
        # b4: same text re-arrives after eviction → re-emitted
        write_batch([(60, "alpha beta", t0 + dt.timedelta(hours=1, seconds=5))], "b4")
        q.processAllAvailable()
        keeps = {r.keep_id for r in spark.table(name).collect()}
        assert keeps == {1, 50, 51, 60}
    finally:
        q.stop()


def test_streaming_kmv_merges_state_across_batches(spark, tmp_path):
    """Below-k regime: the carried sketch is the exact distinct set,
    so two drops with overlapping keys must yield the exact distinct
    count of the union — proving dedup ACROSS the checkpoint
    boundary, not just within a batch."""
    from datetime import datetime

    from osarchiver_spark.streaming.sketch import incremental_stream_kmv

    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drop(users):
        rows = [(i, datetime(2024, 1, 1), u, "t", 1.0, "{}") for i, u in enumerate(users)]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).write.mode("append").parquet(landing)

    drop([1, 2, 3, 4])
    r1 = {r.event_type: r.kmv_estimate for r in incremental_stream_kmv(spark, landing, out, ckpt).collect()}
    assert r1["t"] == 4.0
    drop([3, 4, 5, 6])  # overlaps run 1 — only 5 and 6 are new
    r2 = {r.event_type: r.kmv_estimate for r in incremental_stream_kmv(spark, landing, out, ckpt).collect()}
    assert r2["t"] == 6.0
