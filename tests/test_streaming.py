"""Structured Streaming tests: the streaming operators must agree
with their batch twins on the same fixture data."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osarchiver_spark.queries.windows import q_tumbling_window
from osarchiver_spark.sources.parquet import load_table
from osarchiver_spark.streaming.pipeline import stream_archive, streaming_tumbling_agg


def test_streaming_tumbling_matches_batch(spark, sf_small):
    got = streaming_tumbling_agg(spark, sf_small)
    want = q_tumbling_window(spark, sf_small)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w


def test_stream_archive_matches_batch_filter(spark, sf_small, tmp_path):
    cutoff = datetime(2024, 1, 15)
    stream_archive(
        spark,
        sf_small,
        str(tmp_path / "arch"),
        str(tmp_path / "ckpt"),
        deleted_column="ts",
        cutoff=cutoff,
    )
    archived = spark.read.parquet(str(tmp_path / "arch"))
    batch = load_table(spark, sf_small, "events").filter(F.col("ts") <= F.lit(cutoff))
    assert archived.count() == batch.count()
    assert sorted(archived.columns) == sorted(batch.columns)


def test_incremental_rollup_checkpoint_carries_state_across_runs(spark, sf_small, tmp_path):
    from osarchiver_spark.streaming.pipeline import incremental_stream_rollup

    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ev = load_table(spark, sf_small, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    first.write.mode("append").parquet(landing)
    r1 = incremental_stream_rollup(spark, landing, out, ckpt)
    exp1 = first.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    assert {(r.window_start, r.event_type, r.n) for r in r1.collect()} == {
        (r.window_start, r.event_type, r.n) for r in exp1.collect()
    }

    # second drop: a NEW run against the same checkpoint must read
    # only the new file yet produce the rollup of EVERYTHING —
    # proving both the file-log exclusion and the carried agg state
    second.write.mode("append").parquet(landing)
    r2 = incremental_stream_rollup(spark, landing, out, ckpt)
    exp2 = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    assert {(r.window_start, r.event_type, r.n) for r in r2.collect()} == {
        (r.window_start, r.event_type, r.n) for r in exp2.collect()
    }
