"""Structured Streaming tests: the streaming operators must agree
with their batch twins on the same fixture data."""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# Property test: the provably-final trim of the outer interval joins.
# The cutoff formula (min over side watermarks, minus range, minus a
# safety margin) is hand-derived; sweep random event streams and
# range/watermark parameters and assert the trimmed streaming output
# equals an independently computed batch outer join on the same region.
# ---------------------------------------------------------------------------

def _write_events_file(dirname, events):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import timedelta

    base = datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(events)), pa.int64()),
            "ts": pa.array(
                [base + timedelta(hours=h) for _, _, h in events],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _ in events], pa.int64()),
            "event_type": pa.array([t for _, t, _ in events], pa.string()),
            "value": pa.array([1.0] * len(events), pa.float64()),
            "props": pa.array([""] * len(events), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(dirname, "events.parquet"))


def _batch_outer_reference(events, join_type, range_h, v_delay, p_delay, margin):
    """Pure-Python outer interval join + identical trim."""
    views = [(i, u, h) for i, (u, t, h) in enumerate(events) if t == "view"]
    purch = [(i, u, h) for i, (u, t, h) in enumerate(events) if t == "purchase"]
    rows = []
    matched_p = set()
    for vid, vu, vh in views:
        hit = False
        for pid, pu, ph in purch:
            if pu == vu and vh <= ph <= vh + range_h:
                rows.append((vid, pid, vu, vh, ph))
                matched_p.add(pid)
                hit = True
        if not hit:
            rows.append((vid, None, vu, vh, None))
    if join_type == "fullOuter":
        for pid, pu, ph in purch:
            if pid not in matched_p:
                rows.append((None, pid, pu, None, ph))
    max_v = max((h for _, _, h in views), default=None)
    max_p = max((h for _, _, h in purch), default=None)
    if max_v is None or max_p is None:
        # an empty input never advances the engine watermark: nothing
        # is provably final (mirrors outer_interval_join_stream)
        return []
    cutoff = min(max_v - v_delay, max_p - p_delay) - range_h - margin
    # leftOuter trims the view side only (matched purchases ride with
    # their final view); fullOuter also trims NULL-view purchase rows —
    # mirrors outer_interval_join_stream and the registered oracles
    kept = [
        r for r in rows
        if (r[3] is None or r[3] <= cutoff)
        and (join_type != "fullOuter" or r[4] is None or r[4] <= cutoff)
    ]
    return sorted(kept, key=_none_safe_key)


def _none_safe_key(row):
    return tuple((x is None, x if x is not None else 0) for x in row)


try:
    from hypothesis import HealthCheck, example, given, settings
    from hypothesis import strategies as st

    _EVENT = st.tuples(
        st.integers(min_value=1, max_value=3),
        st.sampled_from(["view", "purchase"]),
        st.integers(min_value=0, max_value=40),
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @example(  # all purchases unmatched; left vs full divergence
        events=[(1, "view", 0), (1, "purchase", 39), (2, "purchase", 1)],
        range_h=2, v_delay=2, p_delay=4, join_type="fullOuter",
    )
    @example(  # boundary: view exactly at the cutoff must be kept+final
        events=[(1, "view", 0), (1, "purchase", 1), (1, "view", 7), (1, "purchase", 20)],
        range_h=2, v_delay=2, p_delay=4, join_type="leftOuter",
    )
    @given(
        events=st.lists(_EVENT, min_size=4, max_size=16),
        range_h=st.sampled_from([2, 4]),
        v_delay=st.sampled_from([2, 4]),
        p_delay=st.sampled_from([4, 8]),
        join_type=st.sampled_from(["leftOuter", "fullOuter"]),
    )
    def test_outer_interval_join_trim_matches_batch(
        spark, events, range_h, v_delay, p_delay, join_type
    ):
        import tempfile
        from datetime import timedelta

        from osarchiver_spark.streaming.pipeline import outer_interval_join_stream

        d = tempfile.mkdtemp(prefix="oij_prop_")
        _write_events_file(d, events)
        got_rows = outer_interval_join_stream(
            spark, d, join_type,
            range_hours=range_h,
            view_delay_hours=v_delay,
            purchase_delay_hours=p_delay,
        ).collect()
        base = datetime(2024, 1, 1)

        def hours(ts):
            return None if ts is None else int((ts - base) / timedelta(hours=1))

        got = sorted(
            (
                (r["view_id"], r["purchase_id"], r["user_id"],
                 hours(r["view_ts"]), hours(r["purchase_ts"]))
                for r in got_rows
            ),
            key=_none_safe_key,
        )
        want = _batch_outer_reference(
            events, join_type, range_h, v_delay, p_delay, margin=1
        )
        assert got == want, (events, range_h, v_delay, p_delay, join_type)
except ImportError:  # hypothesis not installed: property test is optional
    pass


def test_streaming_reads_directory_layout_fixtures(spark, sf_small, tmp_path):
    """r07 regression pin: a fixture whose events.parquet is a
    Spark-written DIRECTORY of part files (the self-built sf1/sf10
    scale layout) must stream the same rows as the single-file driver
    layout — the glob-over-parent source silently read ZERO rows from
    directory tables until the sf1 parity sweep caught it."""
    import os

    from osarchiver_spark.streaming.pipeline import fixture_table_watch

    # dir-layout twin of the sf_small fixture
    dir_fixture = str(tmp_path / "dirsf")
    os.makedirs(dir_fixture)
    load_table(spark, sf_small, "events").write.parquet(
        os.path.join(dir_fixture, "events.parquet")
    )

    wd, glob = fixture_table_watch(sf_small, "events")
    assert (wd, glob) == (sf_small, "events.parquet")  # file layout: unchanged
    wd2, glob2 = fixture_table_watch(dir_fixture, "events")
    assert wd2.endswith("events.parquet") and glob2 is None  # dir layout

    want = streaming_tumbling_agg(spark, sf_small).count()
    got = streaming_tumbling_agg(spark, dir_fixture).count()
    assert want > 0 and got == want
