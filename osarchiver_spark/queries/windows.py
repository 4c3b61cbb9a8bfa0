"""Window / time-series queries over ``events`` (SURVEY §2.5, §2.9).

The reference is strictly batch with no window functions; these are
the Spark-native operators a complete engine needs. Streaming
variants (watermarked, stateful) live in osarchiver_spark/streaming;
here are the batch forms with exact DuckDB oracles — tumbling and
sliding windows are expressed by epoch arithmetic so the oracle is
plain ANSI SQL instead of Spark's window struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import cent_sum, exact_round, quantize
from osarchiver_spark.sources.parquet import load_table


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() dedup: each user's most recent event. Ties broken
    by event_id for determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum of value per user over time (frame: unbounded
    preceding → current)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(quantize(F.col("value"), 2)).over(w) / F.lit(100.0)).alias("running_value"),
    )


def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): inter-event gap in seconds per user."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.when(
            prev_ts.isNull(), F.lit(None).cast("double")
        ).otherwise(
            F.round(F.unix_micros(F.col("ts")) / 1e6 - F.unix_micros(prev_ts) / 1e6, 6)
        ).alias("gap_seconds"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session; report
    per-user session counts and the largest session length. Classic
    lag + cumulative-sum-of-boundaries — one shuffle on user_id, all
    window math stays in the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("session_id", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)))
    per_session = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window (30-min gap) per user — the engine's
    session operator (works unchanged under readStream + watermark;
    SURVEY §2.9). window.start = first event, window.end = last event
    + gap; the oracle rebuilds both via gaps-and-islands."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), cent_sum(F.col("value")).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation per event_type. Epoch-truncation
    form (identical to F.window(ts, '1 hour').start, but yields a
    plain timestamp column the oracle can reproduce)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_micros((F.floor(F.unix_micros("ts") / 3_600_000_000) * 3_600_000_000).cast("long"))
    return (
        ev.groupBy(bucket.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), cent_sum(F.col("value")).alias("sum_value"))
    )


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide): each event lands in
    2 buckets. Expressed as explode over the k=window/slide candidate
    starts — the same row-expansion Spark's F.window performs."""
    ev = load_table(spark, sf_dir, "events")
    slide_us = 30 * 60 * 1_000_000
    base = (F.floor(F.unix_micros("ts") / slide_us) * slide_us).cast("long")
    starts = F.array(base, base - F.lit(slide_us))
    return (
        ev.withColumn("window_start_us", F.explode(starts))
        .groupBy(F.timestamp_micros(F.col("window_start_us")).alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), cent_sum(F.col("value")).alias("sum_value"))
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event_type (rank over desc value)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", F.round("value", 4).alias("value"))
    )


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (§2.8 — absent in reference): pull props.k and
    aggregate it per event_type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, tie-inclusive — unlike ROWS): per
    user, sum of value over the trailing 1 hour of event time."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(quantize(F.col("value"), 2)).over(w) / F.lit(100.0)).alias("trailing_1h_value"),
    )


def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family: rank/dense_rank/ntile/percent_rank/
    cume_dist over order value per priority class."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (levenshtein is built into both
    engines): near-miss pairs among distinct event types."""
    ev = load_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    a = types.select(F.col("event_type").alias("type_a"))
    b = types.select(F.col("event_type").alias("type_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.levenshtein("type_a", "type_b").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 5)
    )


def q_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (§2.8): parse the JSON props column into
    map<string,bigint>, explode entries, aggregate per key."""
    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        "event_id", F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "value")
    )
    return entries.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling aggregation computed by Structured Streaming
    (watermark + window state, memory sink) — checked against the
    identical ANSI oracle as the batch form, proving batch/stream
    agreement."""
    from osarchiver_spark.streaming.pipeline import streaming_tumbling_agg

    return streaming_tumbling_agg(spark, sf_dir)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time lookup): each purchase event gets the
    most recent login of the same user at or before it. Composed
    union+window strategy (operators/asof.py) — one shuffle on
    user_id, no range explosion."""
    from osarchiver_spark.operators.asof import asof_join_union

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    logins = ev.filter(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("event_id").alias("login_id")
    )
    return asof_join_union(
        purchases,
        logins,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["login_id"],
        left_tiebreak="event_id",
        right_tiebreak="login_id",
    )


def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (events ⋈ customer⋈nation,
    broadcast) + hourly rollup per nation, computed by the streaming
    engine; oracle is the identical batch SQL."""
    from osarchiver_spark.streaming.pipeline import streaming_static_enrich

    return streaming_static_enrich(spark, sf_dir)


def q_streaming_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two availableNow runs over staged file drops with one shared
    checkpoint: run 2 reads only the new file and merges it into the
    carried window state; oracle = batch rollup over everything."""
    from osarchiver_spark.streaming.pipeline import streaming_incremental_rollup

    return streaming_incremental_rollup(spark, sf_dir)


def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows computed by the streaming engine; same oracle
    as the batch sliding query."""
    from osarchiver_spark.streaming.pipeline import streaming_sliding_agg

    return streaming_sliding_agg(spark, sf_dir)


def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (views → purchases within 4h per
    user) computed by the streaming engine; checked against the batch
    interval-join SQL."""
    from osarchiver_spark.streaming.pipeline import streaming_interval_join

    return streaming_interval_join(spark, sf_dir)


def q_streaming_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join (views with or without a
    following-4h purchase), trimmed to the watermark-final region;
    checked against the batch left-join SQL with the same cutoff."""
    from osarchiver_spark.streaming.pipeline import streaming_outer_interval_join

    return streaming_outer_interval_join(spark, sf_dir)


def q_streaming_full_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join, trimmed per side to the
    watermark-final region; checked against the batch full-outer SQL
    with identical trims."""
    from osarchiver_spark.streaming.pipeline import streaming_full_outer_interval_join

    return streaming_full_outer_interval_join(spark, sf_dir)


def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows merged by the streaming engine's session state
    machine; same gaps-and-islands oracle as the batch session_window
    query."""
    from osarchiver_spark.streaming.pipeline import streaming_session_agg

    return streaming_session_agg(spark, sf_dir)


def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the hypertable/continuous-aggregate
    shape): per event_type, a dense hourly grid between that type's
    first and last hour, LEFT-joined to the hourly rollup, missing
    buckets forward-filled with the last observed value. Grid
    generation is sequence+explode off a 5-row bounds aggregate —
    the grid is |types|×|hours| rows, never a data×data product; the
    fill is one running window per type."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (
        ev.select(F.col("event_type"), hour.alias("h"), F.col("value"))
        .groupBy("event_type", "h")
        .agg(cent_sum(F.col("value")).alias("v_raw"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    joined = grid.join(hourly, ["event_type", "h"], "left")
    w = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    return joined.select(
        "event_type",
        "h",
        "v_raw",
        F.last("v_raw", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v_raw").isNull().alias("is_gap"),
    )


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of value per user: each
    observation is held until the user's next event, so its weight is
    that holding interval in microseconds (the last observation gets
    zero weight — the standard left-closed convention). One lead()
    window per user plus a re-agg.

    Determinism: the numerator is an EXACT integer sum — value is
    2-dp cents, so cents*w_us is an exact integer per row, summed as
    DECIMAL(38,0) (hugeint in the oracle; cent-microseconds overflow
    int64 past ~9e18, i.e. a high-value user observed for years).
    The old sum(value*w_us) summed ~1e17-magnitude doubles in an
    engine/partition-dependent order before the 6-dp round. The final
    ratio is one fixed-order IEEE expression over the exact sums."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    held_us = F.unix_micros(nxt) - F.unix_micros(F.col("ts"))
    weighted = ev.select(
        "user_id", quantize(F.col("value"), 2).alias("cents"), held_us.alias("w_us")
    ).filter(F.col("w_us").isNotNull())
    num = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("w_us"))
    den = F.sum("w_us")
    return weighted.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        den.alias("observed_us"),
        exact_round(
            num.cast("double") / (den.cast("double") * F.lit(100.0)), 6
        ).alias("twap"),
    )


QUERIES = {
    "time_weighted_avg": q_time_weighted_avg,
    "gapfill_hourly": q_gapfill_hourly,
    "streaming_tumbling": q_streaming_tumbling,
    "streaming_static_enrich": q_streaming_static_enrich,
    "streaming_incremental_rollup": q_streaming_incremental_rollup,
    "streaming_sliding": q_streaming_sliding,
    "streaming_interval_join": q_streaming_interval_join,
    "streaming_outer_interval_join": q_streaming_outer_interval_join,
    "streaming_full_outer_interval_join": q_streaming_full_outer_interval_join,
    "streaming_session_window": q_streaming_session_window,
    "asof_join": q_asof_join,
    "session_window": q_session_window,
    "latest_event_per_user": q_latest_event_per_user,
    "running_sum": q_running_sum,
    "lag_delta": q_lag_delta,
    "sessionize": q_sessionize,
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "topk_per_group": q_topk_per_group,
    "json_props": q_json_props,
    "map_entries": q_map_entries,
    "range_frame": q_range_frame,
    "rank_functions": q_rank_functions,
    "fuzzy_match": q_fuzzy_match,
}

ORACLES = {
    "gapfill_hourly": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS v_raw
            FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
        grid AS (
            SELECT event_type, unnest(range(h0, h1 + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS h
            FROM b)
        SELECT g.event_type, g.h, hourly.v_raw,
               last_value(hourly.v_raw IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
               hourly.v_raw IS NULL AS is_gap
        FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h
    """,
    "streaming_interval_join": """
        SELECT v.event_id AS view_id, p.event_id AS purchase_id,
               v.user_id, v.ts AS view_ts, p.ts AS purchase_ts
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 4 HOUR
    """,
    "time_weighted_avg": """
        WITH s AS (
            SELECT user_id,
                   CAST(floor(value * 100.0 + 0.5) AS HUGEINT) AS cents,
                   epoch_us(lead(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                       - epoch_us(ts) AS w_us
            FROM events)
        SELECT user_id,
               count(*) AS n_intervals,
               CAST(sum(w_us) AS BIGINT) AS observed_us,
               floor(CAST(sum(cents * w_us) AS DOUBLE)
                     / (CAST(sum(w_us) AS DOUBLE) * 100.0)
                     * 1000000.0 + 0.5) / 1000000.0 AS twap
        FROM s WHERE w_us IS NOT NULL
        GROUP BY user_id
    """,
    "streaming_outer_interval_join": """
        WITH cut AS (
            -- NULL-propagating: a side with no rows never advances the
            -- engine watermark, so nothing is provably final
            SELECT CASE WHEN max(CASE WHEN event_type = 'view' THEN ts END) IS NULL
                          OR max(CASE WHEN event_type = 'purchase' THEN ts END) IS NULL
                        THEN NULL
                        ELSE least(
                           max(CASE WHEN event_type = 'view' THEN ts END)
                               - INTERVAL 4 HOUR,
                           max(CASE WHEN event_type = 'purchase' THEN ts END)
                               - INTERVAL 8 HOUR)
                       - INTERVAL 5 HOUR END AS cutoff
            FROM events)
        SELECT v.event_id AS view_id, p.event_id AS purchase_id,
               v.user_id, v.ts AS view_ts, p.ts AS purchase_ts
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 4 HOUR
        WHERE v.ts <= (SELECT cutoff FROM cut)
    """,
    "streaming_full_outer_interval_join": """
        WITH cut AS (
            -- NULL-propagating: a side with no rows never advances the
            -- engine watermark, so nothing is provably final
            SELECT CASE WHEN max(CASE WHEN event_type = 'view' THEN ts END) IS NULL
                          OR max(CASE WHEN event_type = 'purchase' THEN ts END) IS NULL
                        THEN NULL
                        ELSE least(
                           max(CASE WHEN event_type = 'view' THEN ts END)
                               - INTERVAL 4 HOUR,
                           max(CASE WHEN event_type = 'purchase' THEN ts END)
                               - INTERVAL 8 HOUR)
                       - INTERVAL 5 HOUR END AS cutoff
            FROM events)
        SELECT v.event_id AS view_id, p.event_id AS purchase_id,
               coalesce(v.user_id, p.user_id) AS user_id,
               v.ts AS view_ts, p.ts AS purchase_ts
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 4 HOUR
        WHERE (v.ts IS NULL OR v.ts <= (SELECT cutoff FROM cut))
          AND (p.ts IS NULL OR p.ts <= (SELECT cutoff FROM cut))
    """,
    "asof_join": """
        WITH u AS (
            SELECT user_id, ts, event_id AS tb, 1 AS side,
                   event_id, ts AS l_ts, NULL::BIGINT AS r_login
            FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, event_id AS tb, 0 AS side,
                   NULL::BIGINT, NULL::TIMESTAMP, event_id
            FROM events WHERE event_type = 'login'),
        c AS (
            SELECT *, last_value(r_login IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, side, tb
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS asof_login_id
            FROM u)
        SELECT event_id, user_id, l_ts AS ts, asof_login_id
        FROM c WHERE side = 1
    """,
    "streaming_sliding": """
        WITH expanded AS (
            SELECT unnest([
                       CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) * 1800000000,
                       CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) * 1800000000 - 1800000000
                   ]) AS window_start_us,
                   event_type, value
            FROM events)
        SELECT make_timestamp(window_start_us) AS window_start, event_type,
               count(*) AS n, sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM expanded GROUP BY 1, 2
    """,
    "streaming_tumbling": """
        SELECT make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000)
                   AS window_start,
               event_type, count(*) AS n, sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "streaming_static_enrich": """
        SELECT make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000)
                   AS window_start,
               n_name AS nation, count(*) AS n, sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM events
        JOIN customer ON user_id = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    "streaming_incremental_rollup": """
        SELECT make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000)
                   AS window_start,
               event_type, count(*) AS n, sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, ts, event_type, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1
    """,
    "running_sum": """
        SELECT user_id, event_id,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                   AS running_value
        FROM events
    """,
    "lag_delta": """
        SELECT user_id, event_id,
               round(epoch_us(ts) / 1e6 - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) / 1e6, 6)
                   AS gap_seconds
        FROM events
    """,
    "session_window": """
        WITH gaps AS (
            SELECT user_id, ts, event_id, value,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap
            FROM events),
        marked AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess
            FROM gaps),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM marked)
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM sessions GROUP BY user_id, session_id
    """,
    "sessionize": """
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap
            FROM events),
        marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess
            FROM gaps),
        sessions AS (
            SELECT user_id,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM marked),
        per_session AS (
            SELECT user_id, session_id, count(*) AS n_events
            FROM sessions GROUP BY user_id, session_id)
        SELECT user_id, count(*) AS n_sessions,
               CAST(max(n_events) AS BIGINT) AS max_session_events
        FROM per_session GROUP BY user_id
    """,
    "tumbling_window": """
        SELECT make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000)
                   AS window_start,
               event_type, count(*) AS n, sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "sliding_window": """
        WITH expanded AS (
            SELECT unnest([
                       CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) * 1800000000,
                       CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) * 1800000000 - 1800000000
                   ]) AS window_start_us,
                   event_type, value
            FROM events)
        SELECT make_timestamp(window_start_us) AS window_start, event_type,
               count(*) AS n, sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        FROM expanded GROUP BY 1, 2
    """,
    "topk_per_group": """
        SELECT event_type, rk, event_id, round(value, 4) AS value FROM (
            SELECT event_type, event_id, value,
                   CAST(row_number() OVER (
                       PARTITION BY event_type ORDER BY value DESC, event_id) AS INT) AS rk
            FROM events) WHERE rk <= 3
    """,
    "range_frame": """
        SELECT user_id, event_id,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) / 100.0
                   AS trailing_1h_value
        FROM events
    """,
    "rank_functions": """
        SELECT o_orderkey, o_orderpriority,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "fuzzy_match": """
        WITH t AS (SELECT DISTINCT event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(levenshtein(a.event_type, b.event_type) AS INT) AS edit_distance
        FROM t a JOIN t b ON a.event_type < b.event_type
        WHERE levenshtein(a.event_type, b.event_type) <= 5
    """,
    "map_entries": """
        WITH entries AS (
            SELECT event_id, unnest(json_keys(props)) AS key,
                   CAST(json_extract_string(props, '$.' || unnest(json_keys(props))) AS BIGINT)
                       AS value
            FROM events)
        SELECT key, count(*) AS n,
               CAST(sum(value) AS BIGINT) AS sum_value,
               min(value) AS min_value, max(value) AS max_value
        FROM entries GROUP BY key
    """,
    "json_props": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
}

# The streaming session operator must agree with the batch one —
# both adjudicate against the identical gaps-and-islands SQL.
ORACLES["streaming_session_window"] = ORACLES["session_window"]
