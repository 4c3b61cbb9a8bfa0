"""Behavioral / distribution analytics over ``events`` and
``documents`` — the product-analytics and pipeline-diagnostics layer
a complete engine ships next to its relational core (SURVEY §2.4/§2.5
aggregation + window completion; no reference counterpart — the
reference is archival-only).

Scale notes (100 TB):
- funnel + cohort both hash-partition on ``user_id`` once and keep
  every later join/agg on that same key, so Catalyst reuses the
  exchange instead of re-shuffling; nothing is ordered globally.
- key_skew_report is the diagnostic you run BEFORE picking join
  strategies: one map-combinable count agg, a single-row global stat
  broadcast back, top-k via order+limit (TakeOrderedAndProject — no
  full sort).
- curriculum binning derives its quartile boundaries with a one-row
  exact-percentile aggregate broadcast into the scan-side CASE; no
  global ntile() window (which would serialize the corpus through a
  single partition — the anti-pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import (
    cent_sum,
    exact_round,
    pinned_ln,
    quantize,
    sql_double,
    sql_exact_round,
    sql_pinned_ln_series,
    sql_pinned_ln_tower,
    sql_pinned_ln_z,
    sql_quantize,
)
from osarchiver_spark.operators.quantiles import sql_exact_quantile_nums
from osarchiver_spark.functions.text import token_count
from osarchiver_spark.sources.parquet import load_table

_SQL_N_TOKENS = "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''))"


def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts at a stage only with an event at-or-after their previous
    stage's first event. Three min-aggregates chained by user_id
    equi-joins — one shuffle key throughout."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_view = views.agg(F.count("*").alias("n_view"))
    n_click = clicks.agg(F.count("*").alias("n_click"))
    n_purchase = purchases.agg(F.count("*").alias("n_purchase"))
    return (
        n_view.crossJoin(n_click)
        .crossJoin(n_purchase)
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.round(F.col("n_click") / F.col("n_view") * 100, 4).alias("click_pct"),
            F.round(F.col("n_purchase") / F.col("n_view") * 100, 4).alias("purchase_pct"),
        )
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix: users cohorted by first-event
    day; each (cohort_day, day_offset) cell counts distinct users
    active that many days later. First-touch agg + self-join + count
    distinct — all partitioned by user_id / small output."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter / skew diagnostic over a join key (o_custkey):
    top-10 keys by row count with their share of the table and ratio
    to the mean key width — what decides salting vs AQE skew-join
    before a 100 TB shuffle. Count agg (map-side combine) + one-row
    stats broadcast + TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    stats = cnt.agg(
        F.sum("cnt").alias("total_rows"), F.avg("cnt").alias("mean_cnt")
    )
    return (
        cnt.crossJoin(F.broadcast(stats))
        .select(
            "o_custkey",
            "cnt",
            F.round(F.col("cnt") / F.col("total_rows") * 100, 6).alias("share_pct"),
            F.round(F.col("cnt") / F.col("mean_cnt"), 6).alias("ratio_to_mean"),
        )
        .orderBy(F.col("cnt").desc(), "o_custkey")
        .limit(10)
    )


def q_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: documents assigned to 4 length buckets by
    exact token-count quartiles. Boundaries come from a one-row
    quantile aggregate broadcast into the CASE — not a global
    ntile() window.

    r07 hardening: the quartile boundaries are EXACT integer-rational
    order statistics (operators/quantiles.py), not interpolated
    doubles — a bucket-edge comparison against a float quantile flips
    for any count within an ulp of the band, the engine-arithmetic
    class the sf1 sweep demonstrated on winsorize_events. The
    comparison ``t <= q`` becomes the integer ``t*den <= num``."""
    from osarchiver_spark.operators.quantiles import exact_quantile_nums

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    bounds = exact_quantile_nums(
        sized.select(F.lit(1).alias("g"), "n_tokens"),
        "g",
        "n_tokens",
        {"q1": (1, 4), "q2": (2, 4), "q3": (3, 4)},
    )
    t4 = F.col("n_tokens") * F.lit(4)
    bucket = (
        F.when(t4 <= F.col("q1_num"), 1)
        .when(t4 <= F.col("q2_num"), 2)
        .when(t4 <= F.col("q3_num"), 3)
        .otherwise(4)
    )
    return (
        sized.crossJoin(F.broadcast(bounds.drop("g")))
        .select("doc_id", "n_tokens", bucket.cast("int").alias("bucket"))
    )


def q_winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped outlier clipping (winsorization): event values clipped
    to their event_type's exact [p05, p95] band — the robust-stats
    pre-step before numeric feature extraction.

    r07 hardening (found by the sf1 parity sweep): the band was
    ``percentile(value, q)``, whose double interpolation is engine-
    order-specific in the last ulp — at sf1 one event sat exactly on
    the p95 interpolation and the engines disagreed on
    ``was_clipped``. The band is now the EXACT rational order
    statistic (operators/quantiles.py) over the value's intrinsic
    cent grid: clip flags are pure integer comparisons
    (``c·20 < p05_num``), and the winsorized value is one exact-int →
    double cast + one IEEE division (the 1/20-cent band grid IS the
    4-dp grid: num·5 is the value in 1e-4 dollars). Same linear-
    interpolation definition (Hyndman-Fan 7 — what quantile_cont
    computes), now bit-identical across engines by construction.
    Scale shape: the quantile pass is a map-combinable histogram agg
    (one row per DISTINCT cent value) + a window over the histogram —
    a measured ~1.8x constant-factor cost vs engine percentile at sf10
    (BENCH_SF10_QUANTILES.json; percentile is count-map-based too),
    paid for bit-identity plus a distributed, spillable histogram
    instead of percentile's single per-group buffer."""
    from osarchiver_spark.operators.quantiles import exact_quantile_nums

    ev = load_table(spark, sf_dir, "events")
    evc = ev.select(
        "event_id", "event_type", "value", quantize(F.col("value"), 2).alias("c")
    )
    bands = exact_quantile_nums(
        evc.select("event_type", "c"),
        "event_type",
        "c",
        {"p05": (1, 20), "p95": (19, 20)},
    )
    c20 = F.col("c") * F.lit(20)
    clipped20 = F.least(F.greatest(c20, F.col("p05_num")), F.col("p95_num"))
    return (
        evc.join(F.broadcast(bands), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            ((clipped20 * F.lit(5)).cast("double") / F.lit(10000.0)).alias(
                "value_winsorized"
            ),
            ((c20 < F.col("p05_num")) | (c20 > F.col("p95_num"))).alias(
                "was_clipped"
            ),
        )
    )


_ROLLUP_SPLIT = "2024-01-15"


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a stored daily rollup built
    from history (ts < split) is MERGED with the partial rollup of a
    newly-arrived batch (ts >= split) using only mergeable aggregate
    state (count/sum/min/max; avg re-derived from sum/count) — the
    continuous-aggregate refresh pattern where new data never forces
    a recompute of history. The oracle is the full recompute over all
    data, so the hash match IS the proof that merge(state, delta) ==
    recompute. Both phases are map-combinable hash aggs on the same
    (event_type, day) key; the merge is a groupBy over their union —
    partition-aligned, no window, no join."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_ROLLUP_SPLIT).cast("timestamp")

    def rollup(part: DataFrame) -> DataFrame:
        return part.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(
            F.count("*").alias("n"),
            F.sum(quantize(F.col("value"), 2)).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )

    state = rollup(ev.filter(F.col("ts") < split))
    delta = rollup(ev.filter(F.col("ts") >= split))
    merged = (
        state.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        "n",
        (F.col("sum_v") / F.lit(100.0)).alias("sum_value"),
        F.round("min_v", 4).alias("min_value"),
        F.round("max_v", 4).alias("max_value"),
        # no derived avg column: avg = sum/n is recomputable by the
        # consumer, and cross-engine decimal-rounding of a quotient
        # can land exactly on a .00005 tie (sum/min/max/n carry the
        # merge proof)
    )


def q_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: baskets are (user, day);
    for every unordered event-type pair, how many baskets contain
    both, and the lift vs independence. The pair space is a self
    equi-join on the basket key of the DISTINCT (basket, type) set —
    at most |types| rows per basket, so the join fan-out is bounded by
    |types|² per basket, never |events|². Type marginals and the
    basket total ride in as broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    total = baskets.select("user_id", "day").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    marg = baskets.groupBy("event_type").agg(F.count("*").alias("n_t"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(marg.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix: P(next type | type) from
    each user's time-ordered stream — the sequence-mining summary
    behind next-event prediction and anomaly scoring. One lead()
    window per user (single shuffle on user_id), then a count agg over
    the (from, to) pair with the from-marginal broadcast back for the
    row-normalized probability."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    marg = counts.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(marg), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("n_from"), 6).alias("p"),
        )
    )


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-event sequences across user
    streams (the n-gram generalization of markov_transitions). Two
    lead() offsets over the same per-user window — one shuffle — then
    a count agg and TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        steps.groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(10)
    )


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly flagging: events whose value sits more than 3
    population standard deviations from their type's mean. Per-type
    moments are one map-combinable agg over the low-cardinality key,
    broadcast back into the scan-side predicate.

    Determinism: the moments are integer sums of value-in-cents (and
    its square) — a raw double avg/stddev_pop is accumulation-order-
    sensitive across engines, and a last-ulp shift in sigma can flip
    MEMBERSHIP at the |z| > 3 boundary, not just a rounded digit.
    From the exact bigint moments, mu/sigma/z are fixed-order IEEE
    expressions (identical doubles everywhere); sigma > 0 guards the
    constant-valued type (z would be 0/0 = NaN, and NaN orders
    differently in Spark vs DuckDB comparisons)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_c", F.round(F.col("value") * 100).cast("long")
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_c").alias("s1"),
        F.sum(F.col("v_c") * F.col("v_c")).alias("s2"),
    )
    mu_c = F.col("s1") / F.col("n")
    # non-negativity clamp: once s2 exceeds 2^53 the long->double
    # conversion is inexact and a near-constant type can make the
    # operand slightly negative — Spark would yield NaN (which passes
    # both predicates, NaN ordering) while DuckDB raises on sqrt(<0).
    # Same guard as q_embedding_outliers.
    sigma_c = F.sqrt(F.greatest(F.col("s2") / F.col("n") - mu_c * mu_c, F.lit(0.0)))
    z = (F.col("v_c") - mu_c) / sigma_c
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((sigma_c > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            exact_round(z, 4).alias("zscore"),
        )
    )


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day: distinct users seen
    in [day-6, day]. Spark window frames can't COUNT DISTINCT over a
    range, so the scale-correct form is: dedup to (user, day) once,
    equi-join against the distinct day grid on a bounded 0..6 day gap
    (fan-out ≤ 7 per row), re-count distinct. No window over the fact
    table, every step a hash agg or equi-range join."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct().select(F.col("day").alias("as_of"))
    return (
        ud.join(
            F.broadcast(days),
            (F.datediff(F.col("as_of"), F.col("day")) >= 0)
            & (F.datediff(F.col("as_of"), F.col("day")) <= 6),
        )
        .groupBy("as_of")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


N_BINS = 20


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of value per event type (profiling
    depth beyond min/max/null counts): 20 bins spanning the type's
    [min, max], the top value folded into the last bin. One moments
    aggregate broadcast into a codegen bin expression, one count agg —
    no sort, no window."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / N_BINS
    bin_ = F.least(
        F.floor((F.col("value") - F.col("mn")) / width), F.lit(N_BINS - 1)
    ).cast("int")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", bin_.alias("bin"))
        .agg(F.count("*").alias("n"))
    )


def q_time_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup in ONE pass: daily, weekly and
    monthly event counts/sums computed together via GROUPING SETS —
    one scan + one Expand + one shuffle instead of three separate
    aggregations (the hypertable continuous-aggregate ladder). The
    granularity tag comes from grouping() flags, so rows are
    self-describing."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("w"),
        F.date_trunc("month", "ts").alias("m"),
        "value",
    ).createOrReplaceTempView("_ev_time")
    return spark.sql(
        """
        SELECT CASE WHEN grouping(d) = 0 THEN 'day'
                    WHEN grouping(w) = 0 THEN 'week'
                    ELSE 'month' END AS granularity,
               coalesce(d, w, m) AS bucket,
               count(*) AS n,
               -- 100.0D: a bare 100.0 literal is DECIMAL in Spark SQL
               -- (the DataFrame API's F.lit(100.0) is DOUBLE), and
               -- BIGINT/DECIMAL division would yield DECIMAL output
               (sum(CAST(floor(value * 100.0D + 0.5D) AS BIGINT)) / 100.0D) AS sum_value
        FROM _ev_time
        GROUP BY GROUPING SETS ((d), (w), (m))
        """
    )


def q_event_time_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing diagnostic: how out-of-order does event time
    arrive, per user? Arrival order is event_id (the ingestion
    sequence); an event is late if its ts is behind the running max
    ts seen so far, and its disorder is that gap. The per-user p-max
    of this gap IS the watermark delay a streaming job needs. One
    running-max window per user (single shuffle), integer microsecond
    arithmetic throughout."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    prev_max = F.max(F.unix_micros(F.col("ts"))).over(w)
    gap_us = F.greatest(F.lit(0), prev_max - F.unix_micros(F.col("ts")))
    per_event = ev.select("user_id", gap_us.alias("late_us")).filter(
        F.col("late_us").isNotNull()
    )
    return per_event.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_out_of_order"),
        (F.max("late_us") / F.lit(1_000_000)).alias("max_disorder_s"),
    )


def q_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day movement per event type: today's count next to
    yesterday's and the integer delta — lag() composed OVER an
    aggregate (the rollup-then-window layering), all integer outputs
    so no cross-engine float rounding exists at all. The window runs
    on the |types|×|days| rollup, never the fact table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("n").over(w)
    return daily.select(
        "event_type",
        "day",
        "n",
        prev.alias("prev_n"),
        (F.col("n") - prev).alias("delta"),
    )


def q_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) report: customers ranked into
    revenue deciles, each decile's size and revenue share inputs
    (integer count + rounded sum; the reader derives percentages).
    The ntile window runs over the CUSTOMER aggregate — dimension
    cardinality, not the fact table — which is the acceptable global
    sort; the fact-table pass is one hash agg."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(quantize(F.col("o_totalprice"), 2)).alias("rev_c")
    )
    w = W.orderBy(F.col("rev_c").desc(), "o_custkey")
    return (
        per_cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum("rev_c") / F.lit(100.0)).alias("decile_revenue"),
        )
    )


def q_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal activity profile: event counts and value sums per
    (hour of day, event type) — the seasonality fingerprint used for
    anomaly baselines and load forecasting. Pure hash agg on derived
    integer keys."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            cent_sum(F.col("value")).alias("sum_value"),
        )
    )


def q_user_activity_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the event stream: how many users
    produced exactly N events (bucketed to powers of two above 16 so
    the tail stays readable) — the first diagnostic for bot detection
    and per-key state sizing. Two chained hash aggs (user → count,
    count-bucket → users), both map-combinable; integer-only output."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    # integer comparisons only — a float log2 would put exact powers
    # of two on a cross-engine rounding boundary
    n = F.col("n_events")
    bucket = F.when(n <= 16, n)
    for p in (32, 64, 128, 256, 512, 1024, 2048, 4096):
        bucket = bucket.when(n <= p, F.lit(p))
    bucket = bucket.otherwise(F.lit(8192)).cast("long")
    return (
        per_user.select(bucket.alias("events_bucket"))
        .groupBy("events_bucket")
        .agg(F.count("*").alias("n_users"))
    )


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is attributed
    to the SAME USER's most recent click at-or-before it (ties →
    highest click id), kept only when that click is within the 7-day
    lookback; revenue then rolls up per click campaign (the ``k``
    property of the click's props JSON).

    Composition, not new machinery: the point-in-time lookup is the
    as-of union+window operator (operators/asof.py — one shuffle on
    user_id, no range explosion), the lookback is a post-filter
    (correct because the as-of match is the globally most recent
    click: if IT is outside the window, no in-window click exists),
    and the rollup is one map-combinable agg."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.get_json_object("props", "$.k").cast("int").alias("campaign"),
        F.col("ts").alias("click_ts"),
    )
    from osarchiver_spark.operators.asof import asof_join_union

    attributed = asof_join_union(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["campaign", "click_ts", "click_id"],
        left_tiebreak="event_id",
        right_tiebreak="click_id",
    ).filter(
        F.col("asof_click_ts").isNotNull()
        & (F.col("ts") <= F.col("asof_click_ts") + F.expr("INTERVAL 7 DAYS"))
    )
    return attributed.groupBy(F.col("asof_campaign").alias("campaign")).agg(
        F.count("*").alias("n_purchases"),
        cent_sum(F.col("value")).alias("revenue"),
    )


def q_distinct_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users per event type computed FROM THE DAILY
    PARTIAL — the mergeable-state form of COUNT DISTINCT.

    Plain count-distinct partials don't merge (distinct-of-distincts
    over-merges); the mergeable state is the deduplicated
    (day, type, user) relation, which a real pipeline maintains
    incrementally (yesterday's partial is never rescanned). The
    weekly rollup re-deduplicates only that partial. The oracle
    computes the weekly numbers DIRECTLY from raw events — the hash
    match proves merge-from-partial == recompute, the same guarantee
    incremental_rollup pins for sums."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        "user_id",
    ).distinct()
    return daily.groupBy(
        F.date_trunc("week", F.col("day")).alias("week"), "event_type"
    ).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_user_days"),
    )


KMV_K = 32  # k-minimum-values sketch width


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting with a DETERMINISTIC, mergeable
    sketch: KMV (k-minimum-values). Keep the k smallest md5-uniform
    hashes of the key per group; the kth smallest fraction h_k gives
    the estimate (k-1)/h_k (fewer than k distinct hashes → the sketch
    IS the exact count). Unlike HLL (`approx_sketches`, whose
    engine-specific registers can't cross-check), KMV is pure
    hash+order arithmetic, so DuckDB reproduces it bit-for-bit and
    the estimator itself gets an exact oracle row — alongside the
    exact count for error inspection. Merge discipline mirrors
    distinct_rollup_merge: the union of two groups' k-min sets,
    re-truncated to k, is the sketch of the union — sketches compose
    upward, counted estimates do not."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(float(1 << 32))
    hashes = ev.select("event_type", u.alias("u")).distinct()
    w = W.partitionBy("event_type").orderBy("u")
    ranked = hashes.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy("event_type").agg(
        F.count("*").alias("n_seen"),
        F.max(F.when(F.col("rk") == KMV_K, F.col("u"))).alias("h_k"),
    )
    est = F.when(F.col("n_seen") < KMV_K, F.col("n_seen").cast("double")).otherwise(
        (KMV_K - 1) / F.col("h_k")
    )
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_exact"))
    return agg.join(exact, "event_type").select(
        "event_type", "n_exact", F.round(est, 4).alias("kmv_estimate")
    )


def q_streaming_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-carried streaming KMV sketch; see
    streaming/sketch.py. The oracle is the batch estimator over ALL
    events — it matches only if run 2 merged its drop into run 1's
    carried k-min sets correctly."""
    from osarchiver_spark.streaming.sketch import streaming_kmv_registry

    return streaming_kmv_registry(spark, sf_dir)



PSI_BINS = 20


def psi_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared first four stages of the PSI pipeline — (event_type,
    bin, n_ref, n_cur, r_tot, c_tot, n_bins, p_ref, p_cur) per
    occupied cell. Factored out so the r07 decomposition probes
    (queries/probes.py: probe_psi_cells / probe_psi_ln_terms) bisect
    the EXACT stages q_psi_drift runs, not a reimplementation."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_micros(F.col("ts")).alias("us")
    )
    span = ev.agg(F.min("us").alias("t0"), F.max("us").alias("t1"))
    tagged = ev.crossJoin(F.broadcast(span)).withColumn(
        "is_cur", F.col("us") * 2 > F.col("t0") + F.col("t1")
    )
    stats = tagged.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    # constant-valued type guard: mx == mn makes the width 0 and
    # (value-mn)/width = 0/0 = NaN, whose floor/least ordering is
    # engine-specific — pin such types to bin 0 (oracle does the same)
    width = (F.col("mx") - F.col("mn")) / PSI_BINS
    bin_ = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / width), F.lit(PSI_BINS - 1)
            )
        )
        .cast("int")
    )
    cells = (
        tagged.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.sum(F.when(F.col("is_cur"), 0).otherwise(1)).alias("n_ref"),
            F.sum(F.when(F.col("is_cur"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n_ref").alias("r_tot"),
        F.sum("n_cur").alias("c_tot"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    j = cells.join(F.broadcast(totals), "event_type")
    p_ref = (F.col("n_ref") + 0.5) / (F.col("r_tot") + 0.5 * F.col("n_bins"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("c_tot") + 0.5 * F.col("n_bins"))
    return j.withColumn("p_ref", p_ref).withColumn("p_cur", p_cur)


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: per event type,
    compare the value distribution of the SECOND half of the time
    range against the first (reference) half over the type's
    equi-width bins — the ingest-monitoring check that catches a
    upstream change before it poisons a training snapshot. One-row
    global time span + per-type moments broadcast into the scan,
    conditional counts per (type, bin), Laplace-smoothed shares over
    the occupied bins, one map-combinable PSI sum. Nothing leaves
    codegen.

    Cross-engine hash discipline (driver-r04 hash-fail fix): each
    per-bin PSI term is quantized onto a 1e-9 bigint grid BEFORE the
    per-type sum, so the sum is exact integer arithmetic and immune
    to accumulation order (Spark partial aggregation vs DuckDB
    single-threaded); the 6-dp output is then derived from the
    integer sum with pure integer/IEEE ops — no decimal ``round`` on
    a double anywhere, which is the HALF_UP-vs-exact-expansion
    boundary where the engines disagree (functions/precision.py)."""
    j = psi_probs(spark, sf_dir)
    p_ref, p_cur = F.col("p_ref"), F.col("p_cur")
    # Driver-r05 hash-fail fix (2nd round): the output is now BIGINT
    # micro-units end-to-end — integers hash identically under ANY
    # engine build or float canonicalization, which two rounds of
    # locally-bit-exact float discipline could not guarantee for the
    # driver's (unobservable) oracle stack. PSI terms are >= 0
    # (factors share sign), so floor(x*1e9+0.5) is plain half-up; the
    # bigint sum is order-proof; (sum+500) div 1000 rescales to
    # micro-units in exact integer arithmetic.
    #
    # Driver-r06 hash-fail fix (3rd round): the libm ln is GONE.
    # Rounds 4-6 pre-rounded F.log onto a 1e-6 grid, but a 1-ulp
    # Java-Math.log-vs-driver-libm disagreement can still straddle
    # the grid boundary deterministically at data-dependent
    # arguments (probe_ln2 pinned only ln(2)). pinned_ln computes
    # ln from sqrt/+/-/×/÷ only — every op correctly rounded per
    # IEEE-754 in both engines, so query and oracle are bit-identical
    # BY CONSTRUCTION; the 1e-6 exact_round is kept so psi terms sit
    # on the same grid as before (~1e-11 worst-case accuracy loss vs
    # libm, 5 orders below the grid).
    ln_g = exact_round(pinned_ln(p_cur / p_ref), 6)
    term_q = quantize((p_cur - p_ref) * ln_g, 9)
    return j.groupBy("event_type").agg(
        F.max("r_tot").alias("n_ref"),
        F.max("c_tot").alias("n_cur"),
        F.max("n_bins").cast("int").alias("n_bins"),
        F.floor((F.sum(term_q) + F.lit(500)) / F.lit(1000))
        .cast("long")
        .alias("psi_micro"),
    )


QUERIES = {
    "kmv_distinct": q_kmv_distinct,
    "psi_drift": q_psi_drift,
    "streaming_kmv": q_streaming_kmv,
    "user_activity_distribution": q_user_activity_distribution,
    "attribution_last_touch": q_attribution_last_touch,
    "distinct_rollup_merge": q_distinct_rollup_merge,
    "revenue_pareto": q_revenue_pareto,
    "hour_of_day_profile": q_hour_of_day_profile,
    "daily_delta": q_daily_delta,
    "event_time_disorder": q_event_time_disorder,
    "time_rollup_multi": q_time_rollup_multi,
    "value_histogram": q_value_histogram,
    "funnel_analysis": q_funnel_analysis,
    "cohort_retention": q_cohort_retention,
    "key_skew_report": q_key_skew_report,
    "quality_curriculum": q_quality_curriculum,
    "winsorize_events": q_winsorize_events,
    "incremental_rollup": q_incremental_rollup,
    "event_cooccurrence": q_event_cooccurrence,
    "markov_transitions": q_markov_transitions,
    "session_paths": q_session_paths,
    "zscore_outliers": q_zscore_outliers,
    "rolling_active_users": q_rolling_active_users,
}

ORACLES = {
    "kmv_distinct": f"""
        WITH hashes AS (
            SELECT DISTINCT event_type,
                   (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                         AS UBIGINT) + 1) / 4294967296.0 AS u
            FROM events),
        ranked AS (
            SELECT event_type, u,
                   row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
            FROM hashes),
        agg AS (
            SELECT event_type, count(*) AS n_seen,
                   max(CASE WHEN rk = {KMV_K} THEN u END) AS h_k
            FROM ranked GROUP BY 1),
        exact AS (
            SELECT event_type, count(DISTINCT user_id) AS n_exact
            FROM events GROUP BY 1)
        SELECT a.event_type, e.n_exact,
               round(CASE WHEN n_seen < {KMV_K} THEN CAST(n_seen AS DOUBLE)
                          ELSE ({KMV_K} - 1) / h_k END, 4) AS kmv_estimate
        FROM agg a JOIN exact e USING (event_type)
    """,
    "streaming_kmv": f"""
        WITH hashes AS (
            SELECT DISTINCT event_type,
                   (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                         AS UBIGINT) + 1) / 4294967296.0 AS u
            FROM events),
        ranked AS (
            SELECT event_type, u,
                   row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
            FROM hashes),
        agg AS (
            SELECT event_type, count(*) AS n_seen,
                   max(CASE WHEN rk = {KMV_K} THEN u END) AS h_k
            FROM ranked GROUP BY 1)
        SELECT event_type,
               round(CASE WHEN n_seen < {KMV_K} THEN CAST(n_seen AS DOUBLE)
                          ELSE ({KMV_K} - 1) / h_k END, 4) AS kmv_estimate
        FROM agg
    """,
    "attribution_last_touch": """
        WITH p AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'),
        c AS (
            SELECT user_id, ts AS click_ts, event_id AS click_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS campaign
            FROM events WHERE event_type = 'click'),
        ranked AS (
            SELECT p.event_id, p.value, c.campaign,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
            FROM p JOIN c ON p.user_id = c.user_id
                         AND c.click_ts <= p.ts
                         AND p.ts <= c.click_ts + INTERVAL 7 DAY)
        SELECT campaign, count(*) AS n_purchases,
               (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS revenue
        FROM ranked WHERE rn = 1 GROUP BY 1
    """,
    "distinct_rollup_merge": """
        SELECT date_trunc('week', date_trunc('day', ts)) AS week,
               event_type,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT (date_trunc('day', ts), user_id)) AS n_user_days
        FROM events GROUP BY 1, 2
    """,
    "funnel_analysis": """
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1),
        c AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        p AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_click,
               (SELECT count(*) FROM p) AS n_purchase,
               round((SELECT count(*) FROM c) * 100.0 / (SELECT count(*) FROM v), 4)
                   AS click_pct,
               round((SELECT count(*) FROM p) * 100.0 / (SELECT count(*) FROM v), 4)
                   AS purchase_pct
    """,
    "cohort_retention": """
        WITH days AS (
            SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        first AS (
            SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
        SELECT f.cohort_day,
               datediff('day', f.cohort_day, d.day) AS day_offset,
               count(DISTINCT d.user_id) AS n_users
        FROM days d JOIN first f USING (user_id)
        GROUP BY 1, 2
    """,
    "key_skew_report": """
        WITH cnt AS (
            SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
        stats AS (
            SELECT sum(cnt) AS total_rows, avg(cnt) AS mean_cnt FROM cnt)
        SELECT o_custkey, cnt,
               round(cnt * 100.0 / total_rows, 6) AS share_pct,
               round(cnt / mean_cnt, 6) AS ratio_to_mean
        FROM cnt CROSS JOIN stats
        ORDER BY cnt DESC, o_custkey
        LIMIT 10
    """,
    "user_activity_distribution": """
        WITH per_user AS (
            SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        SELECT CAST(CASE WHEN n <= 16 THEN n
                         WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
                         WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
                         WHEN n <= 512 THEN 512 WHEN n <= 1024 THEN 1024
                         WHEN n <= 2048 THEN 2048 WHEN n <= 4096 THEN 4096
                         ELSE 8192 END AS BIGINT) AS events_bucket,
               count(*) AS n_users
        FROM per_user
        GROUP BY 1
    """,
    "revenue_pareto": """
        WITH per_cust AS (
            SELECT o_custkey,
                   sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_c
            FROM orders GROUP BY 1)
        SELECT decile, count(*) AS n_customers,
               (sum(rev_c) / 100.0) AS decile_revenue
        FROM (
            SELECT rev_c,
                   ntile(10) OVER (ORDER BY rev_c DESC, o_custkey) AS decile
            FROM per_cust)
        GROUP BY decile
    """,
    "hour_of_day_profile": """
        SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
               count(*) AS n,
               (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "daily_delta": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT event_type, day, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
               n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
        FROM daily
    """,
    "event_time_disorder": """
        WITH g AS (
            SELECT user_id,
                   greatest(0, max(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     - epoch_us(ts)) AS late_us
            FROM events)
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_out_of_order,
               max(late_us) / 1000000.0 AS max_disorder_s
        FROM g WHERE late_us IS NOT NULL
        GROUP BY user_id
    """,
    "time_rollup_multi": """
        WITH t AS (
            SELECT date_trunc('day', ts) AS d,
                   date_trunc('week', ts) AS w,
                   date_trunc('month', ts) AS m,
                   value
            FROM events)
        SELECT CASE WHEN grouping(d) = 0 THEN 'day'
                    WHEN grouping(w) = 0 THEN 'week'
                    ELSE 'month' END AS granularity,
               coalesce(d, w, m) AS bucket,
               count(*) AS n,
               (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_value
        FROM t
        GROUP BY GROUPING SETS ((d), (w), (m))
    """,
    "value_histogram": """
        WITH stats AS (
            SELECT event_type, min(value) AS mn, max(value) AS mx
            FROM events GROUP BY 1)
        SELECT e.event_type,
               CAST(least(floor((e.value - s.mn) / ((s.mx - s.mn) / 20)), 19)
                    AS INT) AS bin,
               count(*) AS n
        FROM events e JOIN stats s USING (event_type)
        GROUP BY 1, 2
    """,
    "session_paths": """
        WITH steps AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT e1, e2, e3, count(*) AS n
        FROM steps WHERE e3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n DESC, e1, e2, e3
        LIMIT 10
    """,
    "zscore_outliers": """
        WITH ev AS (
            SELECT event_id, event_type, value,
                   CAST(round(value * 100) AS BIGINT) AS v_c
            FROM events),
        stats AS (
            SELECT event_type, count(*) AS n,
                   sum(v_c) AS s1, sum(v_c * v_c) AS s2
            FROM ev GROUP BY 1)
        SELECT e.event_id, e.event_type,
               round(e.value, 4) AS value,
               floor((e.v_c - s.s1 / s.n)
                     / sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0))
                     * 10000.0 + 0.5) / 10000.0 AS zscore
        FROM ev e JOIN stats s USING (event_type)
        WHERE sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0)) > 0
          AND abs((e.v_c - s.s1 / s.n)
                  / sqrt(greatest(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0))) > 3.0
    """,
    "rolling_active_users": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day AS as_of FROM ud)
        SELECT d.as_of, count(DISTINCT u.user_id) AS wau
        FROM ud u JOIN days d
          ON datediff('day', u.day, d.as_of) BETWEEN 0 AND 6
        GROUP BY 1
    """,
    "markov_transitions": """
        WITH steps AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        counts AS (
            SELECT from_type, to_type, count(*) AS n
            FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2),
        marg AS (
            SELECT from_type, sum(n) AS n_from FROM counts GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n,
               round(c.n / CAST(m.n_from AS DOUBLE), 6) AS p
        FROM counts c JOIN marg m USING (from_type)
    """,
    "event_cooccurrence": """
        WITH baskets AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
            FROM events),
        total AS (
            SELECT count(*) AS n_baskets
            FROM (SELECT DISTINCT user_id, day FROM baskets)),
        marg AS (
            SELECT event_type, count(*) AS n_t FROM baskets GROUP BY 1)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both,
               round(count(*) * CAST(t.n_baskets AS DOUBLE)
                     / (ma.n_t * mb.n_t), 6) AS lift
        FROM baskets a
        JOIN baskets b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type < b.event_type
        JOIN marg ma ON ma.event_type = a.event_type
        JOIN marg mb ON mb.event_type = b.event_type
        CROSS JOIN total t
        GROUP BY 1, 2, ma.n_t, mb.n_t, t.n_baskets
    """,
    "incremental_rollup": """
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS n,
               (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_value,
               round(min(value), 4) AS min_value,
               round(max(value), 4) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    # exact integer-rational band (operators/quantiles.py) — see
    # q_winsorize_events docstring; quantile_cont's double interp
    # diverged from Spark's at sf1 on a value exactly on the band
    "winsorize_events": f"""
        WITH cents AS (
            SELECT event_id, event_type, value,
                   CAST(floor(value * {sql_double('100')}
                              + {sql_double('0.5')}) AS BIGINT) AS c
            FROM events),
        bands AS ({sql_exact_quantile_nums(
            "(SELECT event_type, c FROM cents)",
            "event_type", "c", {"p05": (1, 20), "p95": (19, 20)})})
        SELECT e.event_id, e.event_type,
               round(e.value, 4) AS value,
               CAST(least(greatest(e.c * 20, b.p05_num), b.p95_num) * 5
                    AS DOUBLE) / {sql_double('10000')} AS value_winsorized,
               (e.c * 20 < b.p05_num OR e.c * 20 > b.p95_num) AS was_clipped
        FROM cents e JOIN bands b USING (event_type)
    """,
    # exact integer-rational quartile edges — same hardening as
    # winsorize_events (bucket-edge comparisons must not depend on an
    # engine's quantile interpolation order); t <= q becomes t*4 <= num
    "quality_curriculum": f"""
        WITH sized AS (
            SELECT doc_id, CAST({_SQL_N_TOKENS} AS BIGINT) AS n_tokens
            FROM documents),
        bounds AS ({sql_exact_quantile_nums(
            "(SELECT 1 AS g, n_tokens FROM sized)",
            "g", "n_tokens", {"q1": (1, 4), "q2": (2, 4), "q3": (3, 4)})})
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN n_tokens * 4 <= q1_num THEN 1
                         WHEN n_tokens * 4 <= q2_num THEN 2
                         WHEN n_tokens * 4 <= q3_num THEN 3
                         ELSE 4 END AS INT) AS bucket
        FROM sized CROSS JOIN bounds
    """,
}


# Driver-r06 chronic-hash-fail rewrite (three failing rounds: r04-r06).
# Root cause found in r07 by auditing every oracle's DuckDB OUTPUT
# types: of 213 oracles, EXACTLY the two chronic hash-failers emitted
# HUGEINT columns (here: max(sum(...)) = HUGEINT). DuckDB's pandas
# fetch renders HUGEINT as float64 (123 -> 123.0) and its Arrow fetch
# as decimal128 — either way the driver hashes a different carrier
# type than Spark's int64 while rows and name-based schema still
# match. Fix: CAST every output column AS BIGINT. Defense-in-depth per
# the r06 verdict: (a) every decimal literal is spelled
# CAST('x' AS DOUBLE) so no BIGINT-op-DECIMAL arithmetic remains
# (version-mobile class the probes never covered), and (b) ln is the
# engine-pinned sqrt/atanh composition — staged through the named CTE
# columns pln_y (sqrt tower) and pln_z ((y-1)/(y+1)) so the 16-deep
# tower appears exactly once in the SQL; bit-identical to the Spark
# side's pinned_ln by construction (same ops, same order).
_D05 = sql_double("0.5")

# Shared CTE prefix of the PSI oracle — the SQL twin of psi_probs();
# also the base of the r07 decomposition probes (queries/probes.py).
PSI_PROBS_SQL_CTES = f"""
    ev AS (
        SELECT event_type, value, epoch_us(ts) AS us FROM events),
    span AS (SELECT min(us) AS t0, max(us) AS t1 FROM ev),
    tagged AS (
        SELECT event_type, value, (us * 2 > span.t0 + span.t1) AS is_cur
        FROM ev, span),
    stats AS (
        SELECT event_type, min(value) AS mn, max(value) AS mx
        FROM tagged GROUP BY 1),
    cells AS (
        SELECT t.event_type,
               CAST(CASE WHEN s.mx = s.mn THEN 0
                    ELSE least(floor((t.value - s.mn)
                                     / ((s.mx - s.mn) / {sql_double(str(PSI_BINS))})),
                               {PSI_BINS - 1}) END AS INT) AS bin,
               sum(CASE WHEN is_cur THEN 0 ELSE 1 END) AS n_ref,
               sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS n_cur
        FROM tagged t JOIN stats s USING (event_type)
        GROUP BY 1, 2),
    totals AS (
        SELECT event_type, sum(n_ref) AS r_tot, sum(n_cur) AS c_tot,
               count(*) AS n_bins
        FROM cells GROUP BY 1),
    probs AS (
        SELECT c.event_type, c.bin, c.n_ref, c.n_cur,
               t.r_tot, t.c_tot, t.n_bins,
               (c.n_cur + {_D05}) / (t.c_tot + {_D05} * t.n_bins) AS p_cur,
               (c.n_ref + {_D05}) / (t.r_tot + {_D05} * t.n_bins) AS p_ref
        FROM cells c JOIN totals t USING (event_type))"""

ORACLES["psi_drift"] = f"""
    WITH {PSI_PROBS_SQL_CTES},
    lny AS (
        SELECT *, {sql_pinned_ln_tower("(p_cur / p_ref)")} AS pln_y
        FROM probs),
    lnz AS (
        SELECT *, {sql_pinned_ln_z("pln_y")} AS pln_z
        FROM lny),
    lng AS (
        SELECT *, {sql_exact_round(sql_pinned_ln_series("pln_z"), 6)} AS ln_g
        FROM lnz),
    terms AS (
        SELECT event_type, r_tot, c_tot, n_bins,
               {sql_quantize("((p_cur - p_ref) * ln_g)", 9)} AS term_q
        FROM lng)
    SELECT event_type,
           CAST(max(r_tot) AS BIGINT) AS n_ref,
           CAST(max(c_tot) AS BIGINT) AS n_cur,
           CAST(max(n_bins) AS INT) AS n_bins,
           CAST(floor(CAST(sum(term_q) + 500 AS DOUBLE)
                      / {sql_double('1000')}) AS BIGINT) AS psi_micro
    FROM terms GROUP BY event_type
"""


def q_rejection_resample_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-flattening rejection resampling: accept each event
    with probability min_hour_count / its_hour_count so the hour-of-day
    histogram of the survivors is uniform in expectation — the
    curation move that stops a time-skewed crawl from teaching the
    model the crawler's schedule. Acceptance is the md5-uniform
    deterministic coin (same rule as domain_mix_sample: membership is
    a pure function of event_id, survives re-runs/repartitioning).
    Output is the 24-row per-hour audit (before/after counts and an
    exact id checksum of the accepted set — the checksum pins the
    MEMBERSHIP, not just the counts). Scale shape: the 24-row hour
    census broadcasts back into the scan; one map-combinable agg each
    way — nothing leaves codegen."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.hour("ts").cast("int")
    census = ev.groupBy(hour.alias("hod")).agg(F.count("*").alias("n_h"))
    m = census.agg(F.min("n_h").alias("m"))
    rates = census.crossJoin(F.broadcast(m))
    u = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(float(1 << 32))
    accepted = (
        ev.select("event_id", hour.alias("hod"), u.alias("u"))
        .join(F.broadcast(rates), "hod")
        .withColumn("keep", (F.col("u") < F.col("m") / F.col("n_h")).cast("long"))
    )
    return accepted.groupBy("hod").agg(
        F.count("*").alias("n_before"),
        F.sum("keep").alias("n_after"),
        F.sum(F.col("keep") * F.col("event_id")).alias("id_checksum"),
    )


QUERIES["rejection_resample_hour"] = q_rejection_resample_hour

ORACLES["rejection_resample_hour"] = """
    WITH census AS (
        SELECT CAST(hour(ts) AS INT) AS hod, count(*) AS n_h
        FROM events GROUP BY 1),
    m AS (SELECT min(n_h) AS m FROM census),
    accepted AS (
        SELECT CAST(hour(e.ts) AS INT) AS hod,
               e.event_id,
               CASE WHEN (CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
                               AS UBIGINT) / 4294967296.0) < (m.m / c.n_h)
                    THEN 1 ELSE 0 END AS keep
        FROM events e
        JOIN census c ON CAST(hour(e.ts) AS INT) = c.hod
        CROSS JOIN m)
    SELECT hod, count(*) AS n_before,
           CAST(sum(keep) AS BIGINT) AS n_after,
           CAST(sum(keep * event_id) AS BIGINT) AS id_checksum
    FROM accepted GROUP BY hod
"""


ATTR_LOOKBACK_DAYS = 7
ATTR_TAU_HOURS = 48.0  # exp decay time-constant


def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay (multi-touch) marketing attribution: each purchase
    splits its revenue across ALL of the same user's clicks in the
    7-day lookback, weighted exp(-age/τ) and normalized per purchase —
    the fractional-credit model that last-touch attribution
    (attribution_last_touch) collapses to a single winner. Rolls up to
    (campaign, n_touches, attributed_revenue).

    Determinism: the decay weight is QUANTIZED to integer micro-units
    (bigint) before the per-purchase normalization, so both the
    per-purchase weight sum and the weight itself are exact integers
    (exp() differs in the last ulp across libms, and an unordered
    double window-sum is accumulation-order-sensitive — either alone
    can flip a final decimal round across engines); each credit is
    then quantized to a 1e-8 grid before the campaign rollup, making
    the revenue sum exact bigint arithmetic, rescaled to the 4-dp
    output with pure integer ops (functions/precision.py).

    Scale shape: the touch relation is a user_id equi-join with the
    lookback as a join-time range predicate — per-user click lists are
    bounded, so no range explosion; the per-purchase normalization is
    one window sum on the purchase id (already co-partitioned by the
    join), and the campaign rollup is map-combinable."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.get_json_object("props", "$.k").cast("int").alias("campaign"),
        F.col("ts").alias("c_ts"),
    )
    touches = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS")
        ),
    )
    age_h = (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))) / F.lit(
        3600.0 * 1e6
    )
    w_u = quantize(F.exp(-age_h / F.lit(ATTR_TAU_HOURS)), 6)
    wsum_u = F.sum("w_u").over(W.partitionBy("purchase_id"))
    credited = touches.select(
        "purchase_id", "value", "campaign", w_u.alias("w_u")
    ).withColumn("credit_u", quantize(F.col("value") * F.col("w_u") / wsum_u, 8))
    return credited.groupBy("campaign").agg(
        F.count("*").alias("n_touches"),
        (F.floor((F.sum("credit_u") + F.lit(5000)) / F.lit(10000)) / F.lit(1e4)).alias(
            "attributed_revenue"
        ),
    )


QUERIES["attribution_time_decay"] = q_attribution_time_decay

ORACLES["attribution_time_decay"] = f"""
    WITH purchases AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts, value
        FROM events WHERE event_type = 'purchase'),
    clicks AS (
        SELECT user_id AS c_user_id, event_id AS click_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS campaign,
               ts AS c_ts
        FROM events WHERE event_type = 'click'),
    touches AS (
        SELECT p.purchase_id, p.value, c.campaign,
               CAST(floor(exp(-((epoch_us(p.p_ts) - epoch_us(c.c_ts))
                                / (3600.0 * 1e6)) / {ATTR_TAU_HOURS})
                          * 1000000.0 + 0.5) AS BIGINT) AS w_u
        FROM purchases p
        JOIN clicks c
          ON p.user_id = c.c_user_id
         AND c.c_ts <= p.p_ts
         AND c.c_ts >= p.p_ts - INTERVAL {ATTR_LOOKBACK_DAYS} DAYS),
    credited AS (
        SELECT campaign,
               CAST(floor(value * w_u / sum(w_u) OVER (PARTITION BY purchase_id)
                          * 100000000.0 + 0.5) AS BIGINT) AS credit_u
        FROM touches)
    SELECT campaign, count(*) AS n_touches,
           floor((sum(credit_u) + 5000) / 10000) / 10000.0 AS attributed_revenue
    FROM credited GROUP BY campaign
"""


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile (rank) normalization: each event's value
    mapped to its percent_rank within its event_type — the
    distribution-free feature transform that makes heavy-tailed
    telemetry comparable across types (rank-gaussianization minus the
    probit). percent_rank = (rank-1)/(n-1) is pure integer arithmetic
    over the sort, so both engines agree exactly (ties share a rank);
    the 6-dp presentation uses the portable floor-round — an exact
    ratio like 125/2000000 lands EXACTLY on a .5e-6 boundary, where
    decimal round() is the one op the engines disagree on.

    Scale shape: one window per event_type — a single hash shuffle on
    a low-cardinality key; within-partition sort only, no global
    ordering. For skewed type distributions the salting variants
    (skew_salted_*) apply unchanged."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        exact_round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


QUERIES["quantile_normalize"] = q_quantile_normalize

ORACLES["quantile_normalize"] = """
    SELECT event_id, event_type, round(value, 4) AS value,
           floor(percent_rank() OVER (PARTITION BY event_type ORDER BY value)
                 * 1000000.0 + 0.5) / 1000000.0 AS pct_rank
    FROM events
"""


_PIT_7D_US = 7 * 86400 * 1_000_000  # 7 days in microseconds


def q_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature backfill: for every purchase, the user's
    trailing-7-day activity STRICTLY BEFORE it (event count, value
    sum, purchase count) — the leakage-safe way to build training
    features that match what a serving system could have known at
    prediction time. The window is a numeric RANGE frame over epoch
    micros ending 1 µs before the anchor, so same-timestamp peers are
    excluded identically on both engines; the frame is computed over
    ALL events per user and then filtered to the purchase anchors.

    Determinism: the value sum is computed in integer cents (the
    target_encode_loo discipline) because engines associate sliding-
    window sums differently — DuckDB aggregates RANGE frames via a
    segment tree while Spark accumulates in frame order, so a raw
    double window-sum is not reproducible across engines even for
    identical frames; the bigint sum is exact under any association
    and the /100.0 quotient is the same IEEE double everywhere,
    emitted unrounded.

    Scale shape: one hash shuffle on user_id + an in-partition sort —
    the canonical time-series window; no self-join, no explosion."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_PIT_7D_US, -1)
    )
    feats = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_prev_7d"),
        (F.sum("v_c").over(w) / F.lit(100.0)).alias("sum_prev_7d"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w).alias("n_prev_purchases_7d"),
    )
    # empty trailing frame (a user's first event): the window sums
    # are NULL, which is "no prior activity" — normalize to zero
    return feats.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "n_prev_7d",
        F.coalesce("sum_prev_7d", F.lit(0.0)).alias("sum_prev_7d"),
        F.coalesce("n_prev_purchases_7d", F.lit(0)).cast("long").alias("n_prev_purchases_7d"),
    )


def q_label_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-horizon label generation: for every click, did the same
    user purchase within the following 7 days (exclusive of the click
    instant)? — the conversion/churn label factory, built as the
    mirror image of the point-in-time feature frame so feature and
    label windows can never overlap. Output also counts the future
    purchases (multi-label tasks reuse the same pass)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, _PIT_7D_US)
    )
    labeled = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w).alias("n_future_purchases"),
    )
    # empty forward frame (nothing follows within the horizon): the
    # window sum is NULL, which MEANS "no conversion" — without the
    # coalesce such clicks would carry NULL labels instead of False
    # (caught by the boundary test in tests/test_properties.py)
    n_fut = F.coalesce("n_future_purchases", F.lit(0)).cast("long")
    return labeled.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        n_fut.alias("n_future_purchases"),
        (n_fut > 0).alias("label"),
    )


QUERIES["point_in_time_features"] = q_point_in_time_features
QUERIES["label_horizon"] = q_label_horizon

ORACLES["point_in_time_features"] = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS v_c, epoch_us(ts) AS us
        FROM events),
    feats AS (
        SELECT event_id, user_id, event_type,
               count(*) OVER w AS n_prev_7d,
               sum(v_c) OVER w / 100.0 AS sum_prev_7d,
               coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER w, 0) AS n_prev_purchases_7d
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN {_PIT_7D_US} PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, n_prev_7d,
           coalesce(sum_prev_7d, 0.0) AS sum_prev_7d,
           CAST(n_prev_purchases_7d AS BIGINT) AS n_prev_purchases_7d
    FROM feats WHERE event_type = 'purchase'
"""

ORACLES["label_horizon"] = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events),
    labeled AS (
        SELECT event_id, user_id, event_type,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 1 FOLLOWING AND {_PIT_7D_US} FOLLOWING)
                   AS n_future_purchases
        FROM ev)
    SELECT event_id, user_id,
           CAST(coalesce(n_future_purchases, 0) AS BIGINT) AS n_future_purchases,
           coalesce(n_future_purchases, 0) > 0 AS label
    FROM labeled WHERE event_type = 'click'
"""


def q_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: deterministic 50/50 assignment (user_id
    parity, standing in for an assignment table), per-arm exposure
    and conversion (a user converts when they have >= 1 purchase),
    and the pooled two-proportion z-statistic with the |z| > 1.96
    call — the analytics side of an A/B platform. All counts are
    exact integers; the z arithmetic is identical IEEE on both
    engines (division, sqrt and subtraction are correctly-rounded
    IEEE ops), and every decimal presentation uses the portable
    floor-round (functions/precision.py) — conversion rates are exact
    integer ratios, which is precisely the value class that lands ON
    ``round()``'s .xxx5 boundaries — so neither the rates, the
    z-stat, nor the significance compare can flip across engines.
    One distinct-user aggregate + one single-row report; nothing
    wide."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    users = (
        ev.select("user_id", arm.alias("arm"), "event_type")
        .groupBy("arm", "user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
        )
    )
    arms = users.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    a = arms.filter(F.col("arm") == "A").select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = arms.filter(F.col("arm") == "B").select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    j = a.crossJoin(b)  # two one-row frames
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    p_pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(p_pool * (1 - p_pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    # degenerate arms (everyone or no one converted): se = 0 and the
    # z-stat is undefined — report 0 (no detectable difference), the
    # same convention the oracle uses, instead of an ANSI div-by-zero
    z = F.when(se > 0, exact_round((p_a - p_b) / se, 4)).otherwise(F.lit(0.0))
    return j.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        exact_round(p_a, 6).alias("conv_a"),
        exact_round(p_b, 6).alias("conv_b"),
        z.alias("z_conversion"),
        (F.abs(z) > 1.96).alias("significant"),
    )


QUERIES["ab_test_report"] = q_ab_test_report

ORACLES["ab_test_report"] = """
    WITH users AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1, 2),
    arms AS (
        SELECT arm, count(*) AS n_users, sum(converted) AS n_converted
        FROM users GROUP BY 1),
    j AS (
        SELECT a.n_users AS n_a, a.n_converted AS c_a,
               b.n_users AS n_b, b.n_converted AS c_b
        FROM (SELECT * FROM arms WHERE arm = 'A') a,
             (SELECT * FROM arms WHERE arm = 'B') b)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           floor(c_a / n_a * 1000000.0 + 0.5) / 1000000.0 AS conv_a,
           floor(c_b / n_b * 1000000.0 + 0.5) / 1000000.0 AS conv_b,
           CASE WHEN sqrt(((c_a + c_b) / (n_a + n_b)) * (1 - (c_a + c_b) / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b)) > 0
                THEN floor((c_a / n_a - c_b / n_b)
                     / sqrt(((c_a + c_b) / (n_a + n_b)) * (1 - (c_a + c_b) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)) * 10000.0 + 0.5) / 10000.0
                ELSE 0.0 END AS z_conversion,
           abs(CASE WHEN sqrt(((c_a + c_b) / (n_a + n_b)) * (1 - (c_a + c_b) / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)) > 0
                    THEN floor((c_a / n_a - c_b / n_b)
                         / sqrt(((c_a + c_b) / (n_a + n_b)) * (1 - (c_a + c_b) / (n_a + n_b))
                                * (1.0 / n_a + 1.0 / n_b)) * 10000.0 + 0.5) / 10000.0
                    ELSE 0.0 END) > 1.96 AS significant
    FROM j
"""


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of time-to-first-purchase: per
    user, the duration (whole hours) from their first event to their
    first purchase, right-censored at their last event when they
    never purchase — the product-limit estimator behind churn and
    conversion-delay modeling (public textbook method). Output: one
    row per event time with (duration_h, n_risk, n_events, n_censored,
    survival).

    Determinism: each factor (1 - d/n) is a ratio of exact integers,
    fixed-point-rounded to 8 with the portable floor form; ln(factor)
    is then QUANTIZED onto a 1e-9 bigint grid before the running sum
    (Java Math.log and DuckDB libm ln can differ in the last ulp, so
    even an identically-ordered double sum of raw ln outputs is not
    bit-safe), making the cumulative sum exact integer arithmetic;
    survival is exp of the rescaled integer sum, emitted through the
    portable floor-round (functions/precision.py) rather than
    ``round(·, 6)``. A factor of exactly 0 (everyone at risk
    converts) pins survival to 0 from that time on without touching
    ln. Scale shape: one per-user aggregate, one per-duration
    aggregate (report-sized), one ordered cumulative window over the
    duration rows — the corpus is shuffled once on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("us").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias("tp"),
        F.max("us").alias("tl"),
    )
    dur = per_user.select(
        # explicit floor: DuckDB's double->bigint CAST rounds while
        # Spark's truncates — floor() agrees everywhere
        F.floor(
            (F.coalesce(F.col("tp"), F.col("tl")) - F.col("t0"))
            / F.lit(3600.0 * 1e6)
        ).cast("long").alias("duration_h"),
        F.col("tp").isNotNull().cast("int").alias("event"),
    )
    cells = dur.groupBy("duration_h").agg(
        F.sum("event").alias("d"),
        F.sum(1 - F.col("event")).alias("c"),
    )
    w_cum = W.orderBy("duration_h").rowsBetween(W.unboundedPreceding, -1)
    w_inc = W.orderBy("duration_h").rowsBetween(W.unboundedPreceding, 0)
    n_total = F.sum(F.col("d") + F.col("c")).over(
        W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    staged = cells.select(
        "duration_h",
        "d",
        "c",
        (n_total - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_cum), F.lit(0))).alias("n_risk"),
    )
    factor = exact_round(1 - F.col("d") / F.col("n_risk"), 8)
    staged2 = staged.select(
        "duration_h", "d", "c", "n_risk",
        # ln is quantized onto the COARSE 1e-6 grid (not 1e-9): Java
        # Math.log and DuckDB's libm may disagree in the last ulp, and
        # the coarser grid makes a boundary straddle ~1000x less likely
        # (the bm25-idf / psi_drift discipline).
        F.when(factor > 0, quantize(F.log(factor), 6)).otherwise(F.lit(0).cast("long")).alias("ln_f_q"),
        (factor <= 0).cast("int").alias("hit_zero"),
    )
    surv = F.when(
        F.sum("hit_zero").over(w_inc) > 0, F.lit(0.0)
    ).otherwise(exact_round(F.exp(F.sum("ln_f_q").over(w_inc) / F.lit(1e6)), 6))
    return (
        staged2.select(
            "duration_h",
            "n_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            surv.alias("survival"),
        )
        .filter(F.col("n_events") > 0)
    )


QUERIES["survival_curve"] = q_survival_curve

ORACLES["survival_curve"] = """
    WITH per_user AS (
        SELECT user_id, min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
               max(epoch_us(ts)) AS tl
        FROM events GROUP BY 1),
    dur AS (
        SELECT CAST(floor((coalesce(tp, tl) - t0) / (3600.0 * 1e6)) AS BIGINT) AS duration_h,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event
        FROM per_user),
    cells AS (
        SELECT duration_h, sum(event) AS d, sum(1 - event) AS c
        FROM dur GROUP BY 1),
    staged AS (
        SELECT duration_h, d, c,
               sum(d + c) OVER () -
               coalesce(sum(d + c) OVER (ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM cells),
    staged2 AS (
        SELECT duration_h, d, c, n_risk,
               CASE WHEN floor((1 - d / n_risk) * 100000000.0 + 0.5) / 100000000.0 > 0
                    THEN CAST(floor(ln(floor((1 - d / n_risk) * 100000000.0 + 0.5)
                                       / 100000000.0) * 1000000.0 + 0.5) AS BIGINT)
                    ELSE 0 END AS ln_f_q,
               CASE WHEN floor((1 - d / n_risk) * 100000000.0 + 0.5) / 100000000.0 <= 0
                    THEN 1 ELSE 0 END AS hit_zero
        FROM staged)
    SELECT duration_h, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
           CASE WHEN sum(hit_zero) OVER (ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
                THEN 0.0
                ELSE floor(exp(sum(ln_f_q) OVER (ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        / 1000000.0) * 1000000.0 + 0.5) / 1000000.0
           END AS survival
    FROM staged2
    QUALIFY d > 0
"""
