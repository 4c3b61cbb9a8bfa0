"""Relational completion (SURVEY §2.3 joins, §2.4 aggregations, §2.6
sort/top-k, §2.7 set ops, §2.8 scalar functions).

The reference has none of these (its only joins/aggs are generated
SQL strings); they're required for a complete engine and come from
Catalyst built-ins. Aggregate columns are rounded on both sides so
the driver's value-hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import (
    exact_round,
    money_sum,
    quantize,
    sql_double,
)
from osarchiver_spark.operators.quantiles import sql_exact_quantile_nums
from osarchiver_spark.sources.parquet import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + pushdown filter + hash agg (partial/final
    map-side combine comes free from groupBy)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(quantize(F.col("l_quantity"), 0)).cast("double").alias("sum_qty"),
            money_sum(F.col("l_extendedprice"), 2, 2).alias("sum_base_price"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6, 2
            ).alias("sum_charge"),
            exact_round(F.sum(quantize(F.col("l_quantity"), 0)) / F.count(F.lit(1)), 4).alias("avg_qty"),
            exact_round(
                F.sum(quantize(F.col("l_extendedprice"), 2)) / (F.count(F.lit(1)) * F.lit(100.0)), 4
            ).alias("avg_price"),
            exact_round(
                F.sum(quantize(F.col("l_discount"), 2)) / (F.count(F.lit(1)) * F.lit(100.0)), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dimension side broadcastable) +
    agg + top-k. Catalyst broadcasts customer/orders under AQE."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter((F.col("o_orderdate") < F.lit("1998-03-15")) & (F.col("l_shipdate") > F.lit("1998-03-15")))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. region/nation broadcast;
    supplier-nation = customer-nation co-membership condition."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, (F.col("s_suppkey") == F.col("l_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")))
        .filter((F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2).alias("revenue"))
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having at least one urgent order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): parts never ordered."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti")


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with null-producing side aggregated."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(quantize(F.col("o_totalprice"), 2)), F.lit(0)) / F.lit(100.0)).alias("total_spent"),
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: price-band classification of orders.
    Bands are a tiny literal dim — broadcast nested-loop is the right
    physical plan and Catalyst picks it; at scale, bucketize the range
    key to convert to equi-join (see operators/asof.py for that path).
    """
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(0, 0.0, 50_000.0, "low"), (1, 50_000.0, 150_000.0, "mid"), (2, 150_000.0, 1e18, "high")],
        "band_id int, lo double, hi double, band string",
    )
    return (
        orders.join(bands, (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            exact_round(
                F.sum(quantize(F.col("o_totalprice"), 2)) / (F.count(F.lit(1)) * F.lit(100.0)), 2
            ).alias("avg_price"),
        )
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with grouping_id so subtotal rows are typed."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(quantize(F.col("l_quantity"), 0)).cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
            F.grouping_id().alias("gid"),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over two dims."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(money_sum(F.col("l_extendedprice"), 2, 2).alias("sum_price"), F.grouping_id().alias("gid"))
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain counts per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


def q_pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (portable to ANSI
    SQL via FILTER) — same plan Spark's .pivot() produces with
    explicit values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(quantize(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(F.lit(0.0)), 0))
        .cast("double").alias("qty_open"),
        F.sum(quantize(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(F.lit(0.0)), 0))
        .cast("double").alias("qty_fulfilled"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (§2.7): classify custkeys by which
    order-priority populations they belong to."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    both = urgent.intersect(high).withColumn("cls", F.lit("both"))
    only_urgent = urgent.exceptAll(high).withColumn("cls", F.lit("urgent_only"))
    only_high = high.exceptAll(urgent).withColumn("cls", F.lit("high_only"))
    return both.unionAll(only_urgent).unionAll(only_high)


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/date/math surface (§2.8 F1-F6): the reference's
    SUBDATE/NOW/formatting equivalents as pushdown-friendly built-ins."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 10)).alias("prio_name"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.add_months(F.col("o_orderdate"), -12).cast("timestamp").alias("subdate_12m"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("age_days"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles, same linear-interpolation definition as ANSI
    quantile_cont / Spark `percentile` (Hyndman-Fan 7) — but computed
    as exact integer-rational order statistics over the money column's
    intrinsic cent grid (operators/quantiles.py, r07 hardening: the
    engines' double interpolation differs in the last ulp at scale and
    can straddle the 4-dp emission grid). num/(b·100) dollars emits as
    one exact-int→double cast + one IEEE division: num·(100/b) is the
    value in 1e-4 dollars exactly, for b ∈ {2, 10, 100}."""
    from osarchiver_spark.operators.quantiles import exact_quantile_nums

    orders = load_table(spark, sf_dir, "orders")
    src = orders.select("o_orderpriority", quantize(F.col("o_totalprice"), 2).alias("c"))
    qn = exact_quantile_nums(
        src, "o_orderpriority", "c",
        {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)},
    )
    def dollars4(num_col: str, b: int):
        return (F.col(num_col) * F.lit(100 // b)).cast("double") / F.lit(10000.0)

    return qn.select(
        "o_orderpriority",
        dollars4("p50_num", 2).alias("p50"),
        dollars4("p90_num", 10).alias("p90"),
        dollars4("p99_num", 100).alias("p99"),
        F.col("n"),
    )


SAMPLE_RATE_HEX = "28f5c28f"  # 4-hex-byte threshold ~ 16% Bernoulli rate


def q_sampled_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles over a DETERMINISTIC Bernoulli sample — the
    sample-don't-sort pattern for quantiles at scale, with a twist
    the engine-specific sketches (GK/t-digest, `approx_sketches`)
    can't offer: membership is md5(key) < threshold, so the sample —
    and therefore the estimate — is a pure function of the data,
    reproducible across engines, re-runs and repartitionings, and
    the whole query is oracle-checkable. Scan-side filter (~16%
    survives), then the exact interpolated percentile on the sample;
    error vs the full-data exact value is bounded by the usual
    order-statistic bounds and reported side-by-side."""
    from osarchiver_spark.operators.quantiles import exact_quantile_nums_multi

    li = load_table(spark, sf_dir, "lineitem")
    keep = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 8) < SAMPLE_RATE_HEX
    src = li.select(
        "l_returnflag", quantize(F.col("l_extendedprice"), 2).alias("c"), keep.alias("k")
    )
    # exact integer-rational order statistics (r07 hardening — see
    # q_percentiles): sample_p50/p95 at b=2/b=20, exact_p50 at b=2;
    # num·(100/b) is the value in 1e-4 dollars exactly. ONE histogram
    # pass counts both populations per (flag, cent) cell and ONE
    # window pass carries both cumsums (exact_quantile_nums_multi,
    # r11 optimization round) — one scan + one shuffle total, where
    # the former two-leg shape re-scanned and re-shuffled lineitem
    # per population and joined at the end. Counts are integers, so
    # the shared-histogram order statistics are identical; the
    # n_sample > 0 filter reproduces the old inner join's drop of
    # sample-empty groups (impossible on real data at a 16% rate,
    # guarded anyway).
    hist = (
        src.filter(F.col("c").isNotNull())
        .groupBy("l_returnflag", "c")
        .agg(
            F.count(F.lit(1)).alias("cnt_full"),
            F.sum(F.when(F.col("k"), 1).otherwise(0)).alias("cnt_samp"),
        )
    )
    qn = exact_quantile_nums_multi(
        hist, "l_returnflag", "c",
        {
            "cnt_samp": ("n_sample", {"sample_p50": (1, 2), "sample_p95": (19, 20)}),
            "cnt_full": ("n_rows", {"exact_p50": (1, 2)}),
        },
    )
    return qn.filter(F.col("n_sample") > 0).select(
        "l_returnflag",
        "n_rows",
        "n_sample",
        ((F.col("sample_p50_num") * F.lit(50)).cast("double") / F.lit(10000.0)).alias("sample_p50"),
        ((F.col("sample_p95_num") * F.lit(5)).cast("double") / F.lit(10000.0)).alias("sample_p95"),
        ((F.col("exact_p50_num") * F.lit(50)).cast("double") / F.lit(10000.0)).alias("exact_p50"),
    )


def q_approx_sketches_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw approximate sketches (HLL++ distinct, GK quantiles): the
    scale path where exact distinct/percentile shuffles are too
    expensive. Sketch VALUES are engine-specific, so this variant has
    no oracle and is kept for programmatic use; the registered
    `approx_sketches` wraps it in a bounded-error adjudication."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50_price"),
        F.count("*").alias("n_rows"),
    )


# HLL++ at rsd=0.01: allow 3 standard errors. GK at the default
# accuracy (1/10000 rank error): adjudicate against the exact 49th and
# 51st percentiles — a ±0.01 rank envelope, two orders of magnitude
# wider than the sketch's guarantee, yet still a REAL bound an
# engine-specific sketch cannot cheat.
HLL_REL_BOUND = 0.03


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error adjudication of the engine sketches: per group,
    the exact distinct/percentile plus booleans asserting each sketch
    landed inside its published error envelope. The DuckDB oracle
    computes the same exact side and emits TRUE — the value hash
    matches iff every Spark sketch is in-bound, which makes an
    engine-specific estimator hash-adjudicable without faking its
    internals (pattern precedent: kmv_distinct).

    Plan note (r11 optimization round): the exact distinct count, the
    HLL sketch and the percentile aggregates run as THREE independent
    aggregations joined on the 3-row key. Two pathologies are avoided:
    (a) fusing distinct + non-distinct families inserts an Expand
    (row replication per family) upstream of the ObjectHashAggregate
    percentile buffers — a 5× slowdown measured at sf0.1 in r4
    (73 s → 14 s); (b) even with percentiles split out, keeping
    approx_count_distinct in the SAME group-by as count_distinct makes
    the Expand's first-stage aggregate key on (l_returnflag,
    l_orderkey) — ~450k groups at sf0.1 — and every group allocates an
    rsd=0.01 HLL++ register buffer: multi-GB allocation churn
    (GCLocker retry warnings), measured 24-34 s at sf0.1 vs 2-5 s for
    this shape. The exact distinct count itself uses the two-level
    aggregation form (group by (flag, key), then by flag) instead of
    count_distinct: no Expand anywhere, both levels map-combinable —
    the §2.5 two-level-agg shape that also spreads the distinct-key
    stage across the cluster at 100 TB. The exact side exists for
    adjudication; a production run wanting only the sketches uses
    q_approx_sketches_raw (one cheap pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Non-null precondition (ADVICE r11): unlike count_distinct, the
    # two-level form counts a NULL-key group as one distinct value.
    # l_orderkey is a TPC-H primary-key component (never NULL), so the
    # shapes agree here; reusing this pattern on a nullable key needs
    # a key.isNotNull filter before the first-level groupBy.
    dist = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.count("*").alias("c"))
        .groupBy("l_returnflag")
        .agg(F.sum("c").alias("n_rows"), F.count("*").alias("exact_orders"))
    )
    hll = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a_orders"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51))").alias("ps"),
        F.percentile_approx("l_extendedprice", 0.5).alias("a_p50"),
    )
    agg = dist.join(hll, "l_returnflag").join(pcts, "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        "exact_orders",
        "a_orders",
        "a_p50",
        F.col("ps")[0].alias("lo"),
        F.round(F.col("ps")[1], 4).alias("exact_p50"),
        F.col("ps")[2].alias("hi"),
    )
    orders_in_bound = (
        F.abs(F.col("a_orders") - F.col("exact_orders"))
        <= F.col("exact_orders") * HLL_REL_BOUND
    )
    p50_in_bound = (F.col("a_p50") >= F.col("lo")) & (F.col("a_p50") <= F.col("hi"))
    return agg.select(
        "l_returnflag",
        "n_rows",
        "exact_orders",
        "exact_p50",
        orders_in_bound.alias("orders_in_bound"),
        p50_in_bound.alias("p50_in_bound"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt via stack(): wide metric columns to long form."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (metric, value)",
    ).select("l_orderkey", "l_linenumber", "metric", F.round("value", 4).alias("value"))


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery (avg quantity per
    part) decorrelated into an aggregate + join, the plan Catalyst
    (and any warehouse optimizer) targets; the oracle keeps the
    correlated form and DuckDB decorrelates it itself."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.p_key)
        .filter((F.col("p_brand") == "Brand#1") & (F.col("l_quantity") < F.col("half_avg_qty")))
        .agg(exact_round(F.sum(quantize(F.col("l_extendedprice"), 2)) / F.lit(700.0), 4).alias("avg_yearly"))
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (same Catalyst plan
    as the DataFrame rollup/cube, arbitrary set list)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + count per priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1998-01-01")).select("l_orderkey").distinct()
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushdown filter + single agg — the scan-
    bound query whose whole WHERE lands in PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4, 4).alias("revenue"))


def q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-conditional counts per group."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter((F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01")))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter((F.col("l_shipdate") >= F.lit("1997-09-01")) & (F.col("l_shipdate") < F.lit("1997-10-01")))
        .agg(exact_round(100.0 * F.sum(quantize(promo, 4)) / F.sum(quantize(rev, 4)), 4).alias("promo_revenue_pct"))
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate across
    the join — the OR-of-ANDs Catalyst splits into join + residual."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 5))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments per returnflag: stddev/variance (sample),
    covariance and correlation between quantity and price.

    Determinism: computed from EXACT integer raw moments (quantity is
    integer-valued, price is exact cents; squares/cross-products sum
    as bigint/DECIMAL(38,0)) rather than the engines' streaming
    co-moment aggregates, whose merge order perturbs the last bits —
    at 1e9-magnitude variances that noise reaches the 2-dp rounding
    grid. A side benefit of exactness: Cauchy–Schwarz holds exactly
    in integer arithmetic, so the variance operands can never go
    negative and sqrt (IEEE-correctly-rounded in both engines) needs
    no clamp. Still one map-combinable aggregation per group."""
    li = load_table(spark, sf_dir, "lineitem")
    q = quantize(F.col("l_quantity"), 0)
    c = quantize(F.col("l_extendedprice"), 2)
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sqq"),
        F.sum(c.cast(dec)).alias("sp"),
        F.sum((c * c).cast(dec)).alias("spp"),
        F.sum((q * c).cast(dec)).alias("sqp"),
    )
    n = F.col("n")
    var_q = (F.col("sqq").cast(dec) * n - F.col("sq").cast(dec) * F.col("sq")).cast(
        "double"
    ) / (n * (n - 1))
    var_p = (F.col("spp") * n - F.col("sp") * F.col("sp")).cast("double") / (
        n * (n - 1)
    ) / F.lit(10000.0)
    cov_qp = (F.col("sqp") * n - F.col("sq") * F.col("sp")).cast("double") / (
        n * (n - 1)
    ) / F.lit(100.0)
    return m.select(
        "l_returnflag",
        "n",
        exact_round(F.col("sq") / n, 4).alias("avg_qty"),
        exact_round(F.sqrt(var_q), 4).alias("std_qty"),
        exact_round(var_p, 2).alias("var_price"),
        exact_round(cov_qp, 2).alias("covar_qp"),
        exact_round(cov_qp / (F.sqrt(var_q) * F.sqrt(var_p)), 4).alias("corr_qp"),
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-salt two-phase aggregation (operators/skew.py): the
    3-value l_returnflag key is exactly the one-giant-key shape where
    the reduce side of a plain groupBy serializes at 100 TB. The salt
    spreads each key over 16 partial groups before the merge; results
    are bit-equal to the plain aggregation, which IS the oracle."""
    from osarchiver_spark.operators.skew import salted_count_sum

    li = load_table(spark, sf_dir, "lineitem")
    return salted_count_sum(li, ["l_returnflag"], "l_quantity")


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (operators/skew.py): the fact side gets a
    deterministic row salt, the dimension replicates salt_buckets×,
    so a hot key's shuffle rows spread across reducers. Pair count +
    revenue per nation must equal the plain join — the oracle."""
    from osarchiver_spark.operators.skew import salted_join

    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    joined = salted_join(li, supp, "s_suppkey", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        money_sum(F.col("l_extendedprice"), 2, 2).alias("revenue"),
    )



ER_BLOCK_LEN = 16  # "Customer#0000001…" — bounds block width by construction
ER_MAX_LEV = 1


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution): for every customer, the
    best candidate duplicate by name edit distance — the
    blocking-then-verify shape. Candidates come from an EQUI-JOIN on
    (name-prefix block, market segment) — never all-pairs; the
    expensive verify (levenshtein, JVM codegen) runs only within
    blocks, and the linkage decision is a per-record top-1 window
    (distance asc, key asc — deterministic). At 100 TB the blocking
    key is the design knob: prefix length bounds block width, skewed
    blocks split under AQE, and a second blocking pass (e.g. phonetic
    key) unions in recall the first key misses."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        "c_custkey", "c_name", "c_mktsegment",
        F.substring("c_name", 1, ER_BLOCK_LEN).alias("blk"),
    )
    left = b.select(
        F.col("c_custkey"), F.col("c_name"),
        F.col("c_mktsegment").alias("seg"), F.col("blk"),
    )
    right = b.select(
        F.col("c_custkey").alias("match_key"), F.col("c_name").alias("match_name"),
        F.col("c_mktsegment").alias("seg"), F.col("blk"),
    )
    lev = F.levenshtein("c_name", "match_name")
    cand = (
        left.join(right, ["blk", "seg"])
        .filter(F.col("c_custkey") != F.col("match_key"))
        .filter(lev <= ER_MAX_LEV)
        .select("c_custkey", "match_key", "match_name", lev.cast("int").alias("lev"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("c_custkey").orderBy("lev", "match_key")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "match_key", "match_name", "lev")
    )


# Block-purge threshold for the production ER path: in-block verify is
# O(b^2) pairs, so one degenerate blocking key (an empty name, a
# "John Smith") turns linear linkage quadratic. 64 records/block caps
# a block at ~4k comparisons.
ER_MAX_BLOCK = 64


def entity_resolution_production(
    spark: SparkSession, sf_dir: str, max_block: int = ER_MAX_BLOCK
) -> DataFrame:
    """q_entity_resolution with the standard BLOCK-PURGING guard: a
    blocks census (one map-combinable count) drops blocks larger than
    ``max_block`` from the pair join, bounding the verify stage at
    max_block^2 comparisons per block no matter how degenerate the
    blocking key gets. This is the deployment-shape twin of the
    registered query — same pattern as the knn_lsh / knn_ivf bench
    overrides (the registered query runs purge-free so it can share
    the exact SQL oracle; the sf1 rehearsal measured the purge-free
    form going quadratic on 10x-duplicated names: 1.4 s -> 99 s).

    Recall tradeoff (documented, standard): records in purged blocks
    get no candidates from THIS key — production stacks a second
    blocking pass (phonetic key, other prefix) exactly as the base
    query's docstring prescribes; oversized blocks are overwhelmingly
    junk keys whose pairs are false matches anyway."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        "c_custkey", "c_name", "c_mktsegment",
        F.substring("c_name", 1, ER_BLOCK_LEN).alias("blk"),
    )
    census = (
        b.groupBy("blk", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n_blk"))
        .filter(F.col("n_blk") <= max_block)
        .select("blk", "seg")
    )
    left = b.select(
        F.col("c_custkey"), F.col("c_name"),
        F.col("c_mktsegment").alias("seg"), F.col("blk"),
    ).join(census, ["blk", "seg"], "left_semi")
    right = b.select(
        F.col("c_custkey").alias("match_key"), F.col("c_name").alias("match_name"),
        F.col("c_mktsegment").alias("seg"), F.col("blk"),
    )
    lev = F.levenshtein("c_name", "match_name")
    cand = (
        left.join(right, ["blk", "seg"])
        .filter(F.col("c_custkey") != F.col("match_key"))
        .filter(lev <= ER_MAX_LEV)
        .select("c_custkey", "match_key", "match_name", lev.cast("int").alias("lev"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("c_custkey").orderBy("lev", "match_key")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "match_key", "match_name", "lev")
    )


QUERIES = {
    "entity_resolution": q_entity_resolution,
    "numeric_stats": q_numeric_stats,
    "skew_salted_agg": q_skew_salted_agg,
    "skew_salted_join": q_skew_salted_join,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_shipmode": q12_shipmode,
    "q14_promo_effect": q14_promo_effect,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q17_small_quantity": q17_small_quantity,
    "grouping_sets": q_grouping_sets,
    "unpivot_metrics": q_unpivot,
    "percentiles": q_percentiles,
    "sampled_percentiles": q_sampled_percentiles,
    "approx_sketches": q_approx_sketches,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "outer_join_agg": q_outer_join,
    "range_join_bands": q_range_join,
    "rollup_agg": q_rollup,
    "cube_agg": q_cube,
    "distinct_agg": q_distinct_agg,
    "pivot_conditional": q_pivot_conditional,
    "set_ops": q_set_ops,
    "scalar_functions": q_scalar_functions,
}

ORACLES = {
    "numeric_stats": """
        WITH m AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sq,
                   sum(CAST(floor(l_quantity + 0.5) AS BIGINT) * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sqq,
                   sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sp,
                   sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS spp,
                   sum(CAST(floor(l_quantity + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sqp
            FROM lineitem GROUP BY 1)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               floor(sq / n * 10000.0 + 0.5) / 10000.0 AS avg_qty,
               floor(sqrt(CAST(sqq * n - sq * sq AS DOUBLE) / (n * (n - 1)))
                     * 10000.0 + 0.5) / 10000.0 AS std_qty,
               floor(CAST(spp * n - sp * sp AS DOUBLE) / (n * (n - 1)) / 10000.0
                     * 100.0 + 0.5) / 100.0 AS var_price,
               floor(CAST(sqp * n - sq * sp AS DOUBLE) / (n * (n - 1)) / 100.0
                     * 100.0 + 0.5) / 100.0 AS covar_qp,
               floor(CAST(sqp * n - sq * sp AS DOUBLE) / (n * (n - 1)) / 100.0
                     / (sqrt(CAST(sqq * n - sq * sq AS DOUBLE) / (n * (n - 1)))
                        * sqrt(CAST(spp * n - sp * sp AS DOUBLE) / (n * (n - 1)) / 10000.0))
                     * 10000.0 + 0.5) / 10000.0 AS corr_qp
        FROM m
    """,
    "skew_salted_agg": """
        SELECT l_returnflag, count(*) AS n,
               (sum(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) / 10000.0) AS total
        FROM lineitem GROUP BY 1
    """,
    "skew_salted_join": """
        SELECT s_nationkey, count(*) AS n,
               (sum(CAST(floor((l_extendedprice) * 100.0 + 0.5) AS BIGINT)) / 100.0) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT (sum(CAST(floor((l_extendedprice * l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q12_shipmode": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    "q14_promo_effect": """
        SELECT floor(100.0 * sum(CAST(floor((CASE WHEN p_type LIKE 'PROMO%'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END) * 10000.0 + 0.5) AS BIGINT))
                     / sum(CAST(floor((l_extendedprice * (1 - l_discount))
                                      * 10000.0 + 0.5) AS BIGINT))
                     * 10000.0 + 0.5) / 10000.0
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    "q19_discounted_revenue": """
        SELECT (sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) / 10000.0) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
           OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 20)
           OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity >= 5)
    """,
    "q17_small_quantity": """
        SELECT floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 700.0 * 10000.0 + 0.5) / 10000.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.5 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "unpivot_metrics": """
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
               round(l_quantity, 4) AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 4) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', round(l_tax, 4) FROM lineitem
    """,
    # exact integer-rational order statistics on both the sample and
    # the full data (operators/quantiles.py; see "percentiles")
    "sampled_percentiles": f"""
        WITH cents AS (
            SELECT l_returnflag,
                   CAST(floor(l_extendedprice * {sql_double('100')}
                              + {sql_double('0.5')}) AS BIGINT) AS c,
                   substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)
                       < '{SAMPLE_RATE_HEX}' AS k
            FROM lineitem),
        samp AS ({sql_exact_quantile_nums(
            "(SELECT l_returnflag, c FROM cents WHERE k)",
            "l_returnflag", "c",
            {"sample_p50": (1, 2), "sample_p95": (19, 20)})}),
        whole AS ({sql_exact_quantile_nums(
            "(SELECT l_returnflag, c FROM cents)",
            "l_returnflag", "c", {"exact_p50": (1, 2)})})
        SELECT l_returnflag,
               whole.n AS n_rows,
               samp.n AS n_sample,
               CAST(sample_p50_num * 50 AS DOUBLE) / {sql_double('10000')} AS sample_p50,
               CAST(sample_p95_num * 5 AS DOUBLE) / {sql_double('10000')} AS sample_p95,
               CAST(exact_p50_num * 50 AS DOUBLE) / {sql_double('10000')} AS exact_p50
        FROM samp JOIN whole USING (l_returnflag)
    """,
    # The oracle computes the exact side and asserts the bound holds
    # (TRUE literals): the hash matches iff Spark's engine-specific
    # sketches land inside their published error envelopes.
    "approx_sketches": """
        SELECT l_returnflag, count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS exact_orders,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
               TRUE AS orders_in_bound,
               TRUE AS p50_in_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    # exact integer-rational order statistics (operators/quantiles.py)
    # — engine quantile interpolation is last-ulp-divergent at scale
    "percentiles": f"""
        WITH qn AS ({sql_exact_quantile_nums(
            f"(SELECT o_orderpriority, CAST(floor(o_totalprice * {sql_double('100')}"
            f" + {sql_double('0.5')}) AS BIGINT) AS c FROM orders)",
            "o_orderpriority", "c",
            {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)})})
        SELECT o_orderpriority,
               CAST(p50_num * 50 AS DOUBLE) / {sql_double('10000')} AS p50,
               CAST(p90_num * 10 AS DOUBLE) / {sql_double('10000')} AS p90,
               CAST(p99_num * 1 AS DOUBLE) / {sql_double('10000')} AS p99,
               n
        FROM qn
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sum_qty,
               (sum(CAST(floor((l_extendedprice) * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_base_price,
               (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) + 50) / 100) / 100.0) AS sum_disc_price,
               (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000.0 + 0.5) AS BIGINT)) + 5000) / 10000) / 100.0) AS sum_charge,
               floor(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
               floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / (count(*) * 100.0) * 10000.0 + 0.5) / 10000.0 AS avg_price,
               floor(sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) / (count(*) * 100.0) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) + 50) / 100) / 100.0) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) + 50) / 100) / 100.0) AS revenue
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
          AND c_nationkey = n_nationkey AND o_custkey = c_custkey
          AND l_orderkey = o_orderkey AND s_suppkey = l_suppkey
          AND s_nationkey = c_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "semi_join": """
        SELECT * FROM customer WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "anti_join": """
        SELECT * FROM part WHERE NOT EXISTS (
            SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    "outer_join_agg": """
        SELECT c_custkey, c_name,
               count(o_orderkey) AS n_orders,
               (coalesce(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)), 0) / 100.0) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "range_join_bands": """
        WITH bands(band_id, lo, hi, band) AS (VALUES
            (0, 0.0, 50000.0, 'low'),
            (1, 50000.0, 150000.0, 'mid'),
            (2, 150000.0, 1e18, 'high'))
        SELECT band, count(*) AS n_orders,
               floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                     / (count(*) * 100.0) * 100.0 + 0.5) / 100.0 AS avg_price
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sum_qty,
               count(*) AS n,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus,
               (sum(CAST(floor((l_extendedprice) * 100.0 + 0.5) AS BIGINT)) / 100.0) AS sum_price,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "distinct_agg": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey) AS n_parts,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "pivot_conditional": """
        SELECT l_returnflag,
               CAST(sum(CAST(floor((CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END) + 0.5) AS BIGINT)) AS DOUBLE) AS qty_open,
               CAST(sum(CAST(floor((CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END) + 0.5) AS BIGINT)) AS DOUBLE) AS qty_fulfilled
        FROM lineitem GROUP BY l_returnflag
    """,
    "set_ops": """
        WITH urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
             high AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        SELECT o_custkey, 'both' AS cls FROM (SELECT * FROM urgent INTERSECT SELECT * FROM high)
        UNION ALL
        SELECT o_custkey, 'urgent_only' AS cls FROM (SELECT * FROM urgent EXCEPT SELECT * FROM high)
        UNION ALL
        SELECT o_custkey, 'high_only' AS cls FROM (SELECT * FROM high EXCEPT SELECT * FROM urgent)
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               upper(substring(o_orderpriority, 3, 10)) AS prio_name,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               strftime(o_orderdate, '%Y-%m') AS order_ym,
               o_orderdate - INTERVAL 12 MONTH AS subdate_12m,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days,
               round(ln(o_totalprice + 1), 6) AS log_price,
               round(sqrt(o_totalprice), 6) AS sqrt_price,
               o_orderkey % 7 AS key_mod7,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
               CAST(length(o_orderpriority) AS INT) AS prio_len,
        FROM orders
    """,
}


ORACLES["entity_resolution"] = f"""
    WITH b AS (
        SELECT c_custkey, c_name, c_mktsegment,
               substr(c_name, 1, {ER_BLOCK_LEN}) AS blk
        FROM customer),
    cand AS (
        SELECT a.c_custkey, b2.c_custkey AS match_key, b2.c_name AS match_name,
               CAST(levenshtein(a.c_name, b2.c_name) AS INT) AS lev
        FROM b a JOIN b b2 ON a.blk = b2.blk AND a.c_mktsegment = b2.c_mktsegment
                          AND a.c_custkey <> b2.c_custkey
        WHERE levenshtein(a.c_name, b2.c_name) <= {ER_MAX_LEV})
    SELECT c_custkey, match_key, match_name, lev FROM (
        SELECT *, row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY lev, match_key) AS rn
        FROM cand) t
    WHERE rn = 1
"""
