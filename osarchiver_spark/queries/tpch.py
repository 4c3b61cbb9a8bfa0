"""TPC-H completion queries (SURVEY §2.3/§2.4 joins + aggregations).

The remaining TPC-H shapes the fixture schema supports: q7/q8/q9
(multi-nation star joins), q10 (top-k revenue), q13 (outer-join
distribution), q15 (view + max), q18 (having semi-join), q21
(exists / not-exists self joins), q22 (scalar subquery + anti join).
The fixtures have no partsupp/c_phone/l_commitdate columns, so q9,
q13, q21 and q22 keep the reference plan shape with adapted
predicates (noted per query). The reference engine has none of these
(its only SQL is generated archival DML); they're part of the
"complete engine" bar.

Scale notes: every dimension side (nation, supplier, customer at
fixture ratios, grouped-having outputs) is broadcastable and AQE
broadcasts them under the 64 MB threshold; the q21 self-joins
shuffle on l_orderkey three times and AQE reuses the exchange; no
query materializes a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import exact_round, money_sum, quantize
from osarchiver_spark.sources.parquet import load_table

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, by direction and
    year. Two aliased nation joins; both broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8") | (
        F.col("supp_nation") == "NATION_8"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(_rev(), 4, 2).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3 suppliers' share of ECONOMY-part revenue
    sold to AMERICA-region customers, per order year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    return (
        li.join(part.filter(F.col("p_type") == "ECONOMY"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(region.filter(F.col("r_name") == "AMERICA"), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            exact_round(
                F.sum(quantize(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0.0)), 4))
                / F.sum(quantize(_rev(), 4)),
                4,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so supply cost is
    estimated from p_retailprice): profit on STANDARD parts by
    supplier nation and order year.

    Float determinism: the per-row profit term is QUANTIZED to integer
    micro-units before the group sum (the target_encode_loo / psi_drift
    discipline), so the cross-engine aggregate is exact bigint
    arithmetic and the cents rounding happens in integer space — a
    `round(sum(double), 2)` here flipped a .xx5 boundary between Spark
    and DuckDB at sf0.1 (accumulation-order-dependent last bit)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    profit_q = quantize(_rev() - F.col("p_retailprice") * F.col("l_quantity"), 6)
    return (
        li.join(part.filter(F.col("p_type") == "STANDARD"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.floor((F.sum(profit_q) + F.lit(5000)) / F.lit(10000)) / F.lit(100.0)
            ).alias("profit_est")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a
    quarter; top 20 with deterministic tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(_rev(), 4, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (adapted: the order-exclusion predicate uses
    o_orderpriority — the fixture has no o_comment): distribution of
    customers by order count, nulls from the outer join counting as
    zero."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum 3-month revenue — the
    revenue CTE aggregates once; rank()==1 keeps all ties exactly
    like the spec's equality-with-max."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_sum(_rev(), 4, 2).alias("total_revenue"))
    )
    w = W.orderBy(F.col("total_revenue").desc())
    top = revenue.withColumn("rk", F.rank().over(w)).filter(F.col("rk") == 1).drop("rk")
    return (
        supp.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250 (fixture
    max ≈ 458). The grouped-having output is small → broadcastable
    semi-join back against orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(quantize(F.col("l_quantity"), 0)).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: lateness = shipped >60 days after
    order date — the fixture has no commit/receipt dates): suppliers
    who were the ONLY late supplier in a multi-supplier order.

    The oracle keeps the textbook EXISTS/NOT EXISTS form; here both
    decorrelate into per-order AGGREGATES instead of semi/anti
    self-joins. For a late line (o, s): "another supplier's line
    exists in o" ⟺ o has ≥2 distinct suppliers, and "no other
    supplier shipped late in o" ⟺ o's late lines span exactly one
    distinct supplier (min == max) — which is then the waiting
    supplier, so the joins against the 60M-row lineitem collapse to
    two order-grained aggregates joined on l_orderkey. The sf10
    rehearsal measured the self-join form at 168 s (three
    lineitem-wide exchanges, `late` computed twice); the aggregate
    form moves the fact table once, and the late aggregate reuses the
    l_orderkey partitioning the orders join already established."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # orders whose late lines all belong to one supplier: that
    # supplier + its late-line count (= this order's numwait rows)
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("late_cnt"),
            F.min("l_suppkey").alias("mn_supp"),
            F.max("l_suppkey").alias("mx_supp"),
        )
        .filter(F.col("mn_supp") == F.col("mx_supp"))
        .select("l_orderkey", F.col("mn_supp").alias("l_suppkey"), "late_cnt")
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .select("l_orderkey")
    )
    return (
        sole_late.join(multi_supp, "l_orderkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_cnt").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nation keys replace phone country
    codes, and "no orders" means none in the dataset's final year —
    every fixture customer has some order): well-funded customers in
    seven nations with no recent orders. Scalar subquery broadcasts;
    NOT EXISTS is an anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nations = [3, 8, 12, 13, 15, 18, 19]
    pool = cust.filter(F.col("c_nationkey").isin(nations))
    avg_bal = pool.filter(F.col("c_acctbal") > 0).agg(
        exact_round(
            F.sum(quantize(F.col("c_acctbal"), 2)) / (F.count(F.lit(1)) * F.lit(100.0)), 2
        ).alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-08-01")).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            money_sum(F.col("c_acctbal"), 2, 2).alias("totacctbal"),
        )
    )


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: the fixtures have no partsupp table, so the
    distinct (l_partkey, l_suppkey) pairs stand in for it and the
    minimum observed unit price is the supply-cost estimate. One
    hash-aggregate shuffle; min() is order-independent so the value
    is bit-stable across engines before rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        exact_round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias("supplycost")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: supply cost derived per _partsupp):
    for each small STANDARD part, the EUROPE supplier(s) offering the
    minimum supply cost. The correlated MIN subquery is a rank()==1
    window over p_partkey — ties kept exactly like the spec's
    equality-with-min; the part filter prunes before the window so
    the shuffle is on the filtered subset only."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    w = W.partitionBy("p_partkey").orderBy("supplycost")
    return (
        part.join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: part value = extended price shipped
    by NATION_3 suppliers): parts whose value exceeds a multiple of
    the average part value — scale-invariant where the spec's fixed
    fraction is 1/SF-scaled. The scalar-subquery threshold is a
    one-row broadcast; per-part values round to 2 decimals on both
    sides so summation order can't flip the threshold compare."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    values = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(quantize(F.col("l_extendedprice"), 2)).alias("c"))
    )
    threshold = values.agg(
        exact_round(F.sum("c") * 2.0 / (F.count(F.lit(1)) * F.lit(100.0)), 2).alias("thr")
    )
    return (
        values.crossJoin(F.broadcast(threshold))
        .filter(F.col("c") / F.lit(100.0) > F.col("thr"))
        .select("l_partkey", (F.col("c") / F.lit(100.0)).alias("value"))
    )


def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the complaint exclusion is suppliers
    with negative balance): distinct supplier count per surviving
    (brand, type, size). NOT IN compiles to a broadcast anti-join
    (keys are non-null by construction); countDistinct is the only
    shuffle on data-sized input."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45, 49)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: "excess stock" = a supplier shipped
    more than half of a small-part's 1997 volume): suppliers
    dominating supply of any qualifying part. The per-part total
    re-aggregates the per-(part,supplier) partials — one scan, two
    cascaded hash aggs, never a second pass over lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    per_ps = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(quantize(F.col("l_quantity"), 0)).alias("qty_raw"))
    )
    per_part = per_ps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty_raw").alias("total_qty")
    )
    dominant = (
        per_ps.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(2 * F.col("qty_raw") > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    "q20_potential_promotion": q20_potential_promotion,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   floor(min(l_extendedprice / l_quantity) * 100.0 + 0.5) / 100.0 AS supplycost
            FROM lineitem GROUP BY 1, 2
        ), ranked AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost,
                   rank() OVER (PARTITION BY p_partkey ORDER BY supplycost) AS rk
            FROM part
            JOIN ps ON p_partkey = l_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
        FROM ranked WHERE rk = 1
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q11_important_stock": """
        WITH v AS (
            SELECT l_partkey,
                   sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS c
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY 1
        )
        SELECT l_partkey, c / 100.0 AS value FROM v
        WHERE c / 100.0 > (SELECT floor(sum(c) * 2.0 / (count(*) * 100.0) * 100.0 + 0.5) / 100.0
                           FROM v)
    """,
    "q16_parts_supplier_relationship": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q20_potential_promotion": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty_raw
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%' AND year(l_shipdate) = 1997
            GROUP BY 1, 2
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT ps.l_suppkey
            FROM ps
            JOIN (SELECT l_partkey AS pk, sum(qty_raw) AS total_qty
                  FROM ps GROUP BY 1) tot
              ON ps.l_partkey = tot.pk
            WHERE 2 * qty_raw > total_qty
        )
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) + 50) / 100) / 100.0) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
           OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               floor(sum(CAST(floor((CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 10000.0 + 0.5) AS BIGINT))
                     / sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) * 10000.0 + 0.5) / 10000.0 AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        GROUP BY 1
    """,
    "q9_product_profit": """
        -- per-row micro-unit quantization before the sum, cents
        -- rounding in integer space: mirrors the Spark query exactly
        -- (the quantize/psi_drift fixed-point discipline)
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                      - p_retailprice * l_quantity)
                                     * 1000000.0 + 0.5) AS BIGINT)) + 5000)
                     / 10000) / 100.0 AS profit_est
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) + 50) / 100) / 100.0) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY 1
        )
        GROUP BY 1
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   (floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) + 50) / 100) / 100.0) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "q18_large_volume_customer": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN (
            SELECT l_orderkey,
                   CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 250
        ) big ON o_orderkey = big.l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q21_waiting_supplier": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q22_global_sales_opportunity": """
        SELECT c_nationkey, count(*) AS numcust,
               (sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0) AS totacctbal
        FROM customer c
        WHERE c_nationkey IN (3, 8, 12, 13, 15, 18, 19)
          AND c_acctbal > (SELECT floor(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                                         / (count(*) * 100.0) * 100.0 + 0.5) / 100.0
                           FROM customer
                           WHERE c_acctbal > 0
                             AND c_nationkey IN (3, 8, 12, 13, 15, 18, 19))
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
        GROUP BY 1
    """,
}
