"""Archival-core queries (reference parity: SURVEY §2.1/2.2/2.6).

``orders`` plays the archivable table: ``o_orderdate`` stands in for
the soft-delete ``deleted_at`` column. The run's frozen ``{now}`` is
2001-12-01 with a 36-month retention, giving the cutoff literal
1998-12-01 (MySQL SUBDATE month semantics — see
operators/retention.py).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osarchiver_spark.operators.retention import (
    remaining_after_archive,
    retention_cutoff,
    retention_filter,
)
from osarchiver_spark.functions.precision import sql_double as _SQLD
from osarchiver_spark.operators.quantiles import (
    sql_exact_quantile_nums as _SQL_QN,
)
from osarchiver_spark.sources.parquet import load_table

FROZEN_NOW = datetime(2001, 12, 1)
RETENTION_MONTHS = 36
CUTOFF = retention_cutoff(FROZEN_NOW, RETENTION_MONTHS)  # 1998-12-01
CUTOFF_SQL = "TIMESTAMP '1998-12-01 00:00:00'"


def q_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan: archivable orders (P2/P3 + S8). The cutoff is a
    literal so the filter pushes into the parquet row-group stats."""
    orders = load_table(spark, sf_dir, "orders")
    return retention_filter(orders, "o_orderdate", CUTOFF)


def q_retention_remaining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source after the delete step (S19/J3): anti-join complement of
    the archived key set."""
    orders = load_table(spark, sf_dir, "orders")
    archived = retention_filter(orders, "o_orderdate", CUTOFF)
    return remaining_after_archive(orders, archived, "o_orderkey")


def q_archive_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent re-run (S10): archiving the same rows twice then
    dedup-by-pk yields the single archived set — the Spark rewrite of
    ``INSERT .. ON DUPLICATE KEY UPDATE pk=pk``."""
    orders = load_table(spark, sf_dir, "orders")
    archived = retention_filter(orders, "o_orderdate", CUTOFF)
    return archived.unionAll(archived).dropDuplicates(["o_orderkey"])


def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-pagination emulation (S8/O1/O2): the first 1000-row page
    in pk order — expressed as a top-k, which Spark executes as
    TakeOrderedAndProject (no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy("o_orderkey").limit(1000)


def q_pk_in_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-membership predicate (P7): ``pk IN (literal list)`` as used
    by the reference's chunked deletes."""
    orders = load_table(spark, sf_dir, "orders")
    keys = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987]
    return orders.filter(F.col("o_orderkey").isin(keys))


def q_exclusion_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exclusion-regex filtering (P5/P6) applied to data: events whose
    type does NOT match the exclusion pattern (reference anchors its
    regexes: source/db.py:113-118)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(~F.col("event_type").rlike("^(error|login)$"))


def q_fk_repair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK repair join (J1, common/db.py:521-547): propagate the
    parent's delete timestamp to live children — here, lineitems
    shipped after their order date get the order's date as the
    proposed fix."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    return joined.filter(F.col("l_shipdate") > F.col("o_orderdate")).select(
        "l_orderkey",
        "l_linenumber",
        F.col("o_orderdate").alias("propagated_deleted_at"),
    )


def q_delete_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-delete planning (S19, source/db.py:327-336): assign each
    archivable pk to a 500-row chunk (in pk order) and report chunk
    boundaries — the distributed analog of numpy array_split."""
    orders = load_table(spark, sf_dir, "orders")
    archived = retention_filter(orders, "o_orderdate", CUTOFF).select("o_orderkey")
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.orderBy("o_orderkey"))
    chunked = archived.withColumn("chunk_id", ((rn - F.lit(1)) / F.lit(500)).cast("bigint"))
    return chunked.groupBy("chunk_id").agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").alias("min_pk"),
        F.max("o_orderkey").alias("max_pk"),
    )


def q_fk_orphan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity diagnostics (S20/J2, the Spark rewrite of the
    reference's dichotomic fault isolation + child-row lookup,
    source/db.py:376-426 / common/db.py:505-519): when parents
    (orders) are archived on o_orderdate but children (lineitem) on
    l_shipdate, report children left referencing archived parents —
    a semi-join of remaining children against archived parent keys.

    Unlike the reference (which bisects failing batches at runtime),
    this is a *pre-flight* set-level check: one join instead of
    O(log n) retry rounds."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    archived_parents = retention_filter(orders, "o_orderdate", CUTOFF).select("o_orderkey")
    remaining_children = li.filter(~(F.col("l_shipdate") <= F.lit(CUTOFF)))
    orphans = remaining_children.join(
        archived_parents, remaining_children.l_orderkey == archived_parents.o_orderkey, "left_semi"
    )
    return orphans.groupBy("l_orderkey").agg(
        F.count("*").alias("n_orphan_lines"),
        F.min("l_linenumber").alias("first_line"),
        F.max("l_shipdate").alias("latest_shipdate"),
    )


def q_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INI front end driving the retention scan (reference entry
    shape, config.py:89-156): parse an interpolated config — DEFAULT
    inheritance, boolean coercion, the canonical SUBDATE where with a
    pinned frozen {now} — and return the archivable set its spec
    selects. 24-month retention (distinct from retention_filter's 36)
    so the oracle proves the config path computed its own cutoff."""
    from osarchiver_spark.operators.retention import retention_cutoff, retention_filter as rf
    from osarchiver_spark.plans.config import load_config

    ini = f"""
[DEFAULT]
deleted_column=o_orderdate
retention=24 MONTH
where=${{deleted_column}} <= SUBDATE('{{now}}', INTERVAL ${{retention}})

[archiver:orders]
src=orders_src
enable=true

[src:orders_src]
backend=parquet
directory={sf_dir}
now=2001-12-01T00:00:00
primary_keys=orders:o_orderkey
tables=orders
"""
    (configured,) = load_config(text=ini)
    spec = configured.spec
    cutoff = retention_cutoff(spec.now, spec.retention_months)
    (orders,) = configured.dataframes(spark).values()
    return rf(orders, spec.tables[0].deleted_column, cutoff)


def q_retention_filter_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-month retention through the INI front end (reference
    semantics: the interval string goes straight into SUBDATE, so
    '30 DAY' is as valid as '12 MONTH' — source/db.py:64-65,
    archiver_sample.ini:40). Frozen now 1998-08-15 - 30 DAY gives the
    plain-arithmetic cutoff 1998-07-16."""
    from osarchiver_spark.operators.retention import retention_cutoff, retention_filter as rf
    from osarchiver_spark.plans.config import load_config

    ini = f"""
[archiver:orders_days]
src=orders_days

[src:orders_days]
backend=parquet
directory={sf_dir}
now=1998-08-15T00:00:00
retention=30 DAY
deleted_column=o_orderdate
primary_keys=orders:o_orderkey
tables=orders
"""
    (configured,) = load_config(text=ini)
    spec = configured.spec
    cutoff = retention_cutoff(spec.now, spec.retention_months)
    (orders,) = configured.dataframes(spark).values()
    return rf(orders, spec.tables[0].deleted_column, cutoff)


def q_fk_repair_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK repair artifact (reference common/db.py:505-547): the patch
    DataFrame marking each still-live lineitem of an archived order
    with the deletion date it should inherit — the set-level form of
    the reference's logged repair UPDATE. Applying it empties
    fk_orphan_report (pinned in tests/test_fk_repair.py)."""
    from osarchiver_spark.operators.fk_repair import fk_repair_patch

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return fk_repair_patch(
        li,
        orders,
        fk="l_orderkey",
        parent_key="o_orderkey",
        child_keys=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        child_deleted="l_shipdate",
        parent_deleted="o_orderdate",
        cutoff=CUTOFF,
    )


def q_restore_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-archive (operators/restore.py): rows of the pre-1996 archive
    slice that are missing from a partially-restored source (every 3rd
    key already put back) — the pk anti-join that makes restore
    idempotent and re-runnable, mirrored from the sink's
    insert-if-absent guard."""
    from osarchiver_spark.operators.restore import restore_candidates

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(datetime(1996, 1, 1))
    archived = orders.filter(F.col("o_orderdate") <= cutoff)
    source = orders.filter(
        (F.col("o_orderdate") > cutoff) | (F.col("o_orderkey") % 3 == 0)
    )
    return restore_candidates(archived, source, "o_orderkey")


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history after two CDC batches (operators/scd.py:
    anti-join + union MERGE emulation, one shuffle per batch): batch 1
    bumps every 10th customer's balance at T1, batch 2 bumps every
    20th again at T2. The oracle reconstructs all three version
    layers declaratively."""
    from datetime import datetime

    from osarchiver_spark.operators.scd import scd2_apply, scd2_init

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    hist = scd2_init(cust, datetime(2001, 1, 1))
    upd1 = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)
    )
    hist = scd2_apply(hist, upd1, "c_custkey", datetime(2001, 6, 1))
    upd2 = cust.filter(F.col("c_custkey") % 20 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 200.0, 2)
    )
    return scd2_apply(hist, upd2, "c_custkey", datetime(2001, 9, 1))


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot between the two CDC batches: every 10th
    customer shows the T1 version, everyone else the original."""
    from datetime import datetime

    from osarchiver_spark.operators.scd import scd2_as_of

    hist = q_scd2_history(spark, sf_dir)
    return scd2_as_of(hist, datetime(2001, 7, 1))


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` — the ANALYZE-style probe behind
    archivability checks and dry-run reporting (reference probes
    information_schema per column, common/db.py:416-436).

    One scan, but |cols| EXACT distinct counts make Catalyst plan an
    Expand (×|cols|+1 row amplification before the two-phase agg) —
    the honest cost of exact multi-distinct, kept here because the
    oracle demands exactness. At 100 TB swap ``count_distinct`` for
    ``approx_count_distinct`` (HLL++): same single scan, no Expand,
    ~2% error — the ANALYZE trade every warehouse makes."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in orders.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"d_{c}"))
    wide = orders.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack = ", ".join(f"'{c}', n_{c}, d_{c}" for c in orders.columns)
    return wide.selectExpr(
        "n_rows",
        f"stack({len(orders.columns)}, {stack}) AS (col_name, n_nulls, n_distinct)",
    ).select("col_name", "n_nulls", "n_distinct", "n_rows")


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations, one row per rule with
    its violation count — the pre-archive gate a pipeline runs before
    trusting a source. Predicate rules fuse into one scan each; the
    referential rule is a left-anti join (the same shape as the
    delete rewrite); the uniqueness rule is a keyed count-filter."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        orders.filter(~(F.col("o_totalprice") > 0)).agg(
            F.lit("orders.o_totalprice_positive").alias("rule"),
            F.count(F.lit(1)).alias("n_violations"),
        ),
        orders.filter(F.col("o_orderdate").isNull()).agg(
            F.lit("orders.o_orderdate_not_null").alias("rule"),
            F.count(F.lit(1)).alias("n_violations"),
        ),
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").agg(
            F.lit("lineitem.orderkey_references_orders").alias("rule"),
            F.count(F.lit(1)).alias("n_violations"),
        ),
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > 1)
        .agg(
            F.lit("orders.o_orderkey_unique").alias("rule"),
            F.count(F.lit(1)).alias("n_violations"),
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out


def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout derivation + its locality evidence: interleave
    (o_custkey, order-day) bits into the Morton value, cut the curve
    into 64 contiguous segments (the would-be output files), and show
    each segment's min/max in BOTH dimensions — the rectangles
    parquet min/max stats would prune against after
    operators/layout.py::zorder_layout rewrites the table. The
    interleave expression is engine-portable integer arithmetic, so
    the whole derivation is exactly oracle-checked."""
    from osarchiver_spark.operators.layout import zorder_sql

    orders = load_table(spark, sf_dir, "orders")
    z = zorder_sql("o_custkey", "datediff(o_orderdate, DATE '1992-01-01')", bits=14)
    return (
        orders.select(
            F.expr(f"{z} >> 18").alias("curve_bucket"),
            F.col("o_custkey"),
            F.expr("datediff(o_orderdate, DATE '1992-01-01')").alias("day_no"),
        )
        .groupBy("curve_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("day_no").alias("min_day"),
            F.max("day_no").alias("max_day"),
        )
    )


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (Debezium/binlog feed → current state):
    a deterministic three-generation changelog synthesized from
    orders — every key INSERTed at seq 1, keys divisible by 3 UPDATEd
    at seq 2 (price +100.00 — an exact float op, so both engines
    produce bit-identical payloads), keys divisible by 7 DELETEd at seq 3 — is
    materialized by operators/merge.py::cdc_apply: one map-combinable
    max_by aggregation per key, no window or self-join. The oracle
    replays the same changelog with arg_max."""
    from osarchiver_spark.operators.merge import cdc_apply

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
        F.col("o_totalprice").alias("price"),
    )
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
        (F.col("o_totalprice") + 100.0).alias("price"),
    )
    dele = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(3).alias("seq"),
        F.lit(None).cast("double").alias("price"),
    )
    changelog = base.unionByName(upd).unionByName(dele)
    return cdc_apply(changelog, "o_orderkey", "seq")


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table diff between two snapshots (the regression check a
    pipeline runs after a backfill): snapshot B is orders with keys
    divisible by 11 dropped and keys divisible by 5 repriced (+1.00);
    the diff classifies every affected key as removed / changed (with
    both prices) via one full-outer join on the pk. Unchanged rows are
    filtered out pre-join on cheap predicates where possible; the join
    itself is the only shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_orderkey", F.col("o_totalprice").alias("price_a"))
    b = (
        orders.filter(F.col("o_orderkey") % 11 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")).alias("price_b"),
        )
    )
    joined = a.join(b, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("price_b").isNull(), "removed")
        .when(F.col("price_a").isNull(), "added")
        .when(F.col("price_a") != F.col("price_b"), "changed")
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select("o_orderkey", "change_type", "price_a", "price_b")
    )


def q_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: median absolute deviation
    around the exact median — the robust twin of stddev that heavy
    tails can't inflate.

    r07 hardening: both medians are EXACT integer-rational order
    statistics over the value's cent grid (operators/quantiles.py —
    engine percentile interpolation is last-ulp-divergent, the class
    the sf1 sweep demonstrated on winsorize_events). The median lives
    on the half-cent grid (med_num/200 dollars), deviations
    |c·2 − med_num| are exact half-cent integers, and the MAD on
    their half-grid is mad_num/400 dollars — each emitted as one
    exact-int→double cast + one IEEE division."""
    from osarchiver_spark.functions.precision import quantize
    from osarchiver_spark.operators.quantiles import exact_quantile_nums

    ev = load_table(spark, sf_dir, "events")
    evc = ev.select("event_type", quantize(F.col("value"), 2).alias("c"))
    med = exact_quantile_nums(evc, "event_type", "c", {"med": (1, 2)})
    dev = evc.join(
        F.broadcast(med.select("event_type", "med_num")), "event_type"
    ).select("event_type", F.abs(F.col("c") * 2 - F.col("med_num")).alias("d"))
    mad = exact_quantile_nums(dev, "event_type", "d", {"mad": (1, 2)})
    return med.join(mad.select("event_type", "mad_num"), "event_type").select(
        "event_type",
        ((F.col("med_num") * F.lit(5000)).cast("double") / F.lit(1000000.0)).alias(
            "median_value"
        ),
        ((F.col("mad_num") * F.lit(2500)).cast("double") / F.lit(1000000.0)).alias(
            "mad"
        ),
    )


def q_archive_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-reconciliation digests for archive verification: the pk set
    of each of 16 buckets summarized as (count, XOR of a 32-bit
    md5-derived key hash). Comparing these digests between source and
    archive proves row-set equality per bucket without moving data —
    the distributed answer to 'did every archived pk land?', O(1)
    output per bucket, map-combinable bit_xor agg, one pass. (XOR is
    order- and partition-independent, which is exactly why it works as
    a shuffle-free distributed checksum.)"""
    orders = load_table(spark, sf_dir, "orders")
    h32 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        orders.select((F.col("o_orderkey") % 16).alias("bucket"), h32.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("set_digest"),
        )
    )


QUERIES = {
    "archive_checksums": q_archive_checksums,
    "cdc_apply": q_cdc_apply,
    "snapshot_diff": q_snapshot_diff,
    "grouped_mad": q_grouped_mad,
    "zorder_locality": q_zorder_locality,
    "restore_candidates": q_restore_candidates,
    "profile_table": q_profile_table,
    "dq_checks": q_dq_checks,
    "scd2_history": q_scd2_history,
    "scd2_asof": q_scd2_asof,
    "retention_filter_days": q_retention_filter_days,
    "config_pipeline": q_config_pipeline,
    "fk_repair_patch": q_fk_repair_patch,
    "fk_orphan_report": q_fk_orphan_report,
    "retention_filter": q_retention_filter,
    "retention_remaining": q_retention_remaining,
    "archive_idempotent": q_archive_idempotent,
    "keyset_page": q_keyset_page,
    "pk_in_membership": q_pk_in_membership,
    "exclusion_regex": q_exclusion_regex,
    "fk_repair_join": q_fk_repair_join,
    "delete_chunks": q_delete_chunks,
}

def _profile_sql() -> str:
    # the fixture orders schema (TESTDATA.md); the Spark side iterates
    # df.columns so the two stay aligned as long as this list matches
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    branches = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, "
        f"CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"CAST(count(*) AS BIGINT) AS n_rows FROM orders"
        for c in cols
    )
    return branches


def _zorder_oracle() -> str:
    from osarchiver_spark.operators.layout import zorder_sql

    z = zorder_sql("o_custkey", "date_diff('day', DATE '1992-01-01', o_orderdate)", bits=14)
    return f"""
        SELECT ({z} >> 18) AS curve_bucket,
               count(*) AS n_rows,
               min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
               min(date_diff('day', DATE '1992-01-01', o_orderdate)) AS min_day,
               max(date_diff('day', DATE '1992-01-01', o_orderdate)) AS max_day
        FROM orders
        GROUP BY 1
    """


ORACLES = {
    "archive_checksums": """
        SELECT o_orderkey % 16 AS bucket,
               count(*) AS n_rows,
               CAST(bit_xor(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                                 AS UBIGINT)) AS BIGINT) AS set_digest
        FROM orders
        GROUP BY 1
    """,
    "snapshot_diff": """
        WITH a AS (
            SELECT o_orderkey, o_totalprice AS price_a FROM orders),
        b AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                        ELSE o_totalprice END AS price_b
            FROM orders WHERE o_orderkey % 11 <> 0)
        SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN b.price_b IS NULL THEN 'removed'
                    WHEN a.price_a IS NULL THEN 'added'
                    WHEN a.price_a <> b.price_b THEN 'changed' END AS change_type,
               a.price_a, b.price_b
        FROM a FULL OUTER JOIN b USING (o_orderkey)
        WHERE (CASE WHEN b.price_b IS NULL THEN 'removed'
                    WHEN a.price_a IS NULL THEN 'added'
                    WHEN a.price_a <> b.price_b THEN 'changed' END) IS NOT NULL
    """,
    # exact integer-rational medians (operators/quantiles.py) — see
    # q_grouped_mad docstring
    "grouped_mad": f"""
        WITH cents AS (
            SELECT event_type,
                   CAST(floor(value * {_SQLD('100')}
                              + {_SQLD('0.5')}) AS BIGINT) AS c
            FROM events),
        med AS ({_SQL_QN("cents", "event_type", "c", {"med": (1, 2)})}),
        dev AS (
            SELECT e.event_type, abs(e.c * 2 - m.med_num) AS d
            FROM cents e JOIN med m USING (event_type)),
        mad AS ({_SQL_QN("dev", "event_type", "d", {"mad": (1, 2)})})
        SELECT event_type,
               CAST(med.med_num * 5000 AS DOUBLE)
                   / {_SQLD('1000000')} AS median_value,
               CAST(mad.mad_num * 2500 AS DOUBLE)
                   / {_SQLD('1000000')} AS mad
        FROM med JOIN mad USING (event_type)
    """,
    "cdc_apply": """
        WITH changelog AS (
            SELECT o_orderkey, 'I' AS op, 1 AS seq, o_totalprice AS price
            FROM orders
            UNION ALL
            SELECT o_orderkey, 'U', 2, o_totalprice + 100.0
            FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT o_orderkey, 'D', 3, NULL
            FROM orders WHERE o_orderkey % 7 = 0),
        w AS (
            SELECT o_orderkey,
                   arg_max(op, seq) AS op,
                   arg_max(price, seq) AS price,
                   max(seq) AS last_seq
            FROM changelog GROUP BY 1)
        SELECT o_orderkey, price, last_seq FROM w WHERE op <> 'D'
    """,
    "zorder_locality": _zorder_oracle(),
    "restore_candidates": """
        SELECT * FROM orders
        WHERE o_orderdate <= TIMESTAMP '1996-01-01'
          AND o_orderkey NOT IN (
              SELECT o_orderkey FROM orders
              WHERE o_orderdate > TIMESTAMP '1996-01-01' OR o_orderkey % 3 = 0)
    """,
    "profile_table": _profile_sql(),
    "dq_checks": """
        SELECT 'orders.o_totalprice_positive' AS rule,
               CAST(count(*) FILTER (WHERE NOT (o_totalprice > 0)) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderdate_not_null',
               CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem.orderkey_references_orders',
               CAST(count(*) AS BIGINT)
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orders.o_orderkey_unique',
               CAST(count(*) AS BIGINT)
        FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
    """,
    "scd2_history": """
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2001-01-01' AS valid_from,
               CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '2001-06-01' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2),
               TIMESTAMP '2001-06-01',
               CASE WHEN c_custkey % 20 = 0 THEN TIMESTAMP '2001-09-01' END
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, c_name, round(c_acctbal + 200.0, 2),
               TIMESTAMP '2001-09-01', NULL
        FROM customer WHERE c_custkey % 20 = 0
    """,
    "scd2_asof": """
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2001-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer WHERE c_custkey % 10 <> 0
        UNION ALL
        SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2),
               TIMESTAMP '2001-06-01',
               CASE WHEN c_custkey % 20 = 0 THEN TIMESTAMP '2001-09-01' END
        FROM customer WHERE c_custkey % 10 = 0
    """,
    "retention_filter_days": (
        "SELECT * FROM orders "
        "WHERE o_orderdate <= TIMESTAMP '1998-08-15 00:00:00' - INTERVAL 30 DAY"
    ),
    "config_pipeline": "SELECT * FROM orders WHERE o_orderdate <= TIMESTAMP '1999-12-01 00:00:00'",
    "fk_repair_patch": f"""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               o_orderdate AS patched_deleted
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate <= {CUTOFF_SQL}
          AND (l_shipdate IS NULL OR NOT l_shipdate <= {CUTOFF_SQL})
    """,
    "fk_orphan_report": f"""
        SELECT l_orderkey, count(*) AS n_orphan_lines,
               min(l_linenumber) AS first_line,
               max(l_shipdate) AS latest_shipdate
        FROM lineitem
        WHERE NOT (l_shipdate <= {CUTOFF_SQL})
          AND l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_orderdate <= {CUTOFF_SQL})
        GROUP BY l_orderkey
    """,
    "retention_filter": f"SELECT * FROM orders WHERE o_orderdate <= {CUTOFF_SQL}",
    "retention_remaining": f"""
        SELECT * FROM orders
        WHERE o_orderkey NOT IN (
            SELECT o_orderkey FROM orders WHERE o_orderdate <= {CUTOFF_SQL}
        )
    """,
    "archive_idempotent": f"""
        SELECT * FROM orders WHERE o_orderdate <= {CUTOFF_SQL}
    """,
    "keyset_page": "SELECT * FROM orders ORDER BY o_orderkey LIMIT 1000",
    "pk_in_membership": """
        SELECT * FROM orders
        WHERE o_orderkey IN (1,2,3,5,8,13,21,34,55,89,144,233,377,610,987)
    """,
    "exclusion_regex": """
        SELECT * FROM events
        WHERE NOT regexp_matches(event_type, '^(error|login)$')
    """,
    "fk_repair_join": """
        SELECT l_orderkey, l_linenumber, o_orderdate AS propagated_deleted_at
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate
    """,
    "delete_chunks": f"""
        WITH archived AS (
            SELECT o_orderkey,
                   CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 500) AS BIGINT)
                       AS chunk_id
            FROM orders WHERE o_orderdate <= {CUTOFF_SQL}
        )
        SELECT chunk_id, count(*) AS n_rows,
               min(o_orderkey) AS min_pk, max(o_orderkey) AS max_pk
        FROM archived GROUP BY chunk_id
    """,
}
