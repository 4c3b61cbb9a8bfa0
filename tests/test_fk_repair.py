"""FK repair artifacts: the patch must clear the orphan report when
applied (the invariant the reference's logged UPDATE restores,
common/db.py:505-547), and the rendered statements must match the
reference's SELECT/UPDATE shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osarchiver_spark.operators.fk_repair import (
    apply_fk_repair,
    fk_repair_patch,
    fk_repair_statements,
)
from osarchiver_spark.operators.retention import retention_filter
from osarchiver_spark.sources.parquet import load_table

CUTOFF = datetime(1998, 12, 1)
CHILD_KEYS = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


def _orphans(orders, li):
    archived_parents = retention_filter(orders, "o_orderdate", CUTOFF).select("o_orderkey")
    remaining_children = li.filter(~(F.col("l_shipdate") <= F.lit(CUTOFF)))
    return remaining_children.join(
        archived_parents,
        remaining_children.l_orderkey == archived_parents.o_orderkey,
        "left_semi",
    )


def test_patch_applied_clears_orphan_report(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    assert _orphans(orders, li).count() > 0, "fixture must contain orphans"

    patch = fk_repair_patch(
        li, orders,
        fk="l_orderkey", parent_key="o_orderkey", child_keys=CHILD_KEYS,
        child_deleted="l_shipdate", parent_deleted="o_orderdate", cutoff=CUTOFF,
    )
    repaired = apply_fk_repair(li, patch, CHILD_KEYS, "l_shipdate")
    assert repaired.count() == li.count()  # an UPDATE, not a delete
    assert _orphans(orders, repaired).count() == 0


def test_repair_statements_render_reference_shape(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    patch = fk_repair_patch(
        li, orders,
        fk="l_orderkey", parent_key="o_orderkey", child_keys=CHILD_KEYS,
        child_deleted="l_shipdate", parent_deleted="o_orderdate", cutoff=CUTOFF,
    )
    stmts = fk_repair_statements(
        patch, db="tpch", child_table="lineitem", parent_table="orders",
        fk="l_orderkey", parent_key="o_orderkey", child_deleted="l_shipdate",
        parent_deleted="o_orderdate",
    )
    row = stmts.orderBy("l_orderkey").first()
    key = row.l_orderkey
    assert row.select_stmt == (
        f"SELECT * FROM `tpch`.`lineitem` WHERE `l_orderkey` = '{key}'"
    )
    assert row.update_stmt == (
        "UPDATE `tpch`.`lineitem` INNER JOIN `tpch`.`orders` ON "
        "`tpch`.`orders`.`o_orderkey` = `tpch`.`lineitem`.`l_orderkey` "
        "SET `tpch`.`lineitem`.`l_shipdate` = `tpch`.`orders`.`o_orderdate` "
        f"WHERE l_orderkey = {key} AND `tpch`.`lineitem`.`l_shipdate` IS NULL"
    )
    # one artifact pair per offending parent key
    assert stmts.count() == patch.select("l_orderkey").distinct().count()
