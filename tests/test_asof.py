"""asof_join_pandas (cogrouped applyInPandas) must agree with the
union+window strategy — same semantics, different physical shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.operators.asof import asof_join_pandas, asof_join_union
from osarchiver_spark.sources.parquet import load_table


def _sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    logins = ev.filter(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("event_id").alias("login_id")
    )
    return purchases, logins


def test_pandas_asof_matches_union(spark, sf_small):
    purchases, logins = _sides(spark, sf_small)
    union_rows = {
        tuple(r)
        for r in asof_join_union(
            purchases,
            logins,
            key="user_id",
            left_ts="ts",
            right_ts="ts",
            value_cols=["login_id"],
            left_tiebreak="event_id",
            right_tiebreak="login_id",
        ).collect()
    }
    pandas_rows = {
        tuple(r)
        for r in asof_join_pandas(
            purchases,
            logins,
            key="user_id",
            left_ts="ts",
            right_ts="ts",
            value_cols=["login_id"],
        ).collect()
    }
    assert union_rows == pandas_rows


def test_pandas_asof_handles_missing_right_group(spark, sf_small):
    purchases, logins = _sides(spark, sf_small)
    # drop half the users from the right side: their asof value must
    # come back null, not crash the Arrow conversion
    out = asof_join_pandas(
        purchases,
        logins.filter(F.col("user_id") % 2 == 0),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["login_id"],
    )
    odd = out.filter(F.col("user_id") % 2 == 1)
    assert odd.count() > 0
    assert odd.filter(F.col("asof_login_id").isNotNull()).count() == 0
