from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osarchiver_spark.plans.retry import bisect_failing_rows, retry_with_backoff
from osarchiver_spark.sources.parquet import load_table


def test_retry_succeeds_after_transient_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert retry_with_backoff(flaky, backoff_s=0.0) == "ok"
    assert len(calls) == 3


def test_retry_fail_fast_on_non_retryable():
    def bad():
        raise ValueError("fk violation")

    with pytest.raises(ValueError):
        retry_with_backoff(bad, backoff_s=0.0, retryable=lambda e: not isinstance(e, ValueError))


def test_bisect_isolates_poison_rows(spark, sf_small):
    orders = load_table(spark, sf_small, "orders").filter(F.col("o_orderkey") < 200)
    poison_keys = {42, 137}
    written = []

    def write_fn(part):
        keys = [r.o_orderkey for r in part.select("o_orderkey").collect()]
        if set(keys) & poison_keys:
            raise RuntimeError("integrity error")
        written.extend(keys)

    found = bisect_failing_rows(orders, "o_orderkey", write_fn)
    assert set(found) == poison_keys
    # every non-poison row got written exactly once overall
    all_keys = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    assert set(written) == all_keys - poison_keys
    assert len(written) == len(set(written))
