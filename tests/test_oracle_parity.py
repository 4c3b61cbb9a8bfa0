"""Differential test: every registered query with an oracle must
match DuckDB at sf0.001 (fast) — the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from osarchiver_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare_query

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity_small(spark, sf_small, name):
    compare_query(spark, name, _QUERIES[name], _ORACLES[name], sf_small)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs(spark, sf_small, name):
    df = _QUERIES[name](spark, sf_small)
    assert df.count() >= 0
