"""The 7 constant r06 engine probes, retired from the registry in r08
(driver-adjudicated green in CORRECTNESS_r06; their question is a
property of constants, not fixture data). This local parity run keeps
the instrument armed: if a DuckDB or Spark upgrade ever moves constant
canonicalization / literal parsing / rounding / regexp semantics, this
fails first and the probe is re-registered in one line
(osarchiver_spark/queries/probes.py RETIRED_QUERIES)."""

from __future__ import annotations

import pytest

from osarchiver_spark.queries.probes import RETIRED_ORACLES, RETIRED_QUERIES
from tests.oracle_harness import compare_query


def test_retired_probe_sets_are_aligned():
    assert set(RETIRED_QUERIES) == set(RETIRED_ORACLES)


def test_retired_probes_are_not_registered():
    """Retirement means retirement — a re-registration must be a
    deliberate one-line act, not an accidental double-listing."""
    from osarchiver_spark.queries import all_queries

    overlap = set(RETIRED_QUERIES) & set(all_queries())
    assert not overlap, f"retired probes back in the registry: {overlap}"


@pytest.mark.parametrize("name", sorted(RETIRED_ORACLES))
def test_retired_probe_parity(spark, sf_small, name):
    compare_query(
        spark, name, RETIRED_QUERIES[name], RETIRED_ORACLES[name], sf_small
    )
