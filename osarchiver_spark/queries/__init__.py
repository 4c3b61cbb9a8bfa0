"""Named query registry: every operator from SURVEY §2 (plus the
north-star extensions) gets a (spark, sf_dir) -> DataFrame callable
and, when SQL-expressible, a DuckDB oracle with IDENTICAL column
names/aliases so the driver's order-insensitive value-hash matches.

Float discipline: aggregate outputs are rounded to fixed decimals on
BOTH sides so cross-engine summation-order noise (last-ulp) can't
flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "archival",
    "relational",
    "windows",
    "dedup",
    "similarity",
    "text",
    "multimodal",
]


def _load():
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(f"osarchiver_spark.queries.{mod_name}")
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise RuntimeError(f"duplicate query names: {dup}")
        queries.update(q)
        oracles.update(o)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise RuntimeError(f"oracles without queries: {unknown}")
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
