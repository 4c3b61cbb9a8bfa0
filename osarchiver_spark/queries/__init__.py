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
    "tpch",
    "windows",
    "events_analytics",
    "dedup",
    "similarity",
    "text",
    "sampling",
    "multimodal",
    "graph",
    "indexing",
    "ml",
    "probes",
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
    queries = _prioritize(queries)
    return queries, oracles


# KNOWN LIMITATION of the external harness: it adjudicates at most ~50
# registry entries per round, in insertion order, so a single fixed order
# would re-verify the same front forever and never cover the rest. The
# registry therefore orders itself LEAST-RECENTLY-VERIFIED-FIRST, derived
# from the committed CORRECTNESS_r*.json records:
#
#   1. queries checked but never hash-green (errors, rows-only): these
#      carry a committed fix awaiting re-adjudication, the highest-value
#      rows on the board,
#   2. queries with no driver record at all, oldest registration round
#      first (REGISTRY_EPOCHS.json) — so a query added THIS round queues
#      behind the existing never-checked backlog instead of displacing
#      it alphabetically past the cap,
#   3. hash-green queries REVISED SINCE their stamp (REVISED_EPOCHS.json
#      records the round of each material rewrite; revision epoch >
#      last-green round means the green stamp certifies code that no
#      longer exists — the r04–r07 HUGEINT lesson is that local sweeps
#      cannot see driver-environment divergence, only a stamp can),
#      stalest stamp first,
#   4. hash-green queries, oldest green round first (fair round-robin).
#
# This is a scheduling policy, not a result filter: with ~219 entries
# and a ~50-row cap the full re-verification cadence is ~4.4 rounds
# (r06 measured cohorts last driver-checked in r02/r03), so a
# regression is caught with bounded — not two-round — staleness, and
# nothing is parked permanently. Registration discipline matters: each
# new entry displaces a stale-green recheck, so add entries only when
# they pay for the slot.
# Local oracle parity for ALL registered oracles additionally runs in
# every pytest (tests/test_oracle_parity.py), independent of the cap.
# REGISTRY_EPOCHS.json is committed and append-only; a registry entry
# missing from it fails tests/test_registry_order.py.


def _epoch_map(filename: str) -> dict[str, int]:
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parents[2] / filename
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        return {}
    return {k: int(v) for k, v in data.items()} if isinstance(data, dict) else {}


def _registration_epochs() -> dict[str, int]:
    """query name -> round the query was first registered (committed,
    append-only; only orders WITHIN the never-checked tier)."""
    return _epoch_map("REGISTRY_EPOCHS.json")


def _revision_epochs() -> dict[str, int]:
    """query name -> round of the query's last MATERIAL revision (Spark
    plan or oracle SQL changed in a way that could alter output values).
    Committed and bumped by hand whenever an already-green query is
    rewritten; entries with revision epoch > last-green round re-queue
    ahead of the stale-green round-robin so the driver re-certifies the
    code that actually ships. Discovered/audited mechanically with
    tools/dump_query_fingerprints.py against the round snapshots."""
    return _epoch_map("REVISED_EPOCHS.json")


def _adjudication_history() -> dict[str, tuple[int, int]]:
    """query name -> (last hash-green round, last checked round); -1 = never."""
    import json
    import re
    from pathlib import Path

    hist: dict[str, tuple[int, int]] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)$", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            green = isinstance(row, dict) and row.get("hash_match") is True
            last_green, _ = hist.get(name, (-1, -1))
            hist[name] = (rnd if green else last_green, rnd)
    return hist


def _prioritize(queries: dict[str, QueryFn]) -> dict[str, QueryFn]:
    hist = _adjudication_history()
    epochs = _registration_epochs()
    revised = _revision_epochs()

    def key(n: str):
        last_green, last_checked = hist.get(n, (-1, -1))
        if last_green < 0 <= last_checked:
            tier = 0  # checked, never green: a fix awaits re-adjudication
            epoch = 0
        elif last_checked < 0:
            tier = 1  # never seen by the driver: oldest registration first
            epoch = epochs.get(n, 10**9)  # unknown epoch = newest = last
        elif revised.get(n, -1) > last_green:
            tier = 2  # green stamp predates a material rewrite: re-certify
            epoch = 0
        else:
            tier = 3  # green: round-robin, stalest first
            epoch = 0
        return (tier, epoch, last_green, last_checked, n)

    ordered = sorted(queries, key=key)
    return {n: queries[n] for n in ordered}


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
