"""Local mirror of the driver's per-round adjudication.

Runs registry queries against their DuckDB oracles BIT-EXACT at the
driver's scale (sf0.01), in the same least-recently-verified order the
driver samples, via tests/oracle_harness.compare_query — the harness
whose zero-tolerance canonicalization exists precisely because two r04
queries passed a 1e-9-tolerant local sweep and then hash-failed
adjudication.

Usage:
    python tools/driver_window_sim.py            # first 50 (the window)
    python tools/driver_window_sim.py --all      # every registry entry
    python tools/driver_window_sim.py --all SF_DIR

Exit 0 iff every compared query matches. Queries without an oracle
(rows-only at the driver) are reported and skipped.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from oracle_harness import compare_query

    from osarchiver_spark.session import get_spark

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = list(qs) if run_all else list(qs)[:50]
    spark = get_spark("driver-window-sim")
    fails: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        if name not in oracles:
            print(f"{i:3d} {name}: no oracle (rows-only at driver) — skipped")
            continue
        t = time.time()
        try:
            compare_query(spark, name, qs[name], oracles[name], sf_dir, exact=True)
            print(f"{i:3d} {name}: OK ({time.time() - t:.1f}s)", flush=True)
        except Exception as exc:  # report every failure, keep sweeping
            fails.append(name)
            print(f"{i:3d} {name}: FAIL {str(exc)[:300]}", flush=True)
    print(f"\nTOTAL {len(names)} in {time.time() - t0:.0f}s; fails={fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
