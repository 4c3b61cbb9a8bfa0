"""Dump {query_name: {oracle: md5, src: md5}} for the registry at the
current checkout. Run inside a worktree of an old snapshot to compare a
query's implementation against the round it was last driver-stamped —
this is how REVISED_EPOCHS.json entries are discovered (a green stamp
only certifies the code that existed when it was taken).

Usage: PYTHONPATH=<checkout> python tools/dump_query_fingerprints.py > fp.json
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import json
import sys


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8", "replace")).hexdigest()


def _fn_source(fn) -> str:
    while isinstance(fn, functools.partial):
        fn = fn.func
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):
        code = getattr(fn, "__code__", None)
        return repr(code.co_code) if code is not None else repr(fn)


def main() -> None:
    from osarchiver_spark.queries import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    out = {}
    for name, fn in queries.items():
        out[name] = {
            "oracle": _md5(oracles.get(name, "")),
            "src": _md5(_fn_source(fn)),
        }
    json.dump(out, sys.stdout, indent=0, sort_keys=True)


if __name__ == "__main__":
    main()
