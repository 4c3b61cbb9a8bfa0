"""The registry's least-recently-verified-first scheduling is
load-bearing (it decides which entries the external harness
re-adjudicates under its ~50-row cap) — pin the tier order."""

from __future__ import annotations

import osarchiver_spark.queries as reg


def test_prioritize_tiers(monkeypatch):
    hist = {
        "green_old": (1, 2),     # hash-green in r1, last checked r2
        "green_new": (2, 2),     # hash-green in r2
        "failed_once": (-1, 2),  # checked r2, never green -> tier 0
        # "brand_new" absent -> tier 1
    }
    monkeypatch.setattr(reg, "_adjudication_history", lambda: hist)
    queries = {n: (lambda s, d: None) for n in
               ["green_new", "brand_new", "failed_once", "green_old"]}
    ordered = list(reg._prioritize(queries))
    assert ordered == ["failed_once", "brand_new", "green_old", "green_new"]


def test_prioritize_epoch_orders_within_never_checked(monkeypatch):
    """Within the never-checked tier, an older registration epoch must
    come first regardless of name — a new round's additions queue
    behind the existing backlog instead of displacing it."""
    monkeypatch.setattr(reg, "_adjudication_history", lambda: {})
    monkeypatch.setattr(
        reg, "_registration_epochs", lambda: {"zz_old": 3, "aa_new": 4}
    )
    queries = {n: (lambda s, d: None) for n in ["aa_new", "zz_old", "unknown"]}
    ordered = list(reg._prioritize(queries))
    assert ordered == ["zz_old", "aa_new", "unknown"]


def test_every_registry_entry_has_an_epoch():
    """REGISTRY_EPOCHS.json is the committed, append-only record of
    when each query was first registered; a missing entry would make
    its tier-1 position undefined (it would sort last)."""
    epochs = reg._registration_epochs()
    missing = sorted(set(reg.all_queries()) - set(epochs))
    assert not missing, f"add to REGISTRY_EPOCHS.json: {missing}"


def test_prioritize_is_total_and_stable():
    q = reg.all_queries()
    assert sorted(q) == sorted(reg.all_queries())  # same set, any order
    assert len(q) == len(set(q))


def test_bench_headline_is_a_registry_subset():
    """Every bench headline entry must exist in the registry — a
    renamed or dropped query would otherwise silently null its bench
    timing instead of failing the build."""
    import bench

    from osarchiver_spark.queries import all_queries

    registry = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline entries"
