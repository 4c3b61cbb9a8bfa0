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
    monkeypatch.setattr(reg, "_revision_epochs", lambda: {})
    queries = {n: (lambda s, d: None) for n in
               ["green_new", "brand_new", "failed_once", "green_old"]}
    ordered = list(reg._prioritize(queries))
    assert ordered == ["failed_once", "brand_new", "green_old", "green_new"]


def test_prioritize_revised_since_stamp_tier(monkeypatch):
    """A green query materially rewritten AFTER its stamp must re-queue
    ahead of the stale-green round-robin (but behind fixes and
    never-checked entries) — its green stamp certifies code that no
    longer exists. Within the tier, stalest stamp first."""
    hist = {
        "green_stale": (1, 1),     # green r1, untouched since
        "green_fresh": (3, 3),     # green r3, untouched since
        "revised_r1": (1, 1),      # green r1, rewritten r2 -> revised tier
        "revised_r2": (2, 2),      # green r2, rewritten r3 -> revised tier
        "revised_already_restamped": (4, 4),  # rewritten r3, re-stamped r4
        "failed_once": (-1, 2),    # tier 0
    }
    revised = {"revised_r1": 2, "revised_r2": 3,
               "revised_already_restamped": 3}
    monkeypatch.setattr(reg, "_adjudication_history", lambda: hist)
    monkeypatch.setattr(reg, "_revision_epochs", lambda: revised)
    monkeypatch.setattr(reg, "_registration_epochs", lambda: {})
    names = ["green_fresh", "revised_r2", "brand_new", "revised_r1",
             "green_stale", "failed_once", "revised_already_restamped"]
    queries = {n: (lambda s, d: None) for n in names}
    ordered = list(reg._prioritize(queries))
    assert ordered == [
        "failed_once",            # tier 0
        "brand_new",              # tier 1
        "revised_r1",             # tier 2, stamp r1
        "revised_r2",             # tier 2, stamp r2
        "green_stale",            # tier 3, stamp r1
        "green_fresh",            # tier 3, stamp r3
        "revised_already_restamped",  # tier 3: stamp r4 > revision r3
    ]


def test_revised_epochs_entries_are_registered():
    """Every REVISED_EPOCHS entry must name a live registry query —
    a typo'd name would silently fail to re-queue the real one."""
    unknown = sorted(set(reg._revision_epochs()) - set(reg.all_queries()))
    assert not unknown, f"REVISED_EPOCHS names not in registry: {unknown}"


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


def test_readme_registry_counts_are_derived():
    """README's registry counts must track len(all_queries()) — the
    r9 verdict caught them hand-written and stale (214 vs 215). Every
    count-bearing phrase is pinned here so a new registration fails
    this test until the README is updated."""
    import pathlib

    n_q = len(reg.all_queries())
    n_o = len(reg.all_oracles())
    readme = (pathlib.Path(__file__).parents[1] / "README.md").read_text()
    for phrase in (
        f"the registry: {n_q} named queries, {n_o} with exact",
        f"against a {n_q}-entry registry",
        f"parity for all {n_o} oracles",
    ):
        assert phrase in readme, f"README out of date, expected: {phrase!r}"
