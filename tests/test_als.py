"""ALS semantics: the DataFrame trainer matches an independent numpy
ALS (closed-form 2×2 solves, same quantization) bit-for-bit, the
factorization actually fits a planted low-rank matrix, and
regularization keeps every solve total. Oracle parity runs in
tests/test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osarchiver_spark.operators.als import (
    ALS_LAMBDA,
    als_factors,
    als_ratings,
    als_reconstruction_report,
)
from osarchiver_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _numpy_als(cells, iters, lam, quant):
    users = sorted({u for u, _, _ in cells})
    items = sorted({i for _, i, _ in cells})
    uix = {u: k for k, u in enumerate(users)}
    iix = {i: k for k, i in enumerate(items)}
    import hashlib

    def frac(s):
        return round((int(hashlib.md5(s.encode()).hexdigest()[:8], 16) + 1) / 4294967296.0, quant)

    V = np.array([[1.0, frac(i)] for i in items])
    U = np.zeros((len(users), 2))

    def solve(fixed, rows):
        out = np.zeros((len(rows), 2))
        for k, cell_list in enumerate(rows):
            a = b = c = p = q = 0.0
            for other_ix, r in cell_list:
                f1, f2 = fixed[other_ix]
                a += f1 * f1
                b += f1 * f2
                c += f2 * f2
                p += f1 * r
                q += f2 * r
            a, c = lam + a, lam + c
            det = a * c - b * b
            out[k] = [round((c * p - b * q) / det, quant), round((a * q - b * p) / det, quant)]
        return out

    by_user = [[] for _ in users]
    by_item = [[] for _ in items]
    for u, i, r in cells:
        by_user[uix[u]].append((iix[i], r))
        by_item[iix[i]].append((uix[u], r))
    for _ in range(iters):
        U = solve(V, by_user)
        V = solve(U, by_item)
    return users, items, U, V


def test_factors_match_numpy_reference(spark):
    ev = load_table(spark, SF, "events")
    cells = [
        (r["user_id"], r["event_type"], r["r"]) for r in als_ratings(ev).collect()
    ]
    _, items, _, V_ref = _numpy_als(cells, iters=2, lam=ALS_LAMBDA, quant=6)
    u, v = als_factors(ev)
    got = {r["event_type"]: (r["f1"], r["f2"]) for r in v.collect()}
    for item, (f1, f2) in zip(items, V_ref):
        assert got[item] == (float(f1), float(f2))


def test_factorization_fits_planted_low_rank(spark):
    # R = u_outer * v_outer exactly rank-1: ALS at rank 2 must
    # reconstruct it almost perfectly
    rows = []
    uvec = [0.2, 0.5, 0.9, 1.3]
    vvec = {"a": 0.4, "b": 0.8, "c": 1.1}
    for ui, uval in enumerate(uvec):
        for t, tval in vvec.items():
            rows.append((ui, t, uval * tval * 100.0))  # /100 scaling inverts this
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    rep = {r["event_type"]: r["rmse"] for r in als_reconstruction_report(ev).collect()}
    # λ=0.1 against only 3-4 terms per normal equation shrinks factors
    # noticeably on a toy matrix (regularization bias, not a bug), so
    # "almost perfectly" here means a few percent of the cell scale
    assert all(v < 0.06 for v in rep.values()), rep


def test_report_covers_every_cell(spark):
    ev = load_table(spark, SF, "events")
    n_cells = als_ratings(ev).count()
    rep = als_reconstruction_report(ev)
    assert rep.agg(F.sum("n_cells")).collect()[0][0] == n_cells


def test_rank3_fits_planted_rank2_better_than_rank1_noise(spark):
    """General-rank path sanity: on a planted rank-2 matrix, the
    rank-3 factorization's reconstruction must be essentially exact
    (the extra dimension can only help)."""
    from osarchiver_spark.operators.als import als_factors_rank, als_ratings

    rows = []
    u1 = [0.3, 0.7, 1.1, 0.5]
    u2 = [0.9, 0.2, 0.4, 1.3]
    v1 = {"a": 0.5, "b": 1.0, "c": 0.2}
    v2 = {"a": 0.8, "b": 0.1, "c": 1.2}
    for ui in range(4):
        for t in v1:
            rows.append((ui, t, (u1[ui] * v1[t] + u2[ui] * v2[t]) * 100.0))
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    # λ=0.1 against 3-4 terms per equation shrinks a toy problem
    # visibly; a light λ isolates the fitting behavior under test
    u, v = als_factors_rank(ev, rank=3, iters=4, lam=0.01)
    uf = {r["user_id"]: r["f"] for r in u.collect()}
    vf = {r["event_type"]: r["f"] for r in v.collect()}
    worst = 0.0
    for r in als_ratings(ev).collect():
        pred = sum(a * b for a, b in zip(uf[r["user_id"]], vf[r["event_type"]]))
        worst = max(worst, abs(pred - r["r"]))
    assert worst < 0.05, worst


def test_rank_path_arbitrary_init_round_trips(spark):
    """item_init override is honored (the hook the equality pins and
    warm-start workflows rely on)."""
    from osarchiver_spark.operators.als import als_factors_rank

    ev = load_table(spark, SF, "events")
    init = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.array(F.lit(1.0), F.lit(0.5)).alias("f"))
    )
    u, v = als_factors_rank(ev, rank=2, iters=1, item_init=init)
    assert {len(r["f"]) for r in v.collect()} == {2}
    assert {len(r["f"]) for r in u.collect()} == {2}
