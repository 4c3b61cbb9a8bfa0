"""AdaBoost semantics: the DataFrame trainer matches an independent
numpy AdaBoost bit-for-bit (through the eps/alpha/weight
quantization), the ensemble genuinely learns, and empty input
degrades cleanly. Oracle parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from osarchiver_spark.operators.boost import (
    EPS_FLOOR,
    EPS_QUANT,
    THETA_GRID,
    WEIGHT_QUANT,
    _clamped_alpha,
    adaboost_score_by_source,
    adaboost_train,
    boost_features,
)
from osarchiver_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _numpy_adaboost(y, X, rounds):
    n = len(y)
    w = np.full(n, 1.0 / n)
    model = []
    for t in range(1, rounds + 1):
        best = None
        for fid in (1, 2):
            xv = X[:, fid - 1]
            for theta in THETA_GRID:
                for pol in (1.0, -1.0):
                    h = np.where(xv >= theta, pol, -pol)
                    eps = round(float(w[h != y].sum()), EPS_QUANT)
                    key = (eps, fid, theta, pol)
                    if best is None or key < best[0]:
                        best = (key, h)
        (eps, fid, theta, pol), h = best
        alpha = _clamped_alpha(eps)  # identical eps clamp as the trainer/oracle
        model.append((t, fid, theta, pol, eps, alpha))
        w = w * np.exp(-alpha * y * h)
        w = np.round(w / w.sum(), WEIGHT_QUANT)
    return model


def test_model_matches_numpy_reference(spark):
    docs = load_table(spark, SF, "documents")
    rows = boost_features(docs).collect()
    y = np.array([r["y"] for r in rows])
    X = np.column_stack([[r["x1"] for r in rows], [r["x2"] for r in rows]])
    ref = _numpy_adaboost(y, X, rounds=5)
    model, d = adaboost_train(docs, rounds=5)
    d.unpersist()
    assert model == [
        (t, f, float(th), float(p), float(e), float(a)) for t, f, th, p, e, a in ref
    ]


def test_ensemble_beats_majority_baseline(spark):
    docs = load_table(spark, SF, "documents")
    out = adaboost_score_by_source(docs)
    tot = out.agg(
        F.sum("n").alias("n"), F.sum("n_correct").alias("c"), F.sum("n_pos").alias("p")
    ).collect()[0]
    acc = tot["c"] / tot["n"]
    majority = max(tot["p"], tot["n"] - tot["p"]) / tot["n"]
    assert acc > majority + 0.15


def test_separable_input_does_not_divide_by_zero(spark):
    """A stump from the grid perfectly splits this sample (x1 >= 0.5
    decides y exactly), so round-1 eps rounds to 0 at EPS_QUANT; the
    clamp must keep alpha finite and the trainer must still converge
    to the separating stump instead of raising ZeroDivisionError."""
    rows = [
        (i, ("the of and " * 40 if i % 2 == 0 else "!!!"), "en", "s", 10)
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    model, d = adaboost_train(docs, rounds=3)
    d.unpersist()
    assert len(model) == 3
    for _, _, _, _, eps, alpha in model:
        assert math.isfinite(alpha)
        if eps == 0.0:
            assert alpha == _clamped_alpha(0.0)
    assert model[0][4] == 0.0  # the separating stump: exact fit in round 1


def test_clamped_alpha_matches_floor():
    assert _clamped_alpha(0.0) == _clamped_alpha(EPS_FLOOR)
    assert math.isfinite(_clamped_alpha(0.0))
    assert math.isfinite(_clamped_alpha(1.0))
    assert _clamped_alpha(0.5) == 0.0


def test_empty_input_yields_empty_model(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    model, d = adaboost_train(empty)
    d.unpersist()
    assert model == []
