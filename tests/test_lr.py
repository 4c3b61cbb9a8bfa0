"""LR trainer semantics: gradient steps match an independent numpy
reference bit-for-bit (through the weight quantization), the
distillation task actually learns, and the score report's counts are
consistent. Oracle parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osarchiver_spark.operators.lr import lr_features, lr_score_by_source, lr_train
from osarchiver_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _numpy_gd(X, y, lr, iters, q):
    w = np.zeros(X.shape[1])
    traj = []
    for step in range(1, iters + 1):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = np.round(w + lr * (X.T @ (y - p)) / len(y), q)
        traj.append((step, *w))
    return traj, w


def test_trainer_matches_numpy_reference(spark):
    docs = load_table(spark, SF, "documents")
    rows = lr_features(docs).collect()
    y = np.array([r["y"] for r in rows])
    X = np.column_stack([np.ones(len(rows)), [r["x1"] for r in rows], [r["x2"] for r in rows]])
    ref_traj, ref_w = _numpy_gd(X, y, lr=10.0, iters=5, q=6)
    traj, w = lr_train(docs, learning_rate=10.0, iterations=5, quantize=6)
    assert [(s, b, w1, w2) for s, b, w1, w2 in traj] == [
        (s, float(b), float(w1), float(w2)) for s, b, w1, w2 in ref_traj
    ]
    assert w == tuple(float(v) for v in ref_w)


def test_distillation_beats_majority_baseline(spark):
    docs = load_table(spark, SF, "documents")
    out = lr_score_by_source(docs)
    tot = out.agg(
        F.sum("n").alias("n"), F.sum("n_correct").alias("c"), F.sum("n_pos").alias("p")
    ).collect()[0]
    acc = tot["c"] / tot["n"]
    majority = max(tot["p"], tot["n"] - tot["p"]) / tot["n"]
    assert acc > majority + 0.15  # genuinely learned, not the constant classifier


def test_score_counts_consistent(spark):
    docs = load_table(spark, SF, "documents")
    for r in lr_score_by_source(docs).collect():
        assert 0 <= r["n_pos"] <= r["n"]
        assert 0 <= r["n_pred_pos"] <= r["n"]
        assert 0 <= r["n_correct"] <= r["n"]
        assert abs(r["accuracy"] - r["n_correct"] / r["n"]) < 1e-6


def test_cell_form_matches_distributed_pass_form(spark):
    """The sufficient-statistic (cell) trainer and the distributed
    per-iteration fallback must produce the identical trajectory and
    final weights (the bit-exactness the oracle hash relies on when
    the cell cap ever forces the fallback)."""
    from osarchiver_spark.operators.lr import _lr_train_passes

    docs = load_table(spark, SF, "documents")
    traj_cells, final_cells = lr_train(docs)
    from osarchiver_spark.operators.lr import (
        ITERATIONS,
        LEARNING_RATE,
        QUANTIZE,
        lr_features,
    )

    traj_pass, final_pass = _lr_train_passes(
        lr_features(docs), LEARNING_RATE, ITERATIONS, QUANTIZE
    )
    assert traj_cells == traj_pass
    assert final_cells == final_pass
