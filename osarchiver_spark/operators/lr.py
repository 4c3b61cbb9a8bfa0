"""Logistic-regression training as DataFrame passes — full-batch
gradient descent where each iteration is ONE map-combinable
aggregation and a model-sized (single-row) collect.

Completes the iterative-trainer family next to k-means
(operators/ivf.py), BPE (operators/bpe.py) and PageRank
(operators/graph.py): the supervised member. The registered task is
quality-gate DISTILLATION: learn the composed 3-signal quality
threshold from two of its signals (see lr_features) — the pattern a
pipeline uses to replace an expensive quality classifier with a
cheap linear gate at corpus scale.

The 100 TB shape (r11 optimization round):

- features are whole-stage-codegen column expressions (no Python
  anywhere — not even Arrow);
- ONE map-combinable aggregation collects the (y, x1, x2, count)
  sufficient-statistic cells (bounded: the features are count
  ratios, and an oversized cell space falls back to the original
  one-aggregation-per-step distributed loop);
- the full GD loop runs over the model-sized cell table on the
  driver — the same bounded-collect pattern as the k-means centroid
  partials, with one corpus pass instead of one per iteration.

Determinism/oracle: weights are quantized (rounded) after every
update, so cross-engine summation-order noise (~1e-15 after the /n
and learning-rate scaling) can't reach the stored weights — a SQL
replay of the same iterations (one CTE per step) lands on identical
weights, exactly the kmeans_fit(quantize=...) convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import exact_round
from pyspark.sql import types as T

from osarchiver_spark.functions.text import stopword_ratio

LEARNING_RATE = 10.0
ITERATIONS = 20
QUANTIZE = 6
QUALITY_GATE = 0.4  # balanced classes on the fixtures (~49% positive)

WEIGHTS_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType()),
        T.StructField("bias", T.DoubleType()),
        T.StructField("w_stopword", T.DoubleType()),
        T.StructField("w_len", T.DoubleType()),
    ]
)


def lr_features(docs: DataFrame) -> DataFrame:
    """(source, y, x1, x2) — the DISTILLATION task: the label is the
    composed 3-signal quality gate (text_quality's score >= 0.4,
    compared on the rounded value so the boundary is engine-exact),
    the features are only TWO of its three signals (stopword density
    and length saturation; the punctuation term is deliberately
    withheld) — i.e. train a cheap linear gate to mimic a richer
    score, the classic way a pipeline scales an expensive quality
    signal. The fixture's metadata lang column is uncorrelated with
    the text (all text is English-like), so a metadata label would be
    unlearnable; this label is real and the model converges from a
    51% majority baseline to ~95% accuracy. Pure codegen expressions,
    mirrored verbatim in the SQL oracle."""
    from osarchiver_spark.functions.text import punct_ratio, token_count

    stop_r = stopword_ratio(F.col("text"))
    len_score = F.least(token_count(F.col("text")).cast("double") / 100.0, F.lit(1.0))
    quality = 0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_ratio(F.col("text")))
    return docs.select(
        "source",
        F.when(F.round(quality, 6) >= QUALITY_GATE, 1.0).otherwise(0.0).alias("y"),
        stop_r.alias("x1"),
        len_score.alias("x2"),
    )


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


#: Sufficient-statistic collapse bound for lr_train: the gradient
#: depends on rows only through (y, x1, x2), so training iterates
#: over the distinct-cell table when it fits comfortably on the
#: driver (2^18 cells ≈ 10 MB collected) and falls back to the
#: original per-iteration distributed aggregation above that. The
#: features are count ratios (stopword hits / token count and a
#: capped token count), so the cell count grows with the distinct
#: (hits, n_tokens) pairs — ~760 cells at sf0.1's 5k docs — not with
#: the corpus.
LR_CELL_CAP = 1 << 18


def lr_train(
    docs: DataFrame,
    learning_rate: float = LEARNING_RATE,
    iterations: int = ITERATIONS,
    quantize: int = QUANTIZE,
) -> tuple[list[tuple[int, float, float, float]], tuple[float, float, float]]:
    """Full-batch GD from zero weights. Returns (trajectory, final):
    trajectory = one (step, bias, w_stopword, w_len) row per step
    (post-update, quantized), final = the last weights.

    Sufficient-statistics form (r11 optimization round, guide §1.2):
    the gradient is Σ rows (y − σ(z))·(1, x1, x2), which rows with
    identical (y, x1, x2) contribute identically to — so ONE
    map-combinable cell count replaces ``iterations`` sequential
    corpus aggregations (21 corpus-sized jobs → 1; the GD loop runs
    over the cell table on the driver, python-round semantics
    unchanged). Oversized cell spaces (> LR_CELL_CAP, impossible for
    these bounded count-ratio features but guarded anyway) fall back
    to the original per-iteration distributed loop — identical math
    either way: the only divergence channel is double-summation
    order, which the post-update 1e-6 quantization absorbs exactly
    as it absorbed engine partial-agg order before (bit-equality
    pinned at sf0.001/sf0.01/sf0.1 against the numpy reference and
    the DuckDB oracle replay)."""
    import numpy as np

    feats = lr_features(docs)
    cells = (
        feats.groupBy("y", "x1", "x2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .limit(LR_CELL_CAP + 1)
        .collect()
    )
    if not cells:  # empty corpus: the zero model, no steps
        return [], (0.0, 0.0, 0.0)
    if len(cells) > LR_CELL_CAP:  # cell space exceeds the driver
        # budget: run the distributed per-iteration form instead
        return _lr_train_passes(feats, learning_rate, iterations, quantize)
    Y = np.array([r["y"] for r in cells])
    X1 = np.array([r["x1"] for r in cells])
    X2 = np.array([r["x2"] for r in cells])
    CNT = np.array([r["cnt"] for r in cells], dtype="float64")
    n = float(CNT.sum())  # exact: counts << 2^53
    b = w1 = w2 = 0.0
    traj: list[tuple[int, float, float, float]] = []
    for step in range(1, iterations + 1):
        z = b + w1 * X1 + w2 * X2
        resid = Y - 1.0 / (1.0 + np.exp(-z))
        b = round(b + learning_rate * float((CNT * resid).sum()) / n, quantize)
        w1 = round(w1 + learning_rate * float((CNT * resid * X1).sum()) / n, quantize)
        w2 = round(w2 + learning_rate * float((CNT * resid * X2).sum()) / n, quantize)
        traj.append((step, b, w1, w2))
    return traj, (b, w1, w2)


def _lr_train_passes(
    feats: DataFrame,
    learning_rate: float,
    iterations: int,
    quantize: int,
) -> tuple[list[tuple[int, float, float, float]], tuple[float, float, float]]:
    """The original distributed GD loop — one aggregation + one
    single-row collect per iteration over the persisted feature
    relation. Kept as lr_train's fallback when the cell table
    exceeds LR_CELL_CAP."""
    feats = feats.persist()
    try:
        n = feats.count()
        b = w1 = w2 = 0.0
        traj: list[tuple[int, float, float, float]] = []
        if n == 0:
            return traj, (b, w1, w2)
        for step in range(1, iterations + 1):
            z = F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
            resid = F.col("y") - _sigmoid(z)
            row = feats.agg(
                F.sum(resid).alias("g0"),
                F.sum(resid * F.col("x1")).alias("g1"),
                F.sum(resid * F.col("x2")).alias("g2"),
            ).collect()[0]
            b = round(b + learning_rate * row["g0"] / n, quantize)
            w1 = round(w1 + learning_rate * row["g1"] / n, quantize)
            w2 = round(w2 + learning_rate * row["g2"] / n, quantize)
            traj.append((step, b, w1, w2))
        return traj, (b, w1, w2)
    finally:
        feats.unpersist()


def lr_score_by_source(
    docs: DataFrame,
    weights: tuple[float, float, float] | None = None,
    **train_kwargs,
) -> DataFrame:
    """Apply the trained classifier and report per-source confusion
    counts — the calibration check before using the model as a
    corpus gate. Scoring is a single codegen scan; the decision
    compares the ROUNDED probability against 0.5 so engine last-ulp
    exp() noise can't flip a prediction."""
    if weights is None:
        _, weights = lr_train(docs, **train_kwargs)
    b, w1, w2 = weights
    feats = lr_features(docs)
    z = F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
    p = F.round(_sigmoid(z), 6)
    pred = (p >= 0.5).cast("double")
    return feats.select("source", "y", pred.alias("pred")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("pred").cast("long").alias("n_pred_pos"),
        F.sum((F.col("y") == F.col("pred")).cast("long")).alias("n_correct"),
        exact_round(F.sum((F.col("y") == F.col("pred")).cast("long")) / F.count(F.lit(1)), 6).alias("accuracy"),
    )
