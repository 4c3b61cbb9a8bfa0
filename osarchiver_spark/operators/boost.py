"""AdaBoost with decision stumps as DataFrame passes — the ensemble
member of the iterative trainer family (k-means, BPE, PageRank,
logistic GD, ALS).

Boosts one-split stumps over the same quality-gate distillation task
as operators/lr.py. Execution shape (r11 optimization round): the
76-stump grid (2 features × 19 thresholds × 2 polarities) sees a row
only through its (theta-bucket(x1), theta-bucket(x2), y) cell — at
most 20·20·2 = 800 cells at ANY corpus size — and rows sharing a
cell share one weight trajectory, so training is:

1. ONE map-combinable aggregation collecting the cell counts (the
   model-sized sufficient statistic — the only corpus pass);
2. the whole boosting loop (per-round weighted-error argmin,
   α = ½·ln((1−ε)/ε), weight renormalization) over the 800-cell
   table on the driver, replicating the distributed plan's
   quantization bit-for-bit (see adaboost_train);
3. the final weights re-attach to the relation as a lazy model-sized
   broadcast join — nothing data-sized ever reaches the driver.

Determinism/oracle: ε is rounded (9 dp) before the argmin with a
total (ε, feature, θ, polarity) tie-break, α is quantized (6 dp) and
the normalized weights are quantized (12 dp) every round, so engine
summation-order noise (≈1e-16) can never pick a different stump or
drift the weights — the SQL oracle replays every round as CTEs,
validated bit-equal against an independent numpy AdaBoost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import exact_round
from pyspark.sql import types as T

BOOST_ROUNDS = 5
THETA_GRID = [round(0.05 * i, 2) for i in range(1, 20)]  # 0.05 .. 0.95
EPS_QUANT = 9
ALPHA_QUANT = 6
WEIGHT_QUANT = 12
# A stump that perfectly classifies the weighted sample (or whose
# weighted error rounds to 0 at EPS_QUANT) would make the alpha log
# divide by zero; separable inputs are realistic for the distillation
# task, so eps is clamped to [floor, 1-floor] inside the log ONLY —
# the reported eps stays exact. The SQL oracle and the numpy reference
# in tests/test_boost.py apply the identical clamp so parity holds.
EPS_FLOOR = 10.0 ** -EPS_QUANT


def _clamped_alpha(eps: float) -> float:
    import math

    eps_c = min(max(eps, EPS_FLOOR), 1.0 - EPS_FLOOR)
    return round(0.5 * math.log((1.0 - eps_c) / eps_c), ALPHA_QUANT)

MODEL_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("feature", T.IntegerType()),
        T.StructField("theta", T.DoubleType()),
        T.StructField("polarity", T.DoubleType()),
        T.StructField("eps", T.DoubleType()),
        T.StructField("alpha", T.DoubleType()),
    ]
)

Stump = tuple[int, int, float, float, float, float]


def boost_features(docs: DataFrame) -> DataFrame:
    """(source, y ∈ {-1,+1}, x1, x2): the lr_features task with the
    boosting label convention."""
    from osarchiver_spark.operators.lr import lr_features

    f = lr_features(docs)
    return f.select("source", (F.col("y") * 2.0 - 1.0).alias("y"), "x1", "x2")


def _h(feature_col, theta: float, pol: float):
    return F.when(feature_col >= F.lit(theta), F.lit(pol)).otherwise(F.lit(-pol))


def _theta_bucket(feature_col) -> "F.Column":
    """``b = #{theta in THETA_GRID : x >= theta}`` — the grid is
    sorted ascending, so ``x >= theta_j  <=>  b >= j`` (1-based j):
    the bucket index carries EXACTLY the information every stump in
    the grid can extract from x, nothing more."""
    return sum(
        (feature_col >= F.lit(float(t))).cast("int") for t in THETA_GRID
    )


def adaboost_train(
    docs: DataFrame, rounds: int = BOOST_ROUNDS
) -> tuple[list[Stump], DataFrame]:
    """Returns (model, weighted_feats): model = one (round, feature,
    theta, polarity, eps, alpha) tuple per round; weighted_feats =
    the final weighted relation (persisted handle) for inspection.

    Sufficient-statistics form (r11 optimization round, guide §1.2
    "fix the distributed algorithm first" / §8 "decide with small
    rows"): every stump in the 76-stump grid sees a row only through
    (theta-bucket(x1), theta-bucket(x2), y) — 20 × 20 × 2 = at most
    800 cells REGARDLESS of corpus size — and rows in the same cell
    start with the same weight (1/n) and receive identical updates,
    so they share one weight trajectory forever. The whole boosting
    loop therefore needs ONE corpus pass (a map-combinable cell
    count); the per-round eps/argmin/renormalization runs over the
    model-sized cell table on the driver — the same bounded-collect
    rule as the k-means centroid partials. The previous form ran
    2 jobs per round over the full relation plus a persist chain
    (2 × rounds + 2 corpus-sized jobs; at 100 TB, 12 corpus scans
    where one suffices).

    Exactness: the driver math replicates the distributed plan's
    quantization bit-for-bit — eps and the weights round via
    round_half_up_py (the documented replica of F.round on doubles),
    alpha via the shared _clamped_alpha. The only divergence channel
    is double-summation order (cells × cnt·w vs rows × w), which both
    the old form (engine partial-agg order) and the SQL oracle
    already tolerate by design: eps is rounded at 1e-9 and weights at
    1e-12 precisely so ~1e-16 summation noise cannot reach a stored
    value. Bit-equality with the pass-based form is pinned at
    sf0.001/sf0.01/sf0.1 (numpy reference in tests/test_boost.py and
    the DuckDB oracle replay)."""
    import numpy as np

    from osarchiver_spark.functions.precision import round_half_up_py

    spark = docs.sparkSession
    feats = boost_features(docs)
    cells = (
        feats.groupBy(
            _theta_bucket(F.col("x1")).alias("b1"),
            _theta_bucket(F.col("x2")).alias("b2"),
            F.col("y"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # <= 800 rows by construction (20 x 20 x 2)
    )
    if not cells:
        return [], feats
    B = {
        1: np.array([r["b1"] for r in cells]),
        2: np.array([r["b2"] for r in cells]),
    }
    Y = np.array([r["y"] for r in cells])
    CNT = np.array([r["cnt"] for r in cells], dtype="float64")
    n = CNT.sum()
    w = np.full(len(cells), 1.0 / n)
    model: list[Stump] = []
    for t in range(1, rounds + 1):
        cw = CNT * w
        best = None
        for fid in (1, 2):
            bv = B[fid]
            for j, theta in enumerate(THETA_GRID, start=1):
                for pol in (-1.0, 1.0):
                    h = np.where(bv >= j, pol, -pol)
                    eps = round_half_up_py(float(cw[h != Y].sum()), EPS_QUANT)
                    key = (eps, fid, float(theta), pol)
                    if best is None or key < best[0]:
                        best = (key, h)  # lexicographic min == the
                        # old orderBy(eps, fid, theta, pol).limit(1)
        (eps, fid, theta, pol), h = best
        alpha = _clamped_alpha(eps)
        model.append((t, fid, theta, pol, eps, alpha))
        w = w * np.exp(-alpha * Y * h)
        z = float((CNT * w).sum())
        w = np.array([round_half_up_py(v / z, WEIGHT_QUANT) for v in w])
    # re-attach the final per-cell weights to the relation lazily
    # (model-sized broadcast join) — same columns and values as the
    # old persisted final frame; persist() keeps the caller contract
    # (callers unpersist it), nothing materializes unless consumed
    wmap = spark.createDataFrame(
        [
            (int(r["b1"]), int(r["b2"]), float(r["y"]), float(wv))
            for r, wv in zip(cells, w)
        ],
        "b1 int, b2 int, y double, w double",
    )
    weighted = (
        feats.withColumn("b1", _theta_bucket(F.col("x1")))
        .withColumn("b2", _theta_bucket(F.col("x2")))
        .join(F.broadcast(wmap), ["b1", "b2", "y"])
        .select("source", "y", "x1", "x2", "w")
    )
    return model, weighted.persist()


def adaboost_score_by_source(docs: DataFrame, model: list[Stump] | None = None) -> DataFrame:
    """Ensemble decision H(x) = sign(Σ αₜ hₜ(x)) scored per source —
    one codegen scan; the margin is an exact ± sum of the quantized
    alphas, so the sign is engine-identical even at zero."""
    if model is None:
        model, d = adaboost_train(docs)
        d.unpersist()
    feats = boost_features(docs)
    margin = F.lit(0.0)
    for _, fid, theta, pol, _, alpha in model:
        feat_col = F.col("x1") if fid == 1 else F.col("x2")
        margin = margin + F.lit(alpha) * _h(feat_col, theta, pol)
    pred = F.when(margin >= 0, 1.0).otherwise(-1.0)
    correct = (F.col("y") == F.col("pred")).cast("long")
    return (
        feats.select("source", "y", pred.alias("pred"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("y") > 0).cast("long")).alias("n_pos"),
            F.sum((F.col("pred") > 0).cast("long")).alias("n_pred_pos"),
            F.sum(correct).alias("n_correct"),
            exact_round(F.sum(correct) / F.count(F.lit(1)), 6).alias("accuracy"),
        )
    )
