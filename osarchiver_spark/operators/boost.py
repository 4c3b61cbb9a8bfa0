"""AdaBoost with decision stumps as DataFrame passes — the ensemble
member of the iterative trainer family (k-means, BPE, PageRank,
logistic GD, ALS).

Boosts one-split stumps over the same quality-gate distillation task
as operators/lr.py. Each round is:

1. one aggregation of the weighted error of every candidate stump —
   the data crossed with a 76-row literal stump grid (2 features ×
   19 thresholds × 2 polarities, model-sized broadcast), grouped per
   stump: ONE map-combinable pass;
2. an argmin collect of a single stump row (the model-sized-collect
   rule), α = ½·ln((1−ε)/ε);
3. a row-local weight update w ← w·exp(−α·y·h) and one global-sum
   normalization — the weights stay a COLUMN on the distributed
   relation; nothing data-sized ever reaches the driver.

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


def _stump_grid(spark: SparkSession) -> DataFrame:
    rows = [
        (fid, float(theta), pol)
        for fid in (1, 2)
        for theta in THETA_GRID
        for pol in (1.0, -1.0)
    ]
    return spark.createDataFrame(rows, "fid int, theta double, pol double")


def _h(feature_col, theta: float, pol: float):
    return F.when(feature_col >= F.lit(theta), F.lit(pol)).otherwise(F.lit(-pol))


def adaboost_train(
    docs: DataFrame, rounds: int = BOOST_ROUNDS
) -> tuple[list[Stump], DataFrame]:
    """Returns (model, weighted_feats): model = one (round, feature,
    theta, polarity, eps, alpha) tuple per round; weighted_feats =
    the final weighted relation (persisted) for inspection."""
    spark = docs.sparkSession
    grid = F.broadcast(_stump_grid(spark))
    # base keeps its own handle: the rotation below wraps it in
    # withColumn frames, and unpersisting a CHILD plan never releases
    # the parent cache entry — without this handle every call leaked
    # the features relation (caught by the no-accumulation pin in
    # tests/test_plans.py)
    base = boost_features(docs).persist()
    n = base.count()
    if n == 0:
        return [], base
    d = base.withColumn("w", F.lit(1.0 / n))
    model: list[Stump] = []
    prev = None
    try:
        for t in range(1, rounds + 1):
            h_grid = F.when(
                F.when(F.col("fid") == 1, F.col("x1")).otherwise(F.col("x2"))
                >= F.col("theta"),
                F.col("pol"),
            ).otherwise(-F.col("pol"))
            best = (
                d.crossJoin(grid)
                .groupBy("fid", "theta", "pol")
                .agg(
                    F.round(
                        F.sum(F.when(h_grid != F.col("y"), F.col("w")).otherwise(0.0)),
                        EPS_QUANT,
                    ).alias("eps")
                )
                .orderBy("eps", "fid", "theta", "pol")
                .limit(1)
                .collect()[0]
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            fid, theta, pol, eps = (
                int(best["fid"]),
                float(best["theta"]),
                float(best["pol"]),
                float(best["eps"]),
            )
            alpha = _clamped_alpha(eps)
            model.append((t, fid, theta, pol, eps, alpha))
            feat_col = F.col("x1") if fid == 1 else F.col("x2")
            unnorm = F.col("w") * F.exp(
                F.lit(-alpha) * F.col("y") * _h(feat_col, theta, pol)
            )
            d2 = d.withColumn("w", unnorm)
            z = float(d2.agg(F.sum("w")).collect()[0][0])  # one scalar per round
            d_next = d2.withColumn(
                "w", F.round(F.col("w") / F.lit(z), WEIGHT_QUANT)
            ).persist()
            prev, d = d, d_next
        # release everything but the final frame: the loop frees round
        # t-2 at round t, so the second-to-last frame AND the base
        # features are still pinned when it exits
        d.count()  # materialize the final frame before dropping its parents
        if prev is not None:
            prev.unpersist()
            prev = None
        base.unpersist()
        return model, d
    except Exception:
        if prev is not None:
            prev.unpersist()
        base.unpersist()
        d.unpersist()
        raise


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
