"""Model-training queries: logistic regression trained and scored as
DataFrame passes (operators/lr.py). The oracle replays every gradient
step as a SQL CTE — the weight quantization after each update is what
makes the replay bit-exact (same convention as the k-means oracle in
queries/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osarchiver_spark.functions.precision import exact_round, quantize
from osarchiver_spark.operators.lr import (
    ITERATIONS,
    LEARNING_RATE,
    QUANTIZE,
    WEIGHTS_SCHEMA,
    lr_score_by_source,
    lr_train,
)
from osarchiver_spark.sources.parquet import load_table

_SQL_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"
_EN_MARKERS = "['the', 'and', 'of', 'to', 'a', 'in', 'is', 'it']"
_SQL_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"


def q_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight trajectory of the full-batch GD language classifier —
    one row per gradient step (post-update, quantized). Each step is
    one map-combinable aggregation; only a single gradient row
    reaches the driver per step."""
    docs = load_table(spark, sf_dir, "documents")
    traj, _ = lr_train(docs)
    return spark.createDataFrame(traj, WEIGHTS_SCHEMA)


def q_lr_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source confusion counts of the trained classifier — the
    calibration report before using the model as a corpus gate.
    Scoring is one codegen scan; the decision threshold compares the
    ROUNDED probability so engine exp() last-ulp noise can't flip a
    prediction."""
    docs = load_table(spark, sf_dir, "documents")
    return lr_score_by_source(docs)



PR_THRESHOLDS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_lr_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall sweep of the trained gate across decision
    thresholds — the calibration curve that picks the operating point
    before a corpus-wide gate run. One scoring scan crossed with the
    9-row threshold dim (model-sized broadcast); counts are
    map-combinable. Probabilities compare ROUNDED (6dp) against each
    threshold so engine exp() noise can't flip a cell."""
    from pyspark.sql import functions as F

    from osarchiver_spark.operators.lr import lr_features, lr_train, _sigmoid

    docs = load_table(spark, sf_dir, "documents")
    _, (b, w1, w2) = lr_train(docs)
    feats = lr_features(docs)
    z = F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
    scored = feats.select("y", F.round(_sigmoid(z), 6).alias("p"))
    thr = spark.range(1, 10).select((F.col("id") / 10.0).alias("threshold"))
    pred = (F.col("p") >= F.col("threshold")).cast("double")
    cells = scored.crossJoin(F.broadcast(thr)).select(
        "threshold",
        (F.col("y") * pred).alias("tp"),
        ((1.0 - F.col("y")) * pred).alias("fp"),
        (F.col("y") * (1.0 - pred)).alias("fn"),
    )
    agg = cells.groupBy("threshold").agg(
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    return agg.select(
        "threshold", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
    )



def q_als_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-side factors of the rank-2 ALS factorization of the
    (user × event_type) interaction matrix — collaborative-filtering
    embedding learning as DataFrame passes (operators/als.py). Each
    half-step is one equi-join + one map-combinable aggregation with
    the 2×2 normal equations solved in closed form inside the agg;
    user factors never leave the cluster. The oracle replays the full
    alternation as CTEs (factor quantization per half-step makes the
    replay bit-exact)."""
    from osarchiver_spark.operators.als import als_factors

    ev = load_table(spark, sf_dir, "events")
    _, v = als_factors(ev)
    return v


def q_als_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item reconstruction error of the ALS fit — the report that
    sizes rank/iterations before a production factorization run."""
    from osarchiver_spark.operators.als import als_reconstruction_report

    ev = load_table(spark, sf_dir, "events")
    return als_reconstruction_report(ev)



def q_lr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the trained gate: decile buckets of the
    predicted probability vs the observed positive rate — the
    calibration check that decides whether the distilled score can be
    thresholded directly or needs recalibration. One scoring scan,
    one 10-row aggregation."""
    from pyspark.sql import functions as F

    from osarchiver_spark.operators.lr import lr_features, lr_train, _sigmoid

    docs = load_table(spark, sf_dir, "documents")
    _, (b, w1, w2) = lr_train(docs)
    feats = lr_features(docs)
    z = F.lit(b) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
    # p is held as integer ppm through the aggregation: avg(double)
    # is an accumulation-order-sensitive sum, so the mean is taken
    # over exact bigint ppm and rescaled with one fixed-order IEEE
    # expression (the psi_drift discipline).
    p_ppm = quantize(_sigmoid(z), 6)
    bucket = F.least(F.floor(F.col("p_ppm") / F.lit(100000.0)), F.lit(9)).cast("int")
    return (
        feats.select("y", p_ppm.alias("p_ppm"))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_round(
                F.sum("p_ppm") / (F.count(F.lit(1)) * F.lit(1000000.0)), 6
            ).alias("mean_p"),
            exact_round(F.sum("y") / F.count(F.lit(1)), 6).alias("frac_pos"),
        )
    )



def q_als3_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item factors of the GENERAL-RANK ALS path at rank 3, exploded
    to canonicalizer-sortable (event_type, dim, f) rows. Unlike the
    rank-2 codegen closed form, this path solves each entity's
    regularized normal equations with LAPACK inside an Arrow group —
    the production shape for ranks where closed forms stop being
    sane — and the oracle still adjudicates it exactly: Cramer's rule
    for the 3×3 system is written out in SQL and replays the full
    alternation (LAPACK vs Cramer differences sit ~8 orders below the
    factor quantization grid)."""
    from pyspark.sql import functions as F

    from osarchiver_spark.operators.als import als_factors_rank

    ev = load_table(spark, sf_dir, "events")
    _, v = als_factors_rank(ev, rank=3)
    return v.select(
        "event_type", F.posexplode("f").alias("pos", "f")
    ).select("event_type", (F.col("pos") + 1).cast("int").alias("dim"), "f")



def q_adaboost_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost stump model over the distillation task — one row per
    boosting round (operators/boost.py). Every round's stump
    selection, alpha and weight renormalization is quantized, so the
    oracle replays the full boost as CTEs; validated bit-equal
    against an independent numpy AdaBoost."""
    from osarchiver_spark.operators.boost import MODEL_SCHEMA, adaboost_train

    docs = load_table(spark, sf_dir, "documents")
    model, d = adaboost_train(docs)
    d.unpersist()
    return spark.createDataFrame(model, MODEL_SCHEMA)


def q_adaboost_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble accuracy of the boosted stumps per source — the
    nonlinear counterpart of lr_score (boosting captures the
    threshold structure a single linear gate smooths over)."""
    from osarchiver_spark.operators.boost import adaboost_score_by_source

    docs = load_table(spark, sf_dir, "documents")
    return adaboost_score_by_source(docs)



def q_labeling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision diagnostics: three heuristic labeling
    functions with abstain semantics (stopword density, token count,
    punctuation) scored against the quality gate — the
    coverage/accuracy report a Snorkel-style label model starts
    from. One scan, three codegen vote columns, one unpivoted
    aggregate."""
    from pyspark.sql import functions as F

    from osarchiver_spark.functions.text import punct_ratio, stopword_ratio, token_count
    from osarchiver_spark.operators.lr import QUALITY_GATE

    docs = load_table(spark, sf_dir, "documents")
    stop_r = stopword_ratio(F.col("text"))
    n_toks = token_count(F.col("text"))
    punct_r = punct_ratio(F.col("text"))
    len_score = F.least(n_toks.cast("double") / 100.0, F.lit(1.0))
    quality = 0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_r)
    y = F.when(F.round(quality, 6) >= QUALITY_GATE, 1).otherwise(0)
    # votes: 1 / 0 / NULL (abstain)
    lf_stop = F.when(stop_r >= 0.2, 1).when(stop_r <= 0.05, 0)
    lf_len = F.when(n_toks >= 60, 1).when(n_toks <= 20, 0)
    lf_punct = F.when(punct_r <= 0.02, 1).when(punct_r >= 0.1, 0)
    base = docs.select(
        y.alias("y"),
        lf_stop.alias("lf_stopword"),
        lf_len.alias("lf_length"),
        lf_punct.alias("lf_punct"),
    )
    n_docs = F.count(F.lit(1))
    out = None
    for lf in ("lf_stopword", "lf_length", "lf_punct"):
        active = F.col(lf).isNotNull()
        correct = (F.col(lf) == F.col("y")).cast("long")
        row = base.agg(
            F.lit(lf).alias("lf"),
            F.sum(active.cast("long")).alias("n_active"),
            F.sum(F.when(active, correct).otherwise(0)).alias("n_correct"),
            exact_round(F.sum(active.cast("long")) / n_docs, 6).alias("coverage"),
            exact_round(
                F.sum(F.when(active, correct).otherwise(0))
                / F.sum(active.cast("long")),
                6,
            ).alias("accuracy"),
        )
        out = row if out is None else out.unionByName(row)
    return out



def q_lf_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The label-model decision over the three abstaining labelers:
    per document, majority vote of the ACTIVE labeling functions
    (ties and all-abstain → abstain), reported per source as
    coverage and accuracy against the quality gate — what the
    weak-supervision pipeline ships to training when no hand labels
    exist. Same one-scan codegen shape as labeling_functions."""
    from pyspark.sql import functions as F

    from osarchiver_spark.functions.text import punct_ratio, stopword_ratio, token_count
    from osarchiver_spark.operators.lr import QUALITY_GATE

    docs = load_table(spark, sf_dir, "documents")
    stop_r = stopword_ratio(F.col("text"))
    n_toks = token_count(F.col("text"))
    punct_r = punct_ratio(F.col("text"))
    len_score = F.least(n_toks.cast("double") / 100.0, F.lit(1.0))
    quality = 0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_r)
    y = F.when(F.round(quality, 6) >= QUALITY_GATE, 1).otherwise(0)
    lf_stop = F.when(stop_r >= 0.2, 1).when(stop_r <= 0.05, 0)
    lf_len = F.when(n_toks >= 60, 1).when(n_toks <= 20, 0)
    lf_punct = F.when(punct_r <= 0.02, 1).when(punct_r >= 0.1, 0)
    # NULL-safe tally: an abstaining LF contributes 0, not NULL
    pos = sum(F.when(lf == 1, 1).otherwise(0) for lf in (lf_stop, lf_len, lf_punct))
    neg = sum(F.when(lf == 0, 1).otherwise(0) for lf in (lf_stop, lf_len, lf_punct))
    vote = F.when(pos > neg, 1).when(neg > pos, 0)  # tie/all-abstain -> NULL
    base = docs.select("source", y.alias("y"), vote.alias("vote"))
    active = F.col("vote").isNotNull()
    correct = F.when(active & (F.col("vote") == F.col("y")), 1).otherwise(0).cast("long")
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(active.cast("long")).alias("n_voted"),
        F.sum(correct).alias("n_correct"),
        exact_round(F.sum(active.cast("long")) / F.count(F.lit(1)), 6).alias("coverage"),
        F.when(
            F.sum(active.cast("long")) > 0,
            exact_round(F.sum(correct) / F.sum(active.cast("long")), 6),
        ).otherwise(0.0).alias("accuracy"),
    )


QUERIES = {
    "lr_train": q_lr_train,
    "lr_score": q_lr_score,
    "lr_pr_curve": q_lr_pr_curve,
    "als_factors": q_als_factors,
    "lr_calibration": q_lr_calibration,
    "adaboost_train": q_adaboost_train,
    "adaboost_score": q_adaboost_score,
    "labeling_functions": q_labeling_functions,
    "lf_majority_vote": q_lf_majority_vote,
    "als_rmse": q_als_rmse,
    "als3_factors": q_als3_factors,
}


def _feat_cte() -> str:
    from osarchiver_spark.operators.lr import QUALITY_GATE

    return f"""raw AS (
        SELECT source,
               CASE WHEN len(ltoks) > 0
                    THEN CAST(len(list_filter(ltoks, t -> list_contains({_EN_MARKERS}, t))) AS DOUBLE)
                         / len(ltoks)
                    ELSE 0.0 END AS stop_r,
               least(len(toks) / 100.0, 1.0) AS len_score,
               CASE WHEN length(text) > 0
                    THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                         / length(text)
                    ELSE 0.0 END AS punct_r
        FROM (SELECT source, text, {_SQL_TOKS} AS toks, {_SQL_TOKS_LOWER} AS ltoks
              FROM documents)),
    feat AS (
        SELECT source,
               CASE WHEN round(0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_r), 6)
                         >= {QUALITY_GATE} THEN 1.0 ELSE 0.0 END AS y,
               stop_r AS x1, len_score AS x2
        FROM raw),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feat),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2)"""


def _step_cte(i: int, lr: float, q: int) -> str:
    return f"""w{i} AS (
        SELECT round(any_value(wb) + {lr} * sum(r) / any_value(n), {q}) AS b,
               round(any_value(ww1) + {lr} * sum(r * x1) / any_value(n), {q}) AS w1,
               round(any_value(ww2) + {lr} * sum(r * x2) / any_value(n), {q}) AS w2
        FROM (
            SELECT w.b AS wb, w.w1 AS ww1, w.w2 AS ww2, nn.n AS n, f.x1, f.x2,
                   f.y - 1 / (1 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2))) AS r
            FROM feat f, w{i-1} w, nn))"""


def _lr_ctes(iters: int = ITERATIONS, lr: float = LEARNING_RATE, q: int = QUANTIZE) -> str:
    parts = [_feat_cte()]
    parts += [_step_cte(i, lr, q) for i in range(1, iters + 1)]
    return ",\n".join(parts)


ORACLES = {
    "lr_train": f"""
        WITH {_lr_ctes()}
        {" UNION ALL ".join(
            f"SELECT CAST({i} AS INT) AS step, b AS bias, w1 AS w_stopword, w2 AS w_len FROM w{i}"
            for i in range(1, ITERATIONS + 1)
        )}
    """,
    "lr_score": f"""
        WITH {_lr_ctes()}
        SELECT source, count(*) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(pred) AS BIGINT) AS n_pred_pos,
               CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               floor(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS accuracy
        FROM (
            SELECT f.source, f.y,
                   CASE WHEN round(1 / (1 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2))), 6) >= 0.5
                        THEN 1.0 ELSE 0.0 END AS pred
            FROM feat f, w{ITERATIONS} w)
        GROUP BY source
    """,
}


ORACLES["lr_pr_curve"] = f"""
    WITH {_lr_ctes()},
    scored AS (
        SELECT f.y,
               round(1 / (1 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2))), 6) AS p
        FROM feat f, w{ITERATIONS} w),
    thr AS (SELECT i / 10.0 AS threshold FROM range(1, 10) t(i)),
    cells AS (
        SELECT threshold,
               y * (CASE WHEN p >= threshold THEN 1.0 ELSE 0.0 END) AS tp,
               (1.0 - y) * (CASE WHEN p >= threshold THEN 1.0 ELSE 0.0 END) AS fp,
               y * (CASE WHEN p < threshold THEN 1.0 ELSE 0.0 END) AS fn
        FROM scored CROSS JOIN thr),
    agg AS (
        SELECT threshold,
               CAST(sum(tp) AS BIGINT) AS tp,
               CAST(sum(fp) AS BIGINT) AS fp,
               CAST(sum(fn) AS BIGINT) AS fn
        FROM cells GROUP BY threshold)
    SELECT threshold, tp, fp, fn,
           round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS precision,
           round(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS recall
    FROM agg
"""


def _als_ctes() -> str:
    from osarchiver_spark.operators.als import ALS_ITERS, ALS_LAMBDA, ALS_QUANT

    lam, q = ALS_LAMBDA, ALS_QUANT
    parts = [
        "ratings AS (SELECT user_id, event_type, round(avg(value) / 100.0, 6) AS r "
        "FROM events GROUP BY 1, 2)",
        f"v0 AS (SELECT event_type, 1.0 AS f1, "
        f"round((CAST(('0x' || substr(md5(event_type), 1, 8)) AS UBIGINT) + 1) "
        f"/ 4294967296.0, {q}) AS f2 "
        f"FROM (SELECT DISTINCT event_type FROM ratings))",
    ]

    def solve(out: str, solve_key: str, join_key: str, src: str) -> str:
        return (
            f"{out} AS (SELECT {solve_key}, "
            f"round((c * p - b * q) / (a * c - b * b), {q}) AS f1, "
            f"round((a * q - b * p) / (a * c - b * b), {q}) AS f2 "
            f"FROM ("
            f"SELECT r.{solve_key}, "
            f"{lam} + sum(f.f1 * f.f1) AS a, sum(f.f1 * f.f2) AS b, "
            f"{lam} + sum(f.f2 * f.f2) AS c, "
            f"sum(f.f1 * r.r) AS p, sum(f.f2 * r.r) AS q "
            f"FROM ratings r JOIN {src} f USING ({join_key}) GROUP BY 1))"
        )

    prev_v = "v0"
    for i in range(1, ALS_ITERS + 1):
        parts.append(solve(f"u{i}", "user_id", "event_type", prev_v))
        parts.append(solve(f"v{i}", "event_type", "user_id", f"u{i}"))
        prev_v = f"v{i}"
    return ",\n".join(parts)


def _als_final() -> tuple[str, str]:
    from osarchiver_spark.operators.als import ALS_ITERS

    return f"u{ALS_ITERS}", f"v{ALS_ITERS}"


ORACLES["als_factors"] = f"""
    WITH {_als_ctes()}
    SELECT event_type, f1, f2 FROM {_als_final()[1]}
"""

ORACLES["als_rmse"] = f"""
    WITH {_als_ctes()},
    uf AS (SELECT user_id, f1 AS u1, f2 AS u2 FROM {_als_final()[0]}),
    vf AS (SELECT event_type, f1 AS v1, f2 AS v2 FROM {_als_final()[1]}),
    errs AS (
        SELECT r.event_type, r.r - (u.u1 * v.v1 + u.u2 * v.v2) AS err
        FROM ratings r JOIN uf u USING (user_id) JOIN vf v USING (event_type))
    SELECT event_type, count(*) AS n_cells,
           round(sqrt(avg(err * err)), 4) AS rmse,
           round(avg(abs(err)), 4) AS mae
    FROM errs GROUP BY event_type
"""


ORACLES["lr_calibration"] = f"""
    WITH {_lr_ctes()},
    scored AS (
        SELECT f.y,
               CAST(floor(1 / (1 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2)))
                          * 1000000.0 + 0.5) AS BIGINT) AS p_ppm
        FROM feat f, w{ITERATIONS} w),
    bucketed AS (
        SELECT y, p_ppm,
               CAST(least(floor(p_ppm / 100000.0), 9) AS INT) AS bucket
        FROM scored)
    SELECT bucket, count(*) AS n,
           floor(sum(p_ppm) / (count(*) * 1000000.0) * 1000000.0 + 0.5)
               / 1000000.0 AS mean_p,
           floor(sum(y) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS frac_pos
    FROM bucketed GROUP BY bucket
"""


def _als3_ctes() -> str:
    from osarchiver_spark.operators.als import ALS_ITERS, ALS_LAMBDA, ALS_QUANT

    lam, q = ALS_LAMBDA, ALS_QUANT

    def solve(out: str, skey: str, jkey: str, src: str) -> str:
        sums = (
            f"SELECT r.{skey}, "
            f"{lam} + sum(f.f[1]*f.f[1]) AS a, sum(f.f[1]*f.f[2]) AS b, "
            f"sum(f.f[1]*f.f[3]) AS c, {lam} + sum(f.f[2]*f.f[2]) AS d, "
            f"sum(f.f[2]*f.f[3]) AS e, {lam} + sum(f.f[3]*f.f[3]) AS g, "
            f"sum(f.f[1]*r.r) AS p, sum(f.f[2]*r.r) AS q, sum(f.f[3]*r.r) AS s "
            f"FROM ratings r JOIN {src} f USING ({jkey}) GROUP BY 1"
        )
        det = "(a*(d*g - e*e) - b*(b*g - c*e) + c*(b*e - c*d))"
        d1 = "(p*(d*g - e*e) - b*(q*g - s*e) + c*(q*e - s*d))"
        d2 = "(a*(q*g - s*e) - p*(b*g - c*e) + c*(b*s - c*q))"
        d3 = "(a*(d*s - e*q) - b*(b*s - c*q) + p*(b*e - c*d))"
        return (
            f"{out} AS (SELECT {skey}, [round({d1}/{det}, {q}), "
            f"round({d2}/{det}, {q}), round({d3}/{det}, {q})] AS f FROM ({sums}))"
        )

    parts = [
        "ratings AS (SELECT user_id, event_type, round(avg(value) / 100.0, 6) AS r "
        "FROM events GROUP BY 1, 2)",
        f"v0 AS (SELECT event_type, [1.0, "
        f"round((CAST(('0x' || substr(md5(event_type || '|1'), 1, 8)) AS UBIGINT) + 1) "
        f"/ 4294967296.0, {q}), "
        f"round((CAST(('0x' || substr(md5(event_type || '|2'), 1, 8)) AS UBIGINT) + 1) "
        f"/ 4294967296.0, {q})] AS f "
        f"FROM (SELECT DISTINCT event_type FROM ratings))",
    ]
    prev = "v0"
    for i in range(1, ALS_ITERS + 1):
        parts.append(solve(f"u{i}", "user_id", "event_type", prev))
        parts.append(solve(f"v{i}", "event_type", "user_id", f"u{i}"))
        prev = f"v{i}"
    return ",\n".join(parts), prev


_ALS3_CTES, _ALS3_FINAL = _als3_ctes()

ORACLES["als3_factors"] = f"""
    WITH {_ALS3_CTES}
    SELECT event_type, CAST(t.d AS INT) AS dim, t.fv AS f
    FROM {_ALS3_FINAL}, LATERAL (SELECT unnest(f) AS fv,
                                        generate_subscripts(f, 1) AS d) t
"""


def _boost_ctes() -> tuple[str, str]:
    from osarchiver_spark.operators.boost import (
        ALPHA_QUANT,
        BOOST_ROUNDS,
        EPS_FLOOR,
        EPS_QUANT,
        THETA_GRID,
        WEIGHT_QUANT,
    )
    from osarchiver_spark.operators.lr import QUALITY_GATE

    bfeat = f"""bfeat AS (
        SELECT CASE WHEN round(0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_r), 6)
                         >= {QUALITY_GATE} THEN 1.0 ELSE -1.0 END AS y,
               stop_r AS x1, len_score AS x2, source,
               row_number() OVER (ORDER BY doc_id) AS rid
        FROM (
            SELECT doc_id, source,
                   CASE WHEN len(ltoks) > 0
                        THEN CAST(len(list_filter(ltoks, t -> list_contains({_EN_MARKERS}, t))) AS DOUBLE)
                             / len(ltoks)
                        ELSE 0.0 END AS stop_r,
                   least(len(toks) / 100.0, 1.0) AS len_score,
                   CASE WHEN length(text) > 0
                        THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                             / length(text)
                        ELSE 0.0 END AS punct_r
            FROM (SELECT doc_id, source, text, {_SQL_TOKS} AS toks, {_SQL_TOKS_LOWER} AS ltoks
                  FROM documents)))"""
    grid = (
        "stumps AS (SELECT f.fid, CAST(t.theta AS DOUBLE) AS theta, "
        "CAST(p.pol AS DOUBLE) AS pol FROM (VALUES (1), (2)) f(fid), (VALUES "
        + ", ".join(f"({g})" for g in THETA_GRID)
        + ") t(theta), (VALUES (1.0), (-1.0)) p(pol))"
    )
    parts = [bfeat, grid,
             "w0 AS (SELECT rid, 1.0 / (SELECT count(*) FROM bfeat) AS w FROM bfeat)"]
    h = ("(CASE WHEN (CASE WHEN s.fid = 1 THEN d.x1 ELSE d.x2 END) >= s.theta "
         "THEN s.pol ELSE -s.pol END)")
    for t in range(1, BOOST_ROUNDS + 1):
        pw = f"w{t-1}"
        parts.append(
            f"e{t} AS (SELECT s.fid, s.theta, s.pol, "
            f"round(sum(CASE WHEN {h} <> d.y THEN w.w ELSE 0.0 END), {EPS_QUANT}) AS eps "
            f"FROM bfeat d JOIN {pw} w USING (rid), stumps s GROUP BY 1, 2, 3)"
        )
        # eps clamped inside the log only (operators/boost.py EPS_FLOOR):
        # a separable sample would otherwise ln(1/0) here.
        eps_c = f"least(greatest(eps, {EPS_FLOOR!r}), 1.0 - {EPS_FLOOR!r})"
        parts.append(
            f"b{t} AS (SELECT fid, theta, pol, eps, "
            f"round(0.5 * ln((1.0 - {eps_c}) / {eps_c}), {ALPHA_QUANT}) AS alpha "
            f"FROM e{t} ORDER BY eps, fid, theta, pol LIMIT 1)"
        )
        parts.append(
            f"u{t} AS (SELECT d.rid, w.w * exp(-b.alpha * d.y * "
            f"(CASE WHEN (CASE WHEN b.fid = 1 THEN d.x1 ELSE d.x2 END) >= b.theta "
            f"THEN b.pol ELSE -b.pol END)) AS w "
            f"FROM bfeat d JOIN {pw} w USING (rid), b{t} b)"
        )
        parts.append(
            f"w{t} AS (SELECT rid, round(w / (SELECT sum(w) FROM u{t}), "
            f"{WEIGHT_QUANT}) AS w FROM u{t})"
        )
    model = " UNION ALL ".join(
        f"SELECT {t} AS round, fid, theta, pol, eps, alpha FROM b{t}"
        for t in range(1, BOOST_ROUNDS + 1)
    )
    parts.append(f"model AS ({model})")
    return ",\n".join(parts), "model"


_BOOST_CTES, _ = _boost_ctes()

ORACLES["adaboost_train"] = f"""
    WITH {_BOOST_CTES}
    SELECT CAST(round AS INT) AS round, CAST(fid AS INT) AS feature,
           theta, pol AS polarity, eps, alpha
    FROM model
"""

ORACLES["adaboost_score"] = f"""
    WITH {_BOOST_CTES},
    margins AS (
        SELECT d.rid, d.source, d.y,
               sum(m.alpha * (CASE WHEN (CASE WHEN m.fid = 1 THEN d.x1 ELSE d.x2 END)
                                        >= m.theta THEN m.pol ELSE -m.pol END)) AS margin
        FROM bfeat d, model m GROUP BY 1, 2, 3),
    preds AS (
        SELECT source, y, CASE WHEN margin >= 0 THEN 1.0 ELSE -1.0 END AS pred
        FROM margins)
    SELECT source, count(*) AS n,
           CAST(sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN pred > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
           CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           floor(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS accuracy
    FROM preds GROUP BY source
"""


def _lf_oracle() -> str:
    from osarchiver_spark.operators.lr import QUALITY_GATE

    lf_defs = {
        "lf_stopword": "CASE WHEN stop_r >= 0.2 THEN 1 WHEN stop_r <= 0.05 THEN 0 END",
        "lf_length": "CASE WHEN n_toks >= 60 THEN 1 WHEN n_toks <= 20 THEN 0 END",
        "lf_punct": "CASE WHEN punct_r <= 0.02 THEN 1 WHEN punct_r >= 0.1 THEN 0 END",
    }
    rows = " UNION ALL ".join(
        f"""SELECT '{name}' AS lf,
               CAST(sum(CASE WHEN {expr} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN {expr} = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               floor(sum(CASE WHEN {expr} IS NOT NULL THEN 1 ELSE 0 END) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS coverage,
               floor(sum(CASE WHEN {expr} = y THEN 1 ELSE 0 END)
                     / sum(CASE WHEN {expr} IS NOT NULL THEN 1 ELSE 0 END) * 1000000.0 + 0.5) / 1000000.0 AS accuracy
        FROM lf_base"""
        for name, expr in lf_defs.items()
    )
    return f"""
        WITH lf_base AS (
            SELECT CASE WHEN round(0.5 * stop_r + 0.3 * least(n_toks / 100.0, 1.0)
                                   + 0.2 * (1.0 - punct_r), 6) >= {QUALITY_GATE}
                        THEN 1 ELSE 0 END AS y,
                   stop_r, n_toks, punct_r
            FROM (
                SELECT CASE WHEN len(ltoks) > 0
                            THEN CAST(len(list_filter(ltoks, t -> list_contains({_EN_MARKERS}, t))) AS DOUBLE)
                                 / len(ltoks)
                            ELSE 0.0 END AS stop_r,
                       len(toks) AS n_toks,
                       CASE WHEN length(text) > 0
                            THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                                 / length(text)
                            ELSE 0.0 END AS punct_r
                FROM (SELECT text, {_SQL_TOKS} AS toks, {_SQL_TOKS_LOWER} AS ltoks
                      FROM documents)))
        {rows}
    """


ORACLES["labeling_functions"] = _lf_oracle()


def _lf_vote_oracle() -> str:
    from osarchiver_spark.operators.lr import QUALITY_GATE

    return f"""
        WITH lf_base AS (
            SELECT source,
                   CASE WHEN round(0.5 * stop_r + 0.3 * least(n_toks / 100.0, 1.0)
                                   + 0.2 * (1.0 - punct_r), 6) >= {QUALITY_GATE}
                        THEN 1 ELSE 0 END AS y,
                   CASE WHEN stop_r >= 0.2 THEN 1 WHEN stop_r <= 0.05 THEN 0 END AS lf1,
                   CASE WHEN n_toks >= 60 THEN 1 WHEN n_toks <= 20 THEN 0 END AS lf2,
                   CASE WHEN punct_r <= 0.02 THEN 1 WHEN punct_r >= 0.1 THEN 0 END AS lf3
            FROM (
                SELECT source,
                       CASE WHEN len(ltoks) > 0
                            THEN CAST(len(list_filter(ltoks, t -> list_contains({_EN_MARKERS}, t))) AS DOUBLE)
                                 / len(ltoks)
                            ELSE 0.0 END AS stop_r,
                       len(toks) AS n_toks,
                       CASE WHEN length(text) > 0
                            THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                                 / length(text)
                            ELSE 0.0 END AS punct_r
                FROM (SELECT source, text, {_SQL_TOKS} AS toks, {_SQL_TOKS_LOWER} AS ltoks
                      FROM documents))),
        voted AS (
            SELECT source, y,
                   CASE WHEN pos > neg THEN 1 WHEN neg > pos THEN 0 END AS vote
            FROM (
                SELECT source, y,
                       (CASE WHEN lf1 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN lf2 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN lf3 = 1 THEN 1 ELSE 0 END) AS pos,
                       (CASE WHEN lf1 = 0 THEN 1 ELSE 0 END
                        + CASE WHEN lf2 = 0 THEN 1 ELSE 0 END
                        + CASE WHEN lf3 = 0 THEN 1 ELSE 0 END) AS neg
                FROM lf_base))
        SELECT source, count(*) AS n,
               CAST(sum(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_voted,
               CAST(sum(CASE WHEN vote = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               floor(sum(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS coverage,
               CASE WHEN sum(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END) > 0
                    THEN floor(sum(CASE WHEN vote = y THEN 1 ELSE 0 END)
                               / sum(CASE WHEN vote IS NOT NULL THEN 1 ELSE 0 END) * 1000000.0 + 0.5) / 1000000.0
                    ELSE 0.0 END AS accuracy
        FROM voted GROUP BY source
    """


ORACLES["lf_majority_vote"] = _lf_vote_oracle()


def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature: each
    event's ``event_type`` is encoded as the mean target (``value``)
    of all OTHER events of that type — (sum_g - value_i)/(n_g - 1) —
    the leakage-safe categorical encoder (a plain group mean would let
    each row see its own label; LOO removes the self-contribution
    exactly, no folds needed). Singleton groups encode NULL.

    Scale shape: one map-combinable (sum, count) agg over the group
    key, broadcast back into the scan; the encoding itself is row-
    local arithmetic — the corpus is never re-shuffled. The target is
    quantized to integer cents BEFORE the group sum, so the sum is
    exact bigint arithmetic on both engines and the quotient is the
    same IEEE double everywhere — emitted UNROUNDED, because rounding
    it is what breaks: integer-cents/(100*(n-1)) terminates in decimal
    and lands exactly on .xxxx5 boundaries, where Spark (shortest-repr
    HALF_UP) and DuckDB (exact-expansion) disagree."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_c", F.round(F.col("value") * 100).cast("long")
    )
    stats = ev.groupBy("event_type").agg(
        F.sum("v_c").alias("s_c"), F.count("*").alias("n_g")
    )
    loo = F.when(
        F.col("n_g") > 1,
        (F.col("s_c") - F.col("v_c")) / (100.0 * (F.col("n_g") - 1)),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            loo.alias("loo_encoding"),
        )
    )


QUERIES["target_encode_loo"] = q_target_encode_loo

ORACLES["target_encode_loo"] = """
    WITH ev AS (
        SELECT event_id, event_type, value,
               CAST(round(value * 100) AS BIGINT) AS v_c
        FROM events),
    stats AS (
        SELECT event_type, sum(v_c) AS s_c, count(*) AS n_g
        FROM ev GROUP BY 1)
    SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
           CASE WHEN t.n_g > 1
                THEN (t.s_c - e.v_c) / (100.0 * (t.n_g - 1))
           END AS loo_encoding
    FROM ev e JOIN stats t USING (event_type)
"""
