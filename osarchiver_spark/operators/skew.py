"""Skew mitigation helpers (SURVEY §7 step 6, 100 TB discipline).

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; these explicit forms are for the pathological shapes AQE
can't fix — a single hot key inside an aggregation, or a broadcast-
too-large dimension joined on a skewed fk.

Semantics are proven by tests/test_skew.py: salted results must equal
their unsalted twins exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det_salt(df: DataFrame, salt_buckets: int) -> Column:
    """Deterministic row salt: pmod(hash(all columns), n). Unlike
    F.rand(seed), which seeds PER PARTITION, this is a pure function
    of the row — re-runs are bit-stable under any repartitioning. A
    hot key's rows spread as long as they differ in any column;
    fully-identical duplicate rows share a bucket (if that's the
    skew shape, dedup or count-collapse them first)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: the hot key is
    spread over ``salt_buckets`` partial groups, then partials merge.
    (groupBy already does map-side partial aggregation; the explicit
    salt additionally splits the *reduce side* of one giant key.)

    Returns (keys..., n, total) at a fixed 4-decimal grid: values are
    quantized to bigint 1e-4 units BEFORE the partial sums, so the
    two-level (partial -> merge) aggregation is exact integer
    arithmetic — a double sum's result would depend on how the salt
    split the key (the exact nondeterminism this operator exists to
    manage)."""
    from osarchiver_spark.functions.precision import quantize

    salted = df.withColumn("_salt", _det_salt(df, salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count("*").alias("_n"), F.sum(quantize(F.col(value_col), 4)).alias("_s")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"), (F.sum("_s") / F.lit(10000.0)).alias("total")
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed-fact ⋈ dimension with key salting: the fact side gets a
    random salt in [0, n); the dimension is exploded n× so every
    (key, salt) pair finds its match. Shuffle partitions for the hot
    key then differ in the salt and spread across reducers.

    Cost model: dim is replicated ``salt_buckets``× — use only when
    dim is too big to broadcast but small enough to replicate.
    """
    salted_fact = skewed.withColumn("_salt", _det_salt(skewed, salt_buckets))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = salted_fact.join(exploded_dim, [key, "_salt"])
    return joined.drop("_salt")


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts vs the mean — what you run
    BEFORE deciding on salting (the moral twin of the reference's
    dry-run reporting)."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    stats = counts.agg(F.avg("n").alias("avg_n")).collect()[0]
    return (
        counts.withColumn("skew_ratio", F.round(F.col("n") / F.lit(float(stats.avg_n)), 2))
        .orderBy(F.col("n").desc())
        .limit(top_n)
    )
