"""IVF (inverted-file) approximate nearest neighbor — the second
scale path for similarity search next to hyperplane LSH
(operators/similarity.py).

Index build = k-means (Lloyd's) expressed as DataFrame iterations:
assignment is a JVM expression over broadcast centroid literals
(argmin of k dot-product distances), the update step is a
posexplode + groupBy(cluster, dim) average. Only the MODEL (k × dim
floats) ever touches the driver — the data never does, so the same
loop runs unchanged against 10^11 rows.

Search = assign each query to its ``nprobe`` nearest centroids,
equi-join candidates on cluster id, exact cosine re-rank. Fan-out is
nprobe/k of the corpus instead of all of it.

Determinism: centroids initialize from the k lowest-id vectors and
every step is a fixed-order float64 reduction, so results are
reproducible run-to-run (recall asserted in tests/test_ivf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from osarchiver_spark.functions.vectors import as_double, cosine


def _sq_dist(vec, centroid_literal):
    diff = F.zip_with(vec, centroid_literal, lambda x, c: (x - c) * (x - c))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _centroid_array(c: list[float]):
    return F.array(*[F.lit(float(x)) for x in c])


def _assign(base: DataFrame, centroids: list[list[float]]) -> DataFrame:
    dists = F.array(*[_sq_dist(F.col("v"), _centroid_array(c)) for c in centroids])
    return base.withColumn("cid", F.array_position(dists, F.array_min(dists)) - 1)


def kmeans_fit(
    df: DataFrame, id_col: str, vec_col: str, k: int = 16, iters: int = 3
) -> list[list[float]]:
    """Lloyd's iterations; returns k centroids (driver-side model)."""
    base = df.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")).cache()
    try:
        init = base.orderBy("vid").limit(k).collect()
        centroids = [list(r.v) for r in init]
        dim = len(centroids[0])
        for _ in range(iters):
            assigned = _assign(base, centroids)
            sums = (
                assigned.select("cid", F.posexplode("v").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            by_cid: dict[int, list[float]] = {}
            for r in sums:
                by_cid.setdefault(r.cid, [0.0] * dim)[r.pos] = r.s / r.n
            # empty clusters keep their previous centroid
            centroids = [by_cid.get(i, centroids[i]) for i in range(k)]
        return centroids
    finally:
        base.unpersist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k neighbors via IVF probing."""
    if centroids is None:
        centroids = kmeans_fit(corpus, id_col, vec_col, k=n_clusters)
    c_assigned = _assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("v")),
        centroids,
    ).select("neighbor_id", F.col("v").alias("cv"), "cid")

    qbase = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    dists = F.array(*[_sq_dist(F.col("qv"), _centroid_array(c)) for c in centroids])
    ranked_cids = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dists,
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            ),
            lambda s: s.getField("i"),
        ),
        1,
        nprobe,
    )
    probed = qbase.withColumn("cid", F.explode(ranked_cids))

    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(probed)
        .join(c_assigned, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
