"""Similarity search over embedding columns (north-star).

Two paths:

- brute-force top-k: exact cosine against a bounded query set —
  queries × corpus is a broadcast join (queries are small by
  definition), corpus side streams, ranking is a per-query window.
- LSH-bucketed ANN: random-hyperplane buckets (deterministic md5
  coefficients) turn candidate generation into a bucket equi-join;
  multi-probe (flip one plane) trades recall for fan-out. This is
  the 100 TB path: no cross join ever materializes.

All dot products run through zip_with/aggregate — JVM codegen,
float64 accumulation, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from osarchiver_spark.functions.vectors import as_double, cosine, hyperplane_sign_bits


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries: (id_col, vec_col) — expected small; Spark broadcasts it
    (AQE promotes automatically under the 64 MB threshold we set).
    Ranking uses the ROUNDED similarity with id tie-break so results
    are engine-reproducible.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Corpus vectors land in 2^n_planes buckets; a query probes every
    bucket within ``probe_hamming`` bit flips of its own (multi-probe
    LSH: 1 + C(n,1) + C(n,2) probes for hamming 2). Candidates come
    from the bucket equi-join; exact cosine re-ranks them. Recall is
    tested against brute_force_topk in tests/test_similarity.py.

    Tuning note: the fixture embeddings are near-uniform random (top
    neighbors at cosine ≈ 0.45 → per-plane agreement p ≈ 0.65), the
    worst case for hyperplane LSH — hence few planes + deep probing.
    Real clustered embeddings (near-dups at cosine ≥ 0.9, p ≥ 0.85)
    support more planes and shallower probing at much higher recall.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        hyperplane_sign_bits(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        hyperplane_sign_bits(F.col(vec_col), n_planes, dim).alias("qbucket"),
    )
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << p for p in range(n_planes)]
    if probe_hamming >= 2:
        masks += [(1 << p) | (1 << q) for p in range(n_planes) for q in range(p + 1, n_planes)]
    probes = F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks])
    q_probed = q.select("query_id", "qv", F.explode(probes).alias("bucket"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(q_probed)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
