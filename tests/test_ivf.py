"""IVF ANN: k-means converges to a sane partition; probing beats
random and approaches brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.operators.ivf import ivf_topk, kmeans_fit
from osarchiver_spark.operators.similarity import brute_force_topk
from osarchiver_spark.sources.parquet import load_table


def test_kmeans_deterministic_and_partitioning(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    c1 = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    c2 = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    assert c1 == c2  # deterministic init + fixed-order reductions
    assert len(c1) == 8 and len(c1[0]) == 64


def test_ivf_recall_beats_random(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_clusters=16, nprobe=6)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # near-uniform random embeddings are ANN's worst case; random
    # guessing at nprobe=6/16 fan-out would land ~37% — require better
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_exact_when_probing_everything(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    full = ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_clusters=8, nprobe=8)
    e = {(r.query_id, r.rank, r.neighbor_id) for r in exact.collect()}
    f = {(r.query_id, r.rank, r.neighbor_id) for r in full.collect()}
    assert e == f  # nprobe == n_clusters degenerates to exact search
