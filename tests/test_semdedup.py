"""SemDeDup semantics: constructed corpora with known duplicate
structure, grouped-vs-overflow physical-path equality, quantized
k-means reproducibility. Oracle parity for the registered queries
additionally runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osarchiver_spark.operators.ivf import kmeans_fit
from osarchiver_spark.operators.semdedup import (
    semantic_cluster_profile,
    semdedup_losers,
    semdedup_pairs,
)

SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType()),
        T.StructField("v", T.ArrayType(T.FloatType())),
    ]
)


def _corpus(spark):
    # two well-separated groups; ids 1/2/3 identical, 11/12 identical
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [0.9, 0.1, 0.0, 0.0]),
        (11, [0.0, 0.0, 1.0, 0.0]),
        (12, [0.0, 0.0, 1.0, 0.0]),
        (13, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_losers_keep_lowest_id(spark):
    df = _corpus(spark)
    losers = {
        r["vec_id"]: (r["dup_of"], r["cosine"])
        for r in semdedup_losers(
            df, "vid", "v", threshold=0.99, n_clusters=2, iters=2
        ).collect()
    }
    # 1 survives; 2 and 3 both point at 1 (lowest id, cosine 1.0)
    assert losers[2] == (1, 1.0)
    assert losers[3] == (1, 1.0)
    assert 1 not in losers
    # the second duplicate set in the other cluster
    assert losers[12] == (11, 1.0)
    assert 11 not in losers and 13 not in losers


def test_threshold_excludes_near_misses(spark):
    df = _corpus(spark)
    losers = {
        r["vec_id"]
        for r in semdedup_losers(
            df, "vid", "v", threshold=0.999, n_clusters=2, iters=2
        ).collect()
    }
    # 4 (cosine ~0.994 to the [1,0,0,0] set) is below 0.999 — kept
    assert 4 not in losers
    assert {2, 3, 12} <= losers


def test_overflow_path_equals_grouped_path(spark):
    df = _corpus(spark)
    kw = dict(threshold=0.99, n_clusters=2, iters=2)
    grouped = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in semdedup_pairs(df, "vid", "v", max_cluster=4096, **kw).collect()
    }
    # max_cluster=1 forces EVERY cluster through the self-equi-join
    overflow = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in semdedup_pairs(df, "vid", "v", max_cluster=1, **kw).collect()
    }
    assert grouped == overflow
    assert grouped  # non-trivial


def test_cluster_profile_partitions_corpus(spark):
    df = _corpus(spark)
    prof = semantic_cluster_profile(df, "vid", "v", n_clusters=2, iters=2).collect()
    assert sum(r["n_vecs"] for r in prof) == df.count()
    assert all(0 <= r["cid"] < 2 for r in prof)
    assert all(r["inertia"] >= 0.0 for r in prof)


def test_kmeans_quantize_rounds_centroids(spark):
    df = _corpus(spark)
    cents = kmeans_fit(df, "vid", "v", k=2, iters=2, quantize=3)
    for c in cents:
        for x in c:
            assert x == pytest.approx(round(x, 3), abs=1e-12)
