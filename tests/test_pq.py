"""IVF-PQ (operators/pq.py): production-parameter recall floor,
code-shape invariants, and the normalized-ADC ordering property.
Full-recall oracle parity runs in test_oracle_parity (knn_ivf_pq).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osarchiver_spark.operators.pq import _encode_pandas, ivf_pq_topk, pq_train
from osarchiver_spark.operators.similarity import brute_force_topk
from osarchiver_spark.sources.parquet import load_table


def test_pq_production_params_recall_floor(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(
            emb, queries, "vec_id", "embedding", k=5, nprobe=4, shortlist=32
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    # near-uniform fixture embeddings are the ANN worst case; measured
    # 0.44 with (nprobe=4, shortlist=32) — generous floor for seed drift
    assert recall >= 0.3, f"IVF-PQ recall too low: {recall}"

    # sampled codebook training (the 100 TB build path: Lloyd's over a
    # deterministic hash sample, full-corpus encode) must hold the
    # same production recall floor — centroids fit the sample
    # distribution, index completeness is untouched
    sampled = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=5,
            nprobe=4,
            shortlist=32,
            train_sample=max(64, emb.count() // 4),
        ).collect()
    }
    recall_s = len(exact & sampled) / len(exact)
    assert recall_s >= 0.3, f"sampled-training recall too low: {recall_s}"


def test_pq_codes_are_bounded_and_deterministic(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    books = pq_train(emb, "vec_id", "embedding", m=16, codes=16, iters=1)
    assert len(books) == 16 and all(len(b) <= 16 for b in books)
    base = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    enc1 = {r.neighbor_id: r.code for r in _encode_pandas(base, books).collect()}
    enc2 = {r.neighbor_id: r.code for r in _encode_pandas(base, books).collect()}
    assert enc1 == enc2  # deterministic run-to-run
    codes = np.array(list(enc1.values()))
    assert codes.shape[1] == 16  # m codes per vector — the 4-byte-class index
    assert codes.min() >= 0 and codes.max() < 16


def test_pq_all_identical_vectors_hot_cluster(spark):
    """Degenerate corpus: every vector identical, so one IVF cell holds
    the whole corpus and every PQ code collapses to one entry — the
    hot-cluster analog of the dedup hot-bucket test. ADC scores tie at
    0 everywhere; the shortlist re-rank must still return exactly k
    deterministic neighbors per query (cosine 1.0, id-ascending
    tie-break), not crash on empty codebook cells or return dup rows."""
    vec = [1.0] * 64
    rows = [(i, vec) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_pq_topk(
        emb, queries, "vec_id", "embedding", k=5, nprobe=2, shortlist=8
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        assert len(rs) == 5, f"query {qid}: {len(rs)} rows"
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        assert all(abs(r.cosine - 1.0) < 1e-9 for r in rs)
        ids = [r.neighbor_id for r in sorted(rs, key=lambda r: r.rank)]
        assert ids == sorted(ids), f"tie-break not id-ascending: {ids}"
