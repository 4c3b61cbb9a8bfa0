"""Vector capstone (operators/export.py::export_vector_store*):
the IVF-cell near-dup rule is batching-independent under a frozen
model, so the incremental (probe/append) build lands a store
row-identical to the one-shot build; the probe itself degenerates to
exact all-pairs at nprobe == n_clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.operators.export import (
    export_vector_store,
    export_vector_store_indexed,
)
from osarchiver_spark.operators.ivf import ivf_index, ivf_neardup_probe, kmeans_fit
from osarchiver_spark.sources.parquet import load_table

THRESHOLD = 0.45  # fixture embeddings are near-uniform (max cos ~0.5)


def test_ivf_neardup_probe_exact_at_full_nprobe(spark, sf_small):
    """nprobe == n_clusters probes every cell, so the probe's pair set
    IS the exact all-pairs threshold set (each corpus vector lives in
    exactly one cell and every cell is scored once per query)."""
    from osarchiver_spark.operators.blas import cogroup_threshold_cosine
    from osarchiver_spark.functions.vectors import as_double

    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    index = ivf_index(emb, "vec_id", "embedding", cents)
    probe = ivf_neardup_probe(
        index, emb, "vec_id", "embedding", cents,
        threshold=THRESHOLD, nprobe=8,
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in probe.filter(F.col("neighbor_id") < F.col("query_id")).collect()
    }

    qside = emb.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
        F.lit(0).alias("g"),
    )
    cside = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("v"),
        F.lit(0).alias("g"),
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cogroup_threshold_cosine(qside, cside, "g", THRESHOLD)
        .filter(F.col("neighbor_id") < F.col("query_id"))
        .collect()
    }
    assert got == exact and len(exact) > 0


def test_vector_export_indexed_is_row_identical(spark, sf_small, tmp_path):
    """The capstone identity at fixture scale: a 3-drop probe/append
    build writes the SAME serving store and manifest as the one-shot
    build, at production nprobe (the approximation is identical on
    both sides — that is the point)."""
    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)

    one = str(tmp_path / "one")
    inc = str(tmp_path / "inc")
    m1 = export_vector_store(
        spark, sf_small, one, cents, threshold=THRESHOLD, nprobe=3
    )
    m2 = export_vector_store_indexed(
        spark, sf_small, inc, str(tmp_path / "dedup_idx"), cents,
        n_batches=3, threshold=THRESHOLD, nprobe=3,
    )
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))

    rows = lambda d: sorted(
        (r.neighbor_id, r.cid, tuple(r.v))
        for r in spark.read.parquet(f"{d}/store")
        .withColumn("cid", F.col("cid").cast("int"))
        .collect()
    )
    r1, r2 = rows(one), rows(inc)
    assert r1 == r2 and len(r1) > 0
    # the dedup removed something (fixture has pairs above THRESHOLD)
    assert len(r1) < emb.count()


def test_vector_export_survivor_store_serves_topk(spark, sf_small, tmp_path):
    """The exported store is a live serving index: ivf_topk_indexed
    over it returns k-deep rankings for a query batch."""
    from osarchiver_spark.operators.ivf import ivf_topk_indexed

    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    out = str(tmp_path / "out")
    export_vector_store(spark, sf_small, out, cents, threshold=THRESHOLD, nprobe=3)
    store = spark.read.parquet(f"{out}/store").withColumn(
        "cid", F.col("cid").cast("int")
    )
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    topk = ivf_topk_indexed(
        store, queries, "vec_id", "embedding", cents, k=5, nprobe=3
    ).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert by_q and all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
