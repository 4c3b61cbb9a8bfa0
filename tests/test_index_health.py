"""Index health + maintenance policy (operators/health.py, r10
verdict item 4): the drift signals the sf10 reindex rehearsal
measured, promoted to an operator with a documented threshold policy
and wired into the streaming maintenance loop."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from osarchiver_spark.operators.health import (
    index_health,
    maintain_store,
    maintenance_decision,
    store_layout_stats,
)
from osarchiver_spark.operators.ivf import ivf_index, kmeans_fit
from osarchiver_spark.sources.parquet import load_table

THRESHOLD = 0.45


def _health(spark, store, cents, queries, nprobe=4):
    return (
        index_health(spark, store, cents, queries, "vec_id", "embedding", nprobe)
        .first()
        .asDict()
    )


def test_healthy_store_reads_near_balanced(spark, sf_small, tmp_path):
    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    store = str(tmp_path / "store")
    ivf_index(emb, "vec_id", "embedding", cents).write.partitionBy("cid").parquet(
        store
    )
    h = _health(spark, store, cents, emb.filter(F.col("vec_id") % 5 == 0))
    assert h["n_cells"] == 8 and h["n_vectors"] == emb.count()
    assert 1.0 <= h["cell_skew"] < 3.0
    # self-queries on a fresh model read close to the balanced ideal
    assert h["balanced_read_frac"] == 0.5  # nprobe=4 / 8 cells
    assert h["mean_query_read_frac"] < 1.5 * h["balanced_read_frac"]
    assert maintenance_decision(h) == "ok"


def test_drifted_store_triggers_retrain(spark, sf_small, tmp_path):
    """The sf10 rehearsal's drift shape, miniaturized: train on the
    base corpus, append coordinate-shifted drops under the FROZEN
    model — mass piles into the nearest cells, skew and per-query
    read amplification rise past the thresholds."""
    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    store = str(tmp_path / "store")
    ivf_index(emb, "vec_id", "embedding", cents).write.partitionBy("cid").parquet(
        store
    )
    hi = emb.agg(F.max("vec_id")).first()[0]
    shifted = lambda d: emb.select(
        (F.col("vec_id") + d * (hi + 1)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.lit(2.5 * d)).otherwise(x),
        ).alias("embedding"),
        "label",
    )
    for d in (1, 2, 3):
        ivf_index(shifted(d), "vec_id", "embedding", cents).write.mode(
            "append"
        ).partitionBy("cid").parquet(store)

    # drifted queries (the live traffic follows the drifted corpus)
    h = _health(spark, store, cents, shifted(3).filter(F.col("vec_id") % 5 == 0))
    assert h["cell_skew"] >= 3.0 or h["mean_query_read_frac"] >= 1.5 * h[
        "balanced_read_frac"
    ], h
    assert maintenance_decision(h) == "retrain"


def test_fragmented_store_compacts_then_ok(spark, sf_small, tmp_path):
    """Healthy data + fragmented layout: decision must be 'compact',
    maintain_store must execute it (content preserved exactly), and
    the re-measured decision must be 'ok'."""
    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    store = str(tmp_path / "store")
    for d in range(8):  # 8 per-drop appends -> >=8 files per cell
        ivf_index(
            emb.filter(F.col("vec_id") % 8 == d), "vec_id", "embedding", cents
        ).write.mode("overwrite" if d == 0 else "append").partitionBy(
            "cid"
        ).parquet(store)

    rows_before = sorted(
        (r.neighbor_id, r.cid, tuple(r.v))
        for r in spark.read.parquet(store)
        .withColumn("cid", F.col("cid").cast("int"))
        .collect()
    )
    layout = store_layout_stats(spark, store)
    assert layout["max_files_per_partition"] >= 8

    report = maintain_store(spark, store, cents, nprobe=4)
    assert report["decision"] == "compact" and report["compacted"]

    after = store_layout_stats(spark, store)
    assert after["max_files_per_partition"] == 1  # huge default target
    assert (
        sorted(
            (r.neighbor_id, r.cid, tuple(r.v))
            for r in spark.read.parquet(store)
            .withColumn("cid", F.col("cid").cast("int"))
            .collect()
        )
        == rows_before
    )
    report2 = maintain_store(spark, store, cents, nprobe=4)
    assert report2["decision"] == "ok" and not report2["compacted"]


def test_streaming_loop_applies_maintenance_policy(spark, sf_small, tmp_path):
    """maintenance_policy wired into run_streaming_vector_maintenance:
    per-epoch appends fragment the store; after the drain the policy's
    compact branch rewrites it — same rows, one file per cell."""
    from osarchiver_spark.streaming.vector_store import (
        run_streaming_vector_maintenance,
    )

    emb = load_table(spark, sf_small, "embeddings")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    step = -(-(int(hi) - int(lo) + 1) // 8)
    src_sf = tmp_path / "src_sf"
    land = src_sf / "embeddings.parquet"
    os.makedirs(land)
    for i in range(8):  # 8 mtime-ordered files -> 8 epochs
        scratch = str(tmp_path / f"scratch{i}")
        emb.filter(
            (F.col("vec_id") >= int(lo) + i * step)
            & (F.col("vec_id") < int(lo) + (i + 1) * step)
        ).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        dst = str(land / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    plain_store = str(tmp_path / "plain")
    run_streaming_vector_maintenance(
        spark, str(src_sf), str(tmp_path / "pidx"), plain_store, cents,
        threshold=THRESHOLD, nprobe=3, max_files_per_trigger=1,
    )
    maint_store_dir = str(tmp_path / "maint")
    run_streaming_vector_maintenance(
        spark, str(src_sf), str(tmp_path / "midx"), maint_store_dir, cents,
        threshold=THRESHOLD, nprobe=3, max_files_per_trigger=1,
        maintenance_policy={"nprobe": 4},
    )
    rows = lambda d: sorted(
        (r.neighbor_id, r.cid, tuple(r.v))
        for r in spark.read.parquet(d)
        .withColumn("cid", F.col("cid").cast("int"))
        .collect()
    )
    assert rows(plain_store) == rows(maint_store_dir)
    assert (
        store_layout_stats(spark, plain_store)["max_files_per_partition"] > 1
    )
    assert (
        store_layout_stats(spark, maint_store_dir)["max_files_per_partition"]
        == 1
    )


def test_policy_classifies_the_sf10_drift_trajectory():
    """The thresholds (SKEW_RETRAIN=3.0, READ_AMP_RETRAIN=1.5) must
    classify the REAL sf10 measurements the rehearsal recorded
    (BENCH_SF10_REINDEX.json): fresh build -> ok, 1-2 drifted drops ->
    ok (amplification under 1.5x), 3 drifted drops -> retrain (skew
    3.748, read 1.74x balanced), and the migrated store -> ok again.
    Committed measurements, no Spark needed — this pins that the
    defaults separate the healthy and drifted regimes an operator
    actually observes at scale."""
    import json
    import pathlib

    rec = json.loads(
        (pathlib.Path(__file__).parents[1] / "BENCH_SF10_REINDEX.json").read_text()
    )

    def health_of(sig):
        return {
            "cell_skew": sig["cell_skew_max_over_mean"],
            "mean_query_read_frac": sig["per_query_read_frac"],
            "balanced_read_frac": sig["balanced_per_query_frac"],
        }

    decisions = [maintenance_decision(health_of(s)) for s in rec["drift"]]
    assert decisions == ["ok", "ok", "ok", "retrain"], decisions
    assert maintenance_decision(health_of(rec["after_migration"])) == "ok"
