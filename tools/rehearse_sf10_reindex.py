"""sf10 rehearsal of the IVF retrain/migration path (r09 verdict
item 1): the operational story the frozen-model index family was
missing — what happens when the corpus DRIFTS away from the frozen
centroids, and what `ivf_reindex` buys when it does.

Setup (deterministic; the shared fixture is never modified):
  - the sf10 embedding corpus is split into 4 vec_id%4 drops;
  - drop d's vectors are SHIFTED by +SHIFT_STEP*d in coordinate 0 —
    synthetic distribution drift (the fixture itself is stationary:
    its perturbed copies move by ≤1e-1 in one coordinate, far too
    little to stress a 16-cell model, so drift is injected explicitly
    and identically on every run);
  - model A (k=16) is trained on drop 0 ONLY — the "trained at launch"
    model;
  - the store is built from drop 0 under A, then drops 1..3 are
    APPENDED under frozen A (FAISS IndexIVF.add semantics — exactly
    what operators/ivf.py::ivf_index documents);
  - after each append: probe recall@5 (nprobe=4 vs brute force over
    the CURRENT store, 500-query sample from the newest drop) and
    cell-occupancy skew (max/mean) — the two operational signals that
    motivate a retrain;
  - then: retrain model B (k=16) on the full drifted corpus,
    `ivf_reindex` the standing store into a NEW directory, prove the
    migrated store is CONTENT-IDENTICAL to a fresh
    `ivf_index(corpus, B)` build (order-independent xor fingerprint +
    row count), and re-measure recall/skew on the migrated store.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_reindex.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_REINDEX.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osarchiver_spark.operators.ivf import (  # noqa: E402
    ivf_index,
    ivf_reindex,
    ivf_topk_indexed,
    kmeans_fit,
)
from osarchiver_spark.operators.similarity import brute_force_topk  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402

N_CLUSTERS, NPROBE, K = 16, 4, 5
N_DROPS = 4
SHIFT_STEP = 0.35  # coordinate-0 shift per drop — the injected drift
QUERY_MOD = 400  # ~500 queries per drop at 200k vectors / 4 drops


def shifted(emb, d: int):
    """Drop d with its coordinate-0 drift applied (pure expression —
    deterministic, fixture untouched)."""
    drop = emb.filter(F.col("vec_id") % N_DROPS == d)
    if d == 0:
        return drop
    shift = float(SHIFT_STEP * d)
    return drop.withColumn(
        "embedding",
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(shift)),
            F.slice("embedding", 2, 10_000),
        ),
    )


def fingerprint(spark, df) -> dict[str, int]:
    h = df.select(
        F.xxhash64(
            F.col("neighbor_id").cast("string"),
            F.col("cid").cast("string"),
            F.concat_ws(",", F.transform("v", lambda x: F.round(x, 6).cast("string"))),
        ).alias("h")
    )
    row = h.agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")).first()
    return {"rows": row["n"], "xor": int(row["x"])}


def store_signals(spark, store_dir: str, queries, centroids) -> dict:
    """The retrain triggers, measured per store state:
    - probe recall@K at production nprobe (vs brute force over the
      same store);
    - cell-occupancy skew (max/mean) — drifted mass piles into the
      frozen model's nearest cells;
    - probe READ AMPLIFICATION: the fraction of store rows the query
      batch's probed cells actually contain, vs the nprobe/n_cells
      fraction a balanced index would read. On co-drifting data
      (queries and their true neighbors shift together) recall can
      stay flat while every probe reads ever-hotter cells — at 100 TB
      the read fraction IS the serving cost, so it is the signal that
      fires first."""
    from osarchiver_spark.operators.ivf import _probe_pandas

    store = spark.read.parquet(store_dir).withColumn("cid", F.col("cid").cast("int"))
    occ = {r["cid"]: r["count"] for r in store.groupBy("cid").count().collect()}
    counts = list(occ.values())
    total = sum(counts)
    skew = round(max(counts) / (total / len(counts)), 3)
    probed = _probe_pandas(queries, "vec_id", "embedding", centroids, NPROBE)
    per_q = probed.groupBy("query_id").agg(
        F.collect_list("cid").alias("cids")
    ).collect()
    probed_cids = sorted({c for r in per_q for c in r["cids"]})
    read_frac = round(sum(occ.get(c, 0) for c in probed_cids) / total, 4)
    # per-QUERY serving cost: the mean fraction of store rows a single
    # probe's nprobe cells contain (balanced ideal = nprobe/n_cells)
    per_query_frac = round(
        sum(sum(occ.get(c, 0) for c in r["cids"]) for r in per_q)
        / (len(per_q) * total),
        4,
    )
    corpus = store.select(F.col("neighbor_id").alias("vec_id"), F.col("v").alias("embedding"))
    exact = brute_force_topk(corpus, queries, "vec_id", "embedding", k=K)
    approx = ivf_topk_indexed(
        store, queries, "vec_id", "embedding", centroids, k=K, nprobe=NPROBE
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = round(len(e & a) / max(1, len(e)), 4)
    return {
        "recall_at_k": recall,
        "cell_skew_max_over_mean": skew,
        "probed_cells": len(probed_cids),
        "batch_union_read_frac": read_frac,
        "per_query_read_frac": per_query_frac,
        "balanced_per_query_frac": round(NPROBE / len(counts), 4),
        "n_cells": len(counts),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_reindex")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    emb = load_table(spark, sf_dir, "embeddings")
    app_id = spark.sparkContext.applicationId
    old_dir = os.path.join(tempfile.gettempdir(), f"reindex_old_{app_id}")
    new_dir = os.path.join(tempfile.gettempdir(), f"reindex_new_{app_id}")
    fresh_dir = os.path.join(tempfile.gettempdir(), f"reindex_fresh_{app_id}")

    result: dict = {
        "metric": "osarchiver_spark sf10 IVF retrain/migration rehearsal",
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {
            "n_clusters": N_CLUSTERS, "nprobe": NPROBE, "k": K,
            "n_drops": N_DROPS, "shift_step": SHIFT_STEP,
        },
        "drift": [],
    }

    t = time.perf_counter()
    drop0 = shifted(emb, 0)
    model_a = kmeans_fit(drop0, "vec_id", "embedding", k=N_CLUSTERS)
    result["train_a_on_drop0"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    ivf_index(drop0, "vec_id", "embedding", model_a).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(old_dir)
    result["build_drop0"] = round(time.perf_counter() - t, 3)
    # query sample must be congruent with the drop's vec_id % N_DROPS
    # class (4 | QUERY_MOD, so % QUERY_MOD == d lands inside drop d)
    q0 = drop0.filter(F.col("vec_id") % QUERY_MOD == 0)
    sig = store_signals(spark, old_dir, q0, model_a)
    result["drift"].append({"drops_since_train": 0, **sig})

    full = drop0
    for d in range(1, N_DROPS):
        drop = shifted(emb, d)
        t = time.perf_counter()
        ivf_index(drop, "vec_id", "embedding", model_a).write.mode(
            "append"
        ).partitionBy("cid").parquet(old_dir)
        append_s = round(time.perf_counter() - t, 3)
        qd = drop.filter(F.col("vec_id") % QUERY_MOD == d)
        sig = store_signals(spark, old_dir, qd, model_a)
        result["drift"].append(
            {"drops_since_train": d, "append_s": append_s, **sig}
        )
        full = full.unionByName(drop)

    # ---- retrain + migrate ------------------------------------------
    t = time.perf_counter()
    model_b = kmeans_fit(full, "vec_id", "embedding", k=N_CLUSTERS)
    result["retrain_b_full_corpus"] = round(time.perf_counter() - t, 3)

    standing = spark.read.parquet(old_dir).withColumn("cid", F.col("cid").cast("int"))
    t = time.perf_counter()
    ivf_reindex(standing, model_b).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(new_dir)
    result["reindex_migrate"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    ivf_index(full, "vec_id", "embedding", model_b).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(fresh_dir)
    result["fresh_build_baseline"] = round(time.perf_counter() - t, 3)

    read = lambda d: spark.read.parquet(d).withColumn("cid", F.col("cid").cast("int"))
    fp_m = fingerprint(spark, read(new_dir))
    fp_f = fingerprint(spark, read(fresh_dir))
    result["fingerprints"] = {"migrated": fp_m, "fresh": fp_f,
                              "identical": fp_m == fp_f}

    q_last = shifted(emb, N_DROPS - 1).filter(
        F.col("vec_id") % QUERY_MOD == N_DROPS - 1
    )
    result["after_migration"] = store_signals(spark, new_dir, q_last, model_b)

    result["value"] = round(
        sum(v for k, v in result.items() if k != "sf" and isinstance(v, float)),
        3,
    )  # stage walls only — "sf" is a float field, not a wall
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_REINDEX.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    for d in (old_dir, new_dir, fresh_dir):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
