"""sf10 rehearsal of the serving-store small-file compaction
(operators/maintenance.py::compact_partitioned_store): quantify what
per-drop appends do to a cid-partitioned store's file population and
what compaction buys the partition-pruned probe.

Build the vector store via the 8-drop incremental path (each drop
appends >=1 file per touched cell), then:
  - file population + drop-shaped probe wall BEFORE compaction,
  - compact (layout-preserving),
  - file population + the same probe AFTER, plus content fingerprints
    proving the rewrite changed nothing but the physical layout.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_compaction.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_COMPACTION.json.
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

from osarchiver_spark.operators.export import export_vector_store_indexed  # noqa: E402
from osarchiver_spark.operators.ivf import (  # noqa: E402
    ivf_topk_indexed,
    kmeans_fit,
)
from osarchiver_spark.operators.maintenance import (  # noqa: E402
    compact_partitioned_store,
    data_file_stats,
)
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402

N_CLUSTERS, NPROBE, K = 16, 4, 5
N_BATCHES = 8
THRESHOLD = 1.0  # exact-dup-only: the perturbed copies SURVIVE, so every
# batch appends ~25k survivors and the store actually fragments (at
# 0.999 the fixture's copies all lose to batch 0 and batches 1-7
# append nothing -- no small-file problem to measure)


def fingerprint(spark, store: str) -> dict[str, int]:
    df = (
        spark.read.parquet(store)
        .withColumn("cid", F.col("cid").cast("int"))
        .select(
            F.xxhash64(
                F.col("neighbor_id").cast("string"),
                F.col("cid").cast("string"),
                F.concat_ws(",", F.transform("v", lambda x: F.round(x, 6).cast("string"))),
            ).alias("h")
        )
    )
    row = df.agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")).first()
    return {"rows": row["n"], "xor": int(row["x"])}


def probe_wall(spark, store_dir: str, queries, centroids) -> float:
    store = spark.read.parquet(store_dir).withColumn("cid", F.col("cid").cast("int"))
    t = time.perf_counter()
    ivf_topk_indexed(
        store, queries, "vec_id", "embedding", centroids, k=K, nprobe=NPROBE
    ).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_compaction")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=N_CLUSTERS)
    app_id = spark.sparkContext.applicationId
    out_dir = os.path.join(tempfile.gettempdir(), f"compact_out_{app_id}")
    idx_dir = os.path.join(tempfile.gettempdir(), f"compact_idx_{app_id}")
    store = f"{out_dir}/store"

    result: dict = {
        "metric": "osarchiver_spark sf10 serving-store compaction rehearsal",
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {"n_clusters": N_CLUSTERS, "nprobe": NPROBE,
                   "n_batches": N_BATCHES, "threshold": THRESHOLD},
    }

    t = time.perf_counter()
    export_vector_store_indexed(
        spark, sf_dir, out_dir, idx_dir, cents,
        n_batches=N_BATCHES, threshold=THRESHOLD, nprobe=NPROBE,
    )
    result["incremental_build"] = round(time.perf_counter() - t, 3)

    queries = emb.filter(F.col("vec_id") % 2000 == 0)  # drop-shaped batch
    files_b, bytes_b = data_file_stats(spark, store)
    result["before"] = {
        "files": files_b, "bytes": bytes_b,
        "probe_wall": probe_wall(spark, store, queries, cents),
    }
    fp_before = fingerprint(spark, store)

    t = time.perf_counter()
    b, a = compact_partitioned_store(spark, store, "cid")
    result["compact_wall"] = round(time.perf_counter() - t, 3)

    files_a, bytes_a = data_file_stats(spark, store)
    result["after"] = {
        "files": files_a, "bytes": bytes_a,
        "probe_wall": probe_wall(spark, store, queries, cents),
    }
    fp_after = fingerprint(spark, store)
    result["fingerprints"] = {
        "before": fp_before, "after": fp_after,
        "identical": fp_before == fp_after,
    }
    result["files_before_after"] = [b, a]
    result["value"] = round(
        sum(v for k, v in result.items() if k != "sf" and isinstance(v, float)),
        3,
    )  # stage walls only — "sf" is a float field, not a wall

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_COMPACTION.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
