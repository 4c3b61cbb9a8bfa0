"""sf10 rehearsal of the STREAMING vector-store maintenance loop
(r10 verdict item 5): its cross-scale evidence stopped at sf1 (the
exact-parameter oracle saturates there), so — the dedup_clusters
precedent — measure the Spark side alone one decade further, at the
PRODUCTION pruning parameters the batch capstone rehearses
(k=16, nprobe=4, threshold 0.999 targeting the fixture's planted
near-duplicate clusters).

Shape: the 200k-vector sf10 corpus lands as N_DROPS mtime-ordered
drop files; the maintenance loop consumes them as micro-batches
(maxFilesPerTrigger=1), each probing the standing cid-partitioned
dedup index and appending cells + survivors. Recorded:

  - per-epoch wall (the live serving cost per drop);
  - fingerprint identity with the one-shot export_vector_store
    build (order-independent xor over (vec_id, cid, rounded
    vector)) — the capstone identity, live, at sf10;
  - the maintenance policy's post-drain health check
    (operators/health.py): per-drop appends fragment the store, the
    compact branch rewrites it layout-preserving, and the store
    fingerprint is unchanged.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_streaming_vector.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_STREAMING_VECTOR.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osarchiver_spark.operators.export import export_vector_store  # noqa: E402
from osarchiver_spark.operators.health import (  # noqa: E402
    index_health,
    store_layout_stats,
)
from osarchiver_spark.operators.ivf import kmeans_fit  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402
from osarchiver_spark.streaming.vector_store import (  # noqa: E402
    run_streaming_vector_maintenance,
)

N_CLUSTERS, NPROBE = 16, 4
THRESHOLD = 0.999  # the planted near-dup clusters (base ceiling ~0.5)
N_DROPS = 8  # 8 epochs: enough per-cell index appends to cross the
# default files_per_partition_compact=8 trigger post-drain


def fingerprint(spark, store: str) -> dict[str, int]:
    df = (
        spark.read.parquet(store)
        .withColumn("cid", F.col("cid").cast("int"))
        .select(
            F.xxhash64(
                F.col("neighbor_id").cast("string"),
                F.col("cid").cast("string"),
                F.concat_ws(
                    ",", F.transform("v", lambda x: F.round(x, 6).cast("string"))
                ),
            ).alias("h")
        )
    )
    row = df.agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")).first()
    return {"rows": row["n"], "xor": int(row["x"])}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_streaming_vector")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    emb = load_table(spark, sf_dir, "embeddings")
    stages: dict[str, float] = {}
    t = time.perf_counter()
    cents = kmeans_fit(emb, "vec_id", "embedding", k=N_CLUSTERS)
    stages["train"] = round(time.perf_counter() - t, 3)

    base = tempfile.mkdtemp(prefix="streaming_vector_sf10_")
    # id-ordered multi-file landing dir: drop i = id-range i, mtime t0+i
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    step = -(-(int(hi) - int(lo) + 1) // N_DROPS)
    land = f"{base}/src/embeddings.parquet"
    os.makedirs(land)
    t = time.perf_counter()
    for i in range(N_DROPS):
        scratch = f"{base}/scratch{i}"
        emb.filter(
            (F.col("vec_id") >= int(lo) + i * step)
            & (F.col("vec_id") < int(lo) + (i + 1) * step)
        ).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        dst = f"{land}/drop{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stages["stage_drops"] = round(time.perf_counter() - t, 3)

    one = f"{base}/one"
    t = time.perf_counter()
    export_vector_store(
        spark, f"{base}/src", one, cents, threshold=THRESHOLD, nprobe=NPROBE
    )
    stages["one_shot"] = round(time.perf_counter() - t, 3)

    idx, store = f"{base}/idx", f"{base}/store"
    epoch_walls: dict[str, float] = {}
    t = time.perf_counter()
    run_streaming_vector_maintenance(
        spark, f"{base}/src", idx, store, cents,
        threshold=THRESHOLD, nprobe=NPROBE, max_files_per_trigger=1,
        on_epoch=lambda eid, secs: epoch_walls.__setitem__(f"epoch{eid}", secs),
    )
    stages["streaming_total"] = round(time.perf_counter() - t, 3)

    fp_one = fingerprint(spark, f"{one}/store")
    fp_stream = fingerprint(spark, store)

    # post-drain maintenance: per-epoch appends fragment the dedup
    # index (every epoch appends ALL its cells) and possibly the
    # store; the policy's compact branch must rewrite layout-preserving
    layout_before = store_layout_stats(spark, store)
    idx_before = store_layout_stats(spark, idx)
    health = (
        index_health(
            spark, store, cents,
            spark.read.parquet(store).select("neighbor_id", "v"),
            "neighbor_id", "v", NPROBE,
        )
        .first()
        .asDict()
    )
    t = time.perf_counter()
    from osarchiver_spark.operators.health import maintain_store

    report = maintain_store(spark, store, cents, index_dir=idx, nprobe=NPROBE)
    stages["maintain"] = round(time.perf_counter() - t, 3)
    layout_after = store_layout_stats(spark, store)
    fp_compacted = fingerprint(spark, store)

    result = {
        "metric": "osarchiver_spark sf10 streaming vector maintenance: "
        f"{N_DROPS}-drop live loop vs one-shot",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {
            "n_clusters": N_CLUSTERS,
            "nprobe": NPROBE,
            "threshold": THRESHOLD,
            "n_drops": N_DROPS,
        },
        "stages_sec": stages,
        "epoch_walls_sec": epoch_walls,
        "content_identical": bool(fp_one == fp_stream),
        "fingerprints": {"one_shot": fp_one, "streaming": fp_stream},
        "health": {k: (round(v, 6) if isinstance(v, float) else v) for k, v in health.items()},
        "maintenance": {
            "decision": report["decision"],
            "compacted": report["compacted"],
            "store_files_before": layout_before["n_files"],
            "store_files_after": layout_after["n_files"],
            "store_max_files_per_cell_before": layout_before[
                "max_files_per_partition"
            ],
            "store_max_files_per_cell_after": layout_after[
                "max_files_per_partition"
            ],
            "index_files_before": idx_before["n_files"],
            "index_files_after": store_layout_stats(spark, idx)["n_files"],
            "index_max_files_per_cell_before": idx_before[
                "max_files_per_partition"
            ],
            "index_max_files_per_cell_after": store_layout_stats(spark, idx)[
                "max_files_per_partition"
            ],
            "fingerprint_unchanged": bool(fp_compacted == fp_stream),
        },
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_STREAMING_VECTOR.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
