"""Vector-capstone rehearsal at sf10 (r08 verdict item 7): the
embedding mirror of the indexed text-export capstone. Builds the
deduped IVF serving store twice —

  A. export_vector_store          — one-shot over the full corpus
  B. export_vector_store_indexed  — 4 vec_id-ordered drops, each a
     partition-pruned probe of the persisted dedup index + two appends
     (dedup cells, survivor store)

— under the SAME frozen centroid model, and proves the artifacts
content-identical (per-store order-independent fingerprints: row
count + xor of per-row xxhash64 over (vec_id, cid, rounded vector) +
manifest row compare), with per-drop probe/append wall recorded so
the "per-drop cost is probe-shaped" claim is measured.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_vector_store.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_VECTOR_STORE.json.
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

from osarchiver_spark.operators.export import (  # noqa: E402
    export_vector_store,
    export_vector_store_indexed,
)
from osarchiver_spark.operators.ivf import kmeans_fit  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402

N_CLUSTERS, NPROBE = 16, 4
# scale fixtures perturb copies into ~K-sized near-neighbor clusters;
# 0.999 targets exactly those (the base-corpus cosine ceiling is ~0.5)
THRESHOLD = 0.999


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
    row = df.agg(
        F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")
    ).first()
    return {"rows": row["n"], "xor": int(row["x"])}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_vector_store")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    emb = load_table(spark, sf_dir, "embeddings")
    stages: dict[str, float] = {}
    t = time.perf_counter()
    cents = kmeans_fit(emb, "vec_id", "embedding", k=N_CLUSTERS)
    stages["train"] = round(time.perf_counter() - t, 3)

    base = tempfile.mkdtemp(prefix="vector_store_ab_")
    one, inc, idx = f"{base}/one", f"{base}/inc", f"{base}/dedup_idx"

    t = time.perf_counter()
    m1 = export_vector_store(
        spark, sf_dir, one, cents, threshold=THRESHOLD, nprobe=NPROBE
    )
    stages["one_shot"] = round(time.perf_counter() - t, 3)
    n_one = sum(r.n_vectors for r in m1.collect())

    t = time.perf_counter()
    m2 = export_vector_store_indexed(
        spark, sf_dir, inc, idx, cents,
        n_batches=4, threshold=THRESHOLD, nprobe=NPROBE,
        on_stage=lambda label, secs: stages.__setitem__(label, secs),
    )
    stages["incremental_total"] = round(time.perf_counter() - t, 3)
    n_inc = sum(r.n_vectors for r in m2.collect())

    fp1 = fingerprint(spark, f"{one}/store")
    fp2 = fingerprint(spark, f"{inc}/store")
    manifest_equal = sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))

    result = {
        "metric": "osarchiver_spark sf10 vector capstone: one-shot vs 4-drop indexed",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {"n_clusters": N_CLUSTERS, "nprobe": NPROBE, "threshold": THRESHOLD},
        "stages_sec": stages,
        "survivors": {"one_shot": n_one, "incremental": n_inc},
        "content_identical": bool(manifest_equal and fp1 == fp2),
        "fingerprints": {"one_shot": fp1, "incremental": fp2},
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_VECTOR_STORE.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
