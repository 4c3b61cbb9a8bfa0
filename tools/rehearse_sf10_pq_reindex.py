"""sf10 rehearsal of the PQ retrain/migration twin (r09 verdict
item 1): `ivf_pq_reindex` — unlike the full-vector store, the code
index holds NO vectors, so migrating to a retrained model (new coarse
centroids + new codebooks) must re-fetch vectors by id semi-join from
the source table and re-encode. This script measures that cost
against the fresh-build baseline at sf10 and proves the migrated
store is content-identical.

Model split mirrors the IVF rehearsal: OLD model trained on the
vec_id%4==0 quarter (the "trained at launch" model), NEW model on the
full corpus. The store's MEMBERSHIP is a survivors-style subset
(vec_id%7 != 0) to prove migration preserves membership, not the
source table.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_pq_reindex.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_PQ_REINDEX.json.
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

from osarchiver_spark.operators.pq import (  # noqa: E402
    _unit_expr,
    ivf_pq_index,
    ivf_pq_reindex,
    pq_joint_fit,
)
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402

N_CLUSTERS, M, CODES = 16, 16, 16
TRAIN_SAMPLE_RATIO = 8  # xxhash64(id) % 8 == 0 -> ~12.5% training sample


def fingerprint(spark, df) -> dict[str, int]:
    h = df.select(
        F.xxhash64(
            F.col("neighbor_id").cast("string"),
            F.col("cid").cast("string"),
            F.concat_ws(",", F.transform("code", lambda x: x.cast("string"))),
        ).alias("h")
    )
    row = h.agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")).first()
    return {"rows": row["n"], "xor": int(row["x"])}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_pq_reindex")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    emb = load_table(spark, sf_dir, "embeddings")
    members = emb.filter(F.col("vec_id") % 7 != 0)  # survivors-style subset
    app_id = spark.sparkContext.applicationId
    old_dir = os.path.join(tempfile.gettempdir(), f"pqreidx_old_{app_id}")
    new_dir = os.path.join(tempfile.gettempdir(), f"pqreidx_new_{app_id}")
    fresh_dir = os.path.join(tempfile.gettempdir(), f"pqreidx_fresh_{app_id}")

    result: dict = {
        "metric": "osarchiver_spark sf10 IVF-PQ retrain/migration rehearsal",
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {"n_clusters": N_CLUSTERS, "m": M, "codes": CODES,
                   "train_sample_mod": TRAIN_SAMPLE_RATIO},
    }

    # codebook training uses the production sampled path (train_sample
    # discipline) — the rehearsal measures migration, not Lloyd's
    emb_n = emb.select(F.col("vec_id"), _unit_expr("embedding").alias("_uv"))
    sample = emb_n.filter(F.pmod(F.xxhash64("vec_id"), F.lit(TRAIN_SAMPLE_RATIO)) == 0)

    t = time.perf_counter()
    coarse_a, books_a = pq_joint_fit(
        sample.filter(F.col("vec_id") % 4 == 0), "vec_id", "_uv",
        n_clusters=N_CLUSTERS, m=M, codes=CODES,
    )
    result["train_old_model"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    ivf_pq_index(members, "vec_id", "embedding", coarse_a, books_a).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(old_dir)
    result["build_old_store"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    coarse_b, books_b = pq_joint_fit(
        sample, "vec_id", "_uv", n_clusters=N_CLUSTERS, m=M, codes=CODES
    )
    result["retrain_new_model"] = round(time.perf_counter() - t, 3)

    standing = spark.read.parquet(old_dir).withColumn("cid", F.col("cid").cast("int"))
    t = time.perf_counter()
    ivf_pq_reindex(
        standing, emb, "vec_id", "embedding", coarse_b, books_b
    ).write.mode("overwrite").partitionBy("cid").parquet(new_dir)
    result["reindex_migrate"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    ivf_pq_index(members, "vec_id", "embedding", coarse_b, books_b).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(fresh_dir)
    result["fresh_build_baseline"] = round(time.perf_counter() - t, 3)

    read = lambda d: spark.read.parquet(d).withColumn("cid", F.col("cid").cast("int"))
    fp_m = fingerprint(spark, read(new_dir))
    fp_f = fingerprint(spark, read(fresh_dir))
    result["fingerprints"] = {"migrated": fp_m, "fresh": fp_f,
                              "identical": fp_m == fp_f}
    result["value"] = round(
        sum(v for k, v in result.items() if k != "sf" and isinstance(v, float)),
        3,
    )  # stage walls only — "sf" is a float field, not a wall

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_PQ_REINDEX.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    for d in (old_dir, new_dir, fresh_dir):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
