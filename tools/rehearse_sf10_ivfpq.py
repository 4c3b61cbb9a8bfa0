"""sf10 A/B of the two persisted ANN serving indexes (r08 verdict
item 1): full-vector IVF (operators/ivf.py::ivf_index) vs compressed
IVF-PQ (operators/pq.py::ivf_pq_index — the FAISS IVFPQ on-disk
shape), both at PRODUCTION probe depth (nprobe=4/16; PQ shortlist=32).

What it measures, per index:
  - train:   model fit (kmeans for IVF; fused coarse+codebooks for PQ)
  - build:   standing-corpus index write (cid-partitioned parquet)
  - append:  the 10% drop's frozen-model append
  - probe:   the production-depth query pass over the persisted index
  - bytes:   total index size on disk, probed-cid bytes (what the
             partition-pruned read actually touches), and the
             bytes-read ratio — the on-disk half of the IVFPQ pitch
             (codes are ~16 small ints vs 64 doubles per vector, and
             the probe reads nprobe/n_clusters of THAT)

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_ivfpq.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_IVFPQ.json.
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
    ivf_topk_indexed,
    kmeans_fit,
)
from osarchiver_spark.operators.pq import (  # noqa: E402
    _unit_expr,
    ivf_pq_index,
    ivf_pq_topk_indexed,
    pq_joint_fit,
)
from osarchiver_spark.queries.similarity import QUERY_MOD, TOP_K  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402

N_CLUSTERS, NPROBE, SHORTLIST = 16, 4, 32


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _cid_bytes(idx_dir: str) -> dict[int, int]:
    out: dict[int, int] = {}
    for name in os.listdir(idx_dir):
        if name.startswith("cid="):
            out[int(name.split("=", 1)[1])] = _du(os.path.join(idx_dir, name))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_ivfpq")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    # drop-shaped batch: few enough queries that the union of probed
    # cells stays well under n_clusters, so the partition-pruned read
    # (probed_bytes vs index_bytes) is visible — the serving shape of
    # "a handful of lookups against a standing index"
    small = emb.filter(F.col("vec_id") % (QUERY_MOD * 50) == 0)
    standing = emb.filter(F.col("vec_id") % 10 != 3)
    drop = emb.filter(F.col("vec_id") % 10 == 3)
    app_id = spark.sparkContext.applicationId
    result: dict = {
        "metric": "osarchiver_spark sf10 persisted-index A/B: IVF vs IVF-PQ",
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {
            "n_clusters": N_CLUSTERS, "nprobe": NPROBE,
            "shortlist": SHORTLIST, "k": TOP_K,
        },
    }

    # ---- A: full-vector IVF ------------------------------------------
    a: dict = {}
    t = time.perf_counter()
    cents = kmeans_fit(emb, "vec_id", "embedding", k=N_CLUSTERS)
    a["train"] = round(time.perf_counter() - t, 3)
    a_dir = os.path.join(tempfile.gettempdir(), f"ivf_ab_{app_id}")
    t = time.perf_counter()
    ivf_index(standing, "vec_id", "embedding", cents).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(a_dir)
    a["build"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    ivf_index(drop, "vec_id", "embedding", cents).write.mode("append").partitionBy(
        "cid"
    ).parquet(a_dir)
    a["append"] = round(time.perf_counter() - t, 3)
    index_a = spark.read.parquet(a_dir).withColumn("cid", F.col("cid").cast("int"))
    t = time.perf_counter()
    res_a = ivf_topk_indexed(
        index_a, queries, "vec_id", "embedding", cents, k=TOP_K, nprobe=NPROBE
    ).localCheckpoint()
    a["probe"] = round(time.perf_counter() - t, 3)
    a["result_rows"] = res_a.count()
    per_cid_a = _cid_bytes(a_dir)
    # the probed cid set: union over queries of their NPROBE nearest
    # centroids (same math the probe runs; model-sized)
    from osarchiver_spark.operators.ivf import _probe_pandas

    probed_cids_a = sorted(
        r["cid"]
        for r in _probe_pandas(queries, "vec_id", "embedding", cents, NPROBE)
        .select("cid")
        .distinct()
        .collect()
    )
    a["index_bytes"] = sum(per_cid_a.values())
    a["probed_bytes"] = sum(per_cid_a.get(c, 0) for c in probed_cids_a)
    a["probed_cids"] = len(probed_cids_a)
    t = time.perf_counter()
    ivf_topk_indexed(
        index_a, small, "vec_id", "embedding", cents, k=TOP_K, nprobe=NPROBE
    ).write.format("noop").mode("overwrite").save()
    a["small_probe"] = round(time.perf_counter() - t, 3)
    small_cids_a = sorted(
        r["cid"]
        for r in _probe_pandas(small, "vec_id", "embedding", cents, NPROBE)
        .select("cid")
        .distinct()
        .collect()
    )
    a["small_probed_bytes"] = sum(per_cid_a.get(c, 0) for c in small_cids_a)
    a["small_probed_cids"] = len(small_cids_a)
    result["ivf"] = a

    # ---- B: IVF-PQ (codes on disk) -----------------------------------
    b: dict = {}
    t = time.perf_counter()
    emb_n = emb.select(F.col("vec_id"), _unit_expr("embedding").alias("_uv"))
    coarse, books = pq_joint_fit(
        emb_n, "vec_id", "_uv", n_clusters=N_CLUSTERS, m=16, codes=16
    )
    b["train"] = round(time.perf_counter() - t, 3)
    b_dir = os.path.join(tempfile.gettempdir(), f"ivfpq_ab_{app_id}")
    t = time.perf_counter()
    ivf_pq_index(standing, "vec_id", "embedding", coarse, books).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(b_dir)
    b["build"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    ivf_pq_index(drop, "vec_id", "embedding", coarse, books).write.mode(
        "append"
    ).partitionBy("cid").parquet(b_dir)
    b["append"] = round(time.perf_counter() - t, 3)
    index_b = spark.read.parquet(b_dir).withColumn("cid", F.col("cid").cast("int"))
    t = time.perf_counter()
    res_b = ivf_pq_topk_indexed(
        index_b, queries, emb, "vec_id", "embedding", coarse, books,
        k=TOP_K, nprobe=NPROBE, shortlist=SHORTLIST,
    ).localCheckpoint()
    b["probe"] = round(time.perf_counter() - t, 3)
    b["result_rows"] = res_b.count()
    per_cid_b = _cid_bytes(b_dir)
    qbase = queries.select(
        F.col("vec_id").alias("query_id"), _unit_expr("embedding").alias("qv")
    )
    from osarchiver_spark.operators.pq import _probe_coarse

    probed_cids_b = sorted(
        r["cid"]
        for r in _probe_coarse(qbase, coarse, NPROBE, emb.schema["vec_id"].dataType)
        .select("cid")
        .distinct()
        .collect()
    )
    b["index_bytes"] = sum(per_cid_b.values())
    b["probed_bytes"] = sum(per_cid_b.get(c, 0) for c in probed_cids_b)
    b["probed_cids"] = len(probed_cids_b)
    t = time.perf_counter()
    ivf_pq_topk_indexed(
        index_b, small, emb, "vec_id", "embedding", coarse, books,
        k=TOP_K, nprobe=NPROBE, shortlist=SHORTLIST,
    ).write.format("noop").mode("overwrite").save()
    b["small_probe"] = round(time.perf_counter() - t, 3)
    sbase = small.select(
        F.col("vec_id").alias("query_id"), _unit_expr("embedding").alias("qv")
    )
    small_cids_b = sorted(
        r["cid"]
        for r in _probe_coarse(sbase, coarse, NPROBE, emb.schema["vec_id"].dataType)
        .select("cid")
        .distinct()
        .collect()
    )
    b["small_probed_bytes"] = sum(per_cid_b.get(c, 0) for c in small_cids_b)
    b["small_probed_cids"] = len(small_cids_b)
    result["ivf_pq"] = b

    # ---- comparison ---------------------------------------------------
    overlap = (
        res_a.select("query_id", "neighbor_id")
        .intersect(res_b.select("query_id", "neighbor_id"))
        .count()
    )
    result["compare"] = {
        "index_bytes_ratio": round(a["index_bytes"] / max(1, b["index_bytes"]), 2),
        "probed_bytes_ratio": round(a["probed_bytes"] / max(1, b["probed_bytes"]), 2),
        "probe_wall_ratio": round(a["probe"] / max(1e-9, b["probe"]), 2),
        "topk_overlap_frac": round(overlap / max(1, a["result_rows"]), 4),
    }
    result["value"] = round(
        sum(v for v in a.values() if isinstance(v, float))
        + sum(v for v in b.values() if isinstance(v, float)),
        3,
    )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_IVFPQ.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(a_dir, ignore_errors=True)
    shutil.rmtree(b_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
