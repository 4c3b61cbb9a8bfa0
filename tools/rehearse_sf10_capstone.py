"""Chained sf10 capstone rehearsal: the FULL training-set build —
gate → LSH near-dup removal → leakage-free split → gzip JSONL export
+ train packing layout — as ONE run (operators/export.py::
export_training_set) at 100x the adjudicated scale, not per-query.

What the per-query sweeps can't see and this run does:
- cluster-map reuse across stages (the LSH pair graph feeds BOTH the
  dedup anti-join and the split keys from one computation),
- checkpoint/persist lifetimes across the chain (connected_components
  checkpoints edges; the survivor set persists across 3 split writes
  + the packing layout),
- end-to-end wall and the on-disk artifact sizes a trainer would pay.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_capstone.py [SF_DIR] [OUT_DIR]
(64g = the 2 GB/core sf10 rehearsal heap convention, SCALE.md; the 8g
default OOMs in the label-init aggregate while the 49.5M-edge
localCheckpoint blocks are pinned)
Defaults: .scale/sf10, a temp dir. Writes BENCH_SF10_CAPSTONE.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osarchiver_spark.operators.export import export_training_set  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="capstone_")
    spark = get_spark("osarchiver_spark_sf10_capstone")
    # JVM warmup so the measurement is the pipeline, not class loading
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.perf_counter()
    manifest = export_training_set(spark, sf_dir, out_dir)
    rows = sorted(
        ((r["split"], int(r["n_docs"]), int(r["n_tokens"])) for r in manifest.collect())
    )
    wall = round(time.perf_counter() - t0, 3)

    sizes = {
        name: _du(os.path.join(out_dir, name))
        for name in ("train", "val", "test", "train_layout", "manifest")
        if os.path.isdir(os.path.join(out_dir, name))
    }
    # pinned storage still live at end of run (localCheckpoint blocks
    # + surviving persists) straight from the block manager — the
    # lifetimes question the per-query sweeps can't see
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    pinned_mem = sum(i.memSize() for i in infos)
    pinned_disk = sum(i.diskSize() for i in infos)

    result = {
        "metric": "osarchiver_spark sf10 chained capstone (gate->dedup->split->export)",
        "value": wall,
        "unit": "sec",
        "sf": 10.0,
        "manifest": [
            {"split": s, "n_docs": d, "n_tokens": t} for s, d, t in rows
        ],
        "artifact_bytes": sizes,
        "pinned_mem_bytes": pinned_mem,
        "pinned_disk_bytes": pinned_disk,
        "out_dir": out_dir,
    }
    line = json.dumps(result)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_SF10_CAPSTONE.json"), "w"
    ) as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
