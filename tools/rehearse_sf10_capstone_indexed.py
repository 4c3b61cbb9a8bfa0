"""Chained sf10 capstone THROUGH THE INCREMENTAL INDEX — VERDICT r07
item 5's "Done" run.

Runs the full gate → dedup → leakage-free split → export chain twice
at 100x the adjudicated scale, same host, back to back:

  A. export_training_set          — the one-shot shared pair graph
  B. export_training_set_indexed  — 4 id-ordered drops, each a probe
     of the persisted LSH band index + a band append (the maintenance
     loop a 100 TB corpus actually runs), feeding the literally-shared
     _finalize_export tail.

Then proves the two builds CONTENT-IDENTICAL, not just count-equal:
for every split an order-independent fingerprint (sum + xor of
xxhash64 over the emitted JSONL lines, plus line count) and the
train_layout/manifest read back and compared row-for-row. Line-level
hashing is the right granularity: each JSONL line is one document
record, so equal multisets of lines == equal datasets regardless of
part-file boundaries or row order.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_capstone_indexed.py [SF_DIR]
Writes BENCH_SF10_CAPSTONE_INDEXED.json.
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
    SPLITS,
    export_training_set,
    export_training_set_indexed,
)
from osarchiver_spark.session import get_spark  # noqa: E402


def fingerprint(spark, path: str) -> dict[str, int]:
    """Order/partitioning-independent content fingerprint of a JSONL
    dir: line count + sum and xor of per-line xxhash64."""
    row = (
        spark.read.text(path)
        .select(F.xxhash64("value").alias("h"))
        .agg(
            F.count("*").alias("n"),
            # decimal(38,0) sum: 500k 64-bit hashes overflow a bigint
            # accumulator (ANSI mode throws); decimal is exact here
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
            F.expr("bit_xor(h)").alias("hxor"),
        )
        .first()
    )
    return {"n": int(row["n"]), "hsum": int(row["hsum"]), "hxor": int(row["hxor"])}


def table_rows(spark, path: str) -> list[tuple]:
    df = spark.read.parquet(path)
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    work = tempfile.mkdtemp(prefix="capstone_idx_")
    spark = get_spark("osarchiver_spark_sf10_capstone_indexed")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, object] = {"sf_dir": sf_dir, "n_batches": 4}

    out_a = os.path.join(work, "oneshot")
    t0 = time.perf_counter()
    export_training_set(spark, sf_dir, out_a)
    results["oneshot_wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"one-shot: {results['oneshot_wall_s']}s", flush=True)

    out_b = os.path.join(work, "indexed")
    idx = os.path.join(work, "band_index")
    t0 = time.perf_counter()
    export_training_set_indexed(spark, sf_dir, out_b, idx, n_batches=4)
    results["indexed_wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"indexed: {results['indexed_wall_s']}s", flush=True)

    identical = True
    fps: dict[str, dict] = {}
    for s in SPLITS:
        fa = fingerprint(spark, os.path.join(out_a, s))
        fb = fingerprint(spark, os.path.join(out_b, s))
        fps[s] = {"oneshot": fa, "indexed": fb, "match": fa == fb}
        identical &= fa == fb
        print(f"{s}: {fa} vs {fb} match={fa == fb}", flush=True)
    for t in ("train_layout", "manifest"):
        same = table_rows(spark, os.path.join(out_a, t)) == table_rows(
            spark, os.path.join(out_b, t)
        )
        fps[t] = {"match": same}
        identical &= same
        print(f"{t}: match={same}", flush=True)
    results["fingerprints"] = fps
    results["content_identical"] = identical

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SF10_CAPSTONE_INDEXED.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
