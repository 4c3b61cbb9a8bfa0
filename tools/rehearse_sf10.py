"""Targeted 100x rehearsal: the dedup/ANN/linkage family plus the
archival flagship at sf10 (100x the driver's sf0.1 adjudication
scale, synthesized by tools/make_scale_fixture.py with K=100 — so
every document sits in a 100-wide near-duplicate cluster and every
embedding in a 100-wide near-neighbor cluster: the hot-bucket /
wide-block stress case, not just more bytes).

Production-shape variants run where they exist (the bench kNN
overrides, block-purged entity resolution) — this is the deployment
rehearsal, not the oracle-parity run.

Usage: python tools/rehearse_sf10.py [SF_DIR] ; writes BENCH_SF10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_OVERRIDES  # noqa: E402
from osarchiver_spark.queries import all_queries  # noqa: E402
from osarchiver_spark.queries.relational import entity_resolution_production  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402

SUBSET = [
    "retention_filter",
    "archive_idempotent",
    "dedup_exact",
    "dedup_minhash_xxhash64",
    "dedup_simhash",
    "dedup_simhash_multiprobe",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "dedup_embedding",
    "dedup_embedding_incremental",
    "semdedup",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_pq",
    "corpus_pipeline",
    "split_leakage_free",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()
    registry = all_queries()
    runs = [(n, BENCH_OVERRIDES.get(n) or registry[n]) for n in SUBSET]
    runs.append(("entity_resolution_production", entity_resolution_production))
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in runs:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"  {name:32s} {dt:8.2f} s", flush=True)
        spark.catalog.clearCache()
    line = json.dumps(
        {
            "metric": "osarchiver_spark sf10 rehearsal (dedup/ANN/linkage)",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": 10.0,
        }
    )
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_SF10.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
