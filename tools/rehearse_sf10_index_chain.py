"""Two-batch incremental-index rehearsal at sf10 (r06 verdict item 7):
the maintenance shape the one-shot capstone doesn't cover.

The persisted LSH band index's 100 TB pitch is that each crawl drop is
a PROBE of the index, not a corpus pass — which only holds if the
index is also MAINTAINED incrementally: the accepted batch's bands are
APPENDED to the persisted index (each append lands as its own
band_key-sorted files, so per-file parquet min/max stats keep row
groups skippable), and the NEXT batch probes the grown index. This
rehearsal runs that loop twice in a row:

  build(index over corpus)                       — the one-time cost
  batch1 → probe(index) → accept → APPEND bands  — drop #1
  batch2 → probe(grown index, corpus ∪ accept1)  — drop #2

and records per-stage wall, index growth on disk, and the candidate/
match counts, so the claim "per-drop cost is probe-shaped, not
corpus-shaped" is measured, not argued. The accept rule is the
standard crawl-dedup policy: a new doc is accepted iff it near-dups
nothing in the corpus (and, within the batch, iff it doesn't near-dup
an earlier accepted doc — approximated here corpus-only, which is the
operator's contract; intra-batch dedup is minhash_lsh_pairs on the
batch and not the shape under test).

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_index_chain.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_INDEX_CHAIN.json.
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

from osarchiver_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_incremental_indexed,
    minhash_lsh_index,
)
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402

NUM_HASHES, BANDS, THRESHOLD = 12, 4, 0.5


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_index_chain")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus0 = docs.filter(F.col("doc_id") % 10 < 8)
    batch1 = docs.filter(F.col("doc_id") % 10 == 8)
    batch2 = docs.filter(F.col("doc_id") % 10 == 9)

    idx_dir = os.path.join(
        tempfile.gettempdir(), f"lsh_chain_{spark.sparkContext.applicationId}"
    )
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    # one-time build over the standing corpus (prod hash: xxhash64)
    t = time.perf_counter()
    minhash_lsh_index(
        corpus0, "doc_id", "text",
        num_hashes=NUM_HASHES, bands=BANDS, hash_fn="xxhash64", num_files=32,
    ).write.mode("overwrite").parquet(idx_dir)
    stages["build_index"] = round(time.perf_counter() - t, 3)
    sizes = {"after_build": _du(idx_dir)}

    def probe(batch, corpus, label):
        # dup_ids is checkpointed FIRST so the probe pipeline executes
        # exactly once inside the timed window; the anti-join and the
        # counts read the materialized id set (a prior version let the
        # eager accepted-checkpoint AND dup_ids.count() each re-run
        # the whole uncached probe — the published timing measured ~2
        # probes, not one)
        t = time.perf_counter()
        matches = minhash_lsh_incremental_indexed(
            spark.read.parquet(idx_dir), corpus, batch, "doc_id", "text",
            num_hashes=NUM_HASHES, bands=BANDS, threshold=THRESHOLD,
            hash_fn="xxhash64",
        )
        dup_ids = matches.select("new_id").distinct().localCheckpoint()
        accepted = batch.join(
            dup_ids, batch["doc_id"] == dup_ids["new_id"], "left_anti"
        ).select("doc_id", "text").localCheckpoint()
        stages[f"{label}_probe"] = round(time.perf_counter() - t, 3)
        counts[f"{label}_batch"] = batch.count()
        counts[f"{label}_dups"] = dup_ids.count()
        counts[f"{label}_accepted"] = accepted.count()
        return accepted

    # drop #1: probe, accept, append accepted bands to the index
    accepted1 = probe(batch1, corpus0, "batch1")
    t = time.perf_counter()
    minhash_lsh_index(
        accepted1, "doc_id", "text",
        num_hashes=NUM_HASHES, bands=BANDS, hash_fn="xxhash64", num_files=4,
    ).write.mode("append").parquet(idx_dir)
    stages["batch1_append"] = round(time.perf_counter() - t, 3)
    sizes["after_batch1"] = _du(idx_dir)

    # drop #2 probes the GROWN index against the grown corpus
    corpus1 = corpus0.unionByName(accepted1)
    probe(batch2, corpus1, "batch2")

    result = {
        "metric": "osarchiver_spark sf10 two-batch incremental index chain",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "stages_sec": stages,
        "counts": counts,
        "index_bytes": sizes,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_INDEX_CHAIN.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
