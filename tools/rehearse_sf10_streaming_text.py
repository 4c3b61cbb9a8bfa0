"""sf10 rehearsal of the STREAMING text-corpus maintenance loop
(streaming/text_store.py) — registered this round
(`streaming_text_maintenance`), so it gets the same cross-scale
treatment as its vector sibling: the Spark side alone, one decade
past the driver's adjudication scale, at the PRODUCTION hash family
(xxhash64) over the 500k-doc sf10 corpus.

Shape: the corpus lands as N_DROPS mtime-ordered files; the loop
consumes them as micro-batches, each computing intra-batch
MinHash-LSH pairs, probing the STANDING band index (pushed
band_key IN predicate — never a corpus re-sketch), and appending
bands/rows/edges. Recorded:

  - per-epoch wall (the live ingest cost per drop);
  - pair-graph identity with the one-shot ``minhash_lsh_pairs`` over
    the full corpus (row counts + order-independent xor fingerprint)
    — the band-bucket symmetry identity, live, at sf10.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/rehearse_sf10_streaming_text.py [SF_DIR]
Defaults: .scale/sf10. Writes BENCH_SF10_STREAMING_TEXT.json.
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

from osarchiver_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402
from osarchiver_spark.streaming.text_store import (  # noqa: E402
    run_streaming_text_maintenance,
)

N_DROPS = 5


def edge_fingerprint(spark, df) -> dict[str, int]:
    h = df.select(
        F.xxhash64(
            F.least("doc_a", "doc_b").cast("string"),
            F.greatest("doc_a", "doc_b").cast("string"),
        ).alias("h")
    )
    row = h.agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")).first()
    return {"rows": row["n"], "xor": int(row["x"] or 0)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_streaming_text")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()

    from osarchiver_spark.queries.dedup import (
        BANDS,
        MINHASH_THRESHOLD,
        NUM_HASHES,
    )

    docs = load_table(spark, sf_dir, "documents")
    stages: dict[str, float] = {}

    base = tempfile.mkdtemp(prefix="streaming_text_sf10_")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = -(-(int(hi) - int(lo) + 1) // N_DROPS)
    land = f"{base}/src/documents.parquet"
    os.makedirs(land)
    t = time.perf_counter()
    for i in range(N_DROPS):
        scratch = f"{base}/scratch{i}"
        docs.filter(
            (F.col("doc_id") >= int(lo) + i * step)
            & (F.col("doc_id") < int(lo) + (i + 1) * step)
        ).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        dst = f"{land}/drop{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stages["stage_drops"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    one_shot = minhash_lsh_pairs(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS,
        threshold=MINHASH_THRESHOLD, hash_fn="xxhash64",
    ).select("doc_a", "doc_b").localCheckpoint()
    fp_one = edge_fingerprint(spark, one_shot)
    stages["one_shot"] = round(time.perf_counter() - t, 3)

    idx = f"{base}/idx"
    corpus = f"{base}/corpus"
    pairs = f"{base}/pairs"
    # per-epoch wall via the DONE-marker clock: wrap the batch fn
    import osarchiver_spark.streaming.text_store as ts_mod

    epoch_walls: dict[str, float] = {}
    real_factory = ts_mod.make_text_maintenance_batch_fn

    def timed_factory(*a, **kw):
        inner = real_factory(*a, **kw)

        def fn(batch_df, epoch_id):
            t0 = time.perf_counter()
            inner(batch_df, epoch_id)
            epoch_walls[f"epoch{epoch_id}"] = round(time.perf_counter() - t0, 3)

        return fn

    ts_mod.make_text_maintenance_batch_fn = timed_factory
    try:
        t = time.perf_counter()
        graph = run_streaming_text_maintenance(
            spark, f"{base}/src", idx, corpus, pairs,
            max_files_per_trigger=1,
        )
        stages["streaming_total"] = round(time.perf_counter() - t, 3)
    finally:
        ts_mod.make_text_maintenance_batch_fn = real_factory

    fp_stream = edge_fingerprint(spark, graph)

    result = {
        "metric": "osarchiver_spark sf10 streaming text maintenance: "
        f"{N_DROPS}-drop live loop vs one-shot pair graph",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "sf": float(os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or "10"),
        "params": {
            "num_hashes": NUM_HASHES,
            "bands": BANDS,
            "threshold": MINHASH_THRESHOLD,
            "hash_fn": "xxhash64",
            "n_drops": N_DROPS,
        },
        "stages_sec": stages,
        "epoch_walls_sec": epoch_walls,
        "graph_identical": bool(fp_one == fp_stream),
        "fingerprints": {"one_shot": fp_one, "streaming": fp_stream},
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10_STREAMING_TEXT.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
