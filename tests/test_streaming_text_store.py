"""Streaming text-corpus maintenance (streaming/text_store.py): the
micro-batched band-index probe/append accumulates exactly the
one-shot MinHash-LSH pair graph, and a replayed epoch appends
nothing twice."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from osarchiver_spark.operators.dedup import minhash_lsh_pairs
from osarchiver_spark.queries.dedup import BANDS, MINHASH_THRESHOLD, NUM_HASHES
from osarchiver_spark.sources.parquet import load_table
from osarchiver_spark.streaming.text_store import (
    make_text_maintenance_batch_fn,
    run_streaming_text_maintenance,
)

LSH_KW = dict(shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS, hash_fn="xxhash64")


def _multi_file_docs(spark, sf_small, tmp_path, n_files=3):
    """Id-ordered multi-file landing dir (the vector test's recipe)."""
    docs = load_table(spark, sf_small, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = -(-(int(hi) - int(lo) + 1) // n_files)
    src_sf = tmp_path / "src_sf"
    land = src_sf / "documents.parquet"
    os.makedirs(land)
    t0 = 1_700_000_000
    for i in range(n_files):
        scratch = str(tmp_path / f"dscratch{i}")
        docs.filter(
            (F.col("doc_id") >= int(lo) + i * step)
            & (F.col("doc_id") < int(lo) + (i + 1) * step)
        ).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        dst = str(land / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (t0 + i, t0 + i))
    return str(src_sf), docs


def test_streaming_pair_graph_equals_one_shot(spark, sf_small, tmp_path):
    src_sf, docs = _multi_file_docs(spark, sf_small, tmp_path)
    streamed = run_streaming_text_maintenance(
        spark, src_sf,
        str(tmp_path / "idx"), str(tmp_path / "corpus"), str(tmp_path / "pairs"),
        max_files_per_trigger=1,
    )
    got = {(r.doc_a, r.doc_b) for r in streamed.collect()}
    want = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=MINHASH_THRESHOLD, **LSH_KW
        ).collect()
    }
    assert got == want and len(want) > 0
    # three epochs really ran and completed
    done = [m for m in os.listdir(f"{tmp_path}/pairs__epochs") if m.endswith(".done")]
    assert len(done) == 3


def test_streaming_text_epoch_replay_is_idempotent(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    fn = make_text_maintenance_batch_fn(
        spark,
        str(tmp_path / "idx"), str(tmp_path / "corpus"), str(tmp_path / "pairs"),
        MINHASH_THRESHOLD, LSH_KW,
    )
    half = docs.filter(F.col("doc_id") % 2 == 0)
    fn(half, 0)
    pairs = lambda: sorted(
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    )
    after_first = pairs()
    fn(half, 0)  # replay
    assert pairs() == after_first
    fn(docs.filter(F.col("doc_id") % 2 == 1), 1)
    assert len(pairs()) >= len(after_first)


def test_streaming_edge_free_corpus_returns_typed_empty_graph(
    spark, sf_small, tmp_path
):
    """threshold above any possible Jaccard -> zero edges ever; the
    0-row parquet writes leave no readable schema, so the loop must
    hand back a typed empty graph instead of an inference error."""
    src_sf, _ = _multi_file_docs(spark, sf_small, tmp_path, n_files=2)
    out = run_streaming_text_maintenance(
        spark, src_sf,
        str(tmp_path / "i2"), str(tmp_path / "c2"), str(tmp_path / "p2"),
        threshold=1.01, max_files_per_trigger=1,
    )
    assert out.count() == 0
    assert set(out.columns) == {"doc_a", "doc_b"}
