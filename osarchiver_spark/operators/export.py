"""End-to-end training-set export — the operational capstone that
WRITES the artifacts the analytic queries only report on.

``export_training_set`` composes the pipeline the registry proves
piecewise (every stage's semantics is oracle-checked through its
query twin) and lands the result as the thing a trainer actually
consumes: gzip JSONL shards per split plus a manifest.

    documents
      → quality + language gate          (queries/text.py::corpus_gate)
      → near-dup removal                 (MinHash-LSH losers anti-join)
      → leakage-free train/val/test     (split keyed on the cluster
                                         rep, so no near-dup pair
                                         straddles a split)
      → <out>/<split>/part-*.json.gz    (shard count = upstream
                                         partitioning)
      → manifest DataFrame               (split, n_docs, n_tokens)

Scale shape: one pass over the corpus for the gates (fused into the
scan), the LSH pair graph + closure for dedup/split keys (equi-joins
only), and one write per split from the same cached survivor set.
Determinism: every decision is a pure function of doc content/ids
(md5 splits, min-id cluster reps), so a re-run writes byte-identical
membership — the export is idempotent at the row level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPLITS = ("train", "val", "test")


N_PACK_SHARDS = 8
PACK_SEQ_LEN = 2048


def export_training_set(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    compression: str | None = "gzip",
    pack_train: bool = True,
) -> DataFrame:
    """Run the full corpus build and write one JSONL dataset per
    split under ``out_dir``. Returns the manifest (split, n_docs,
    n_tokens), also written to ``out_dir``/manifest (parquet).
    With ``pack_train`` (default) the TRAIN split additionally gets a
    packing layout at ``out_dir``/train_layout — each surviving doc's
    (shard, seq_id, offset, spans_boundary) position in a stream of
    PACK_SEQ_LEN-token training sequences (the sequence_pack
    assignment computed over the survivors, not the raw corpus), so a
    trainer can assemble fixed-length batches without re-planning."""
    from osarchiver_spark.functions.text import token_count
    from osarchiver_spark.operators.dedup import connected_components, minhash_lsh_pairs
    from osarchiver_spark.queries.dedup import (
        BANDS,
        MINHASH_THRESHOLD,
        NUM_HASHES,
    )
    from osarchiver_spark.queries.sampling import _TRAIN_UB, _VAL_UB
    from osarchiver_spark.queries.text import corpus_gate
    from osarchiver_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    # The pair graph feeds TWO consumers (the dedup anti-join's losers
    # and the split keys' connected components). Without pinning it,
    # each consumer re-runs the whole MinHash pipeline — the sf10
    # chained rehearsal measured the unshared form at 607 s vs 333 s
    # of per-stage work (BENCH_SF10_CAPSTONE.json / SCALE.md). persist
    # + count materializes it exactly once; xxhash64 is the production
    # sketch mode (~1.6x over md5). NOTE the hash-family caveat:
    # banding is probabilistic for threshold-ADJACENT pairs in any
    # hash family, so md5 and xxhash64 runs are not guaranteed the
    # same candidate set — the exact-Jaccard verify gives surviving
    # pairs exact precision, and both consumers (the loser set AND
    # the split keys) derive from this ONE graph, so the pipeline is
    # internally consistent either way. On the shipped fixtures the
    # two modes produce identical membership (pinned in
    # tests/test_similarity.py and observed byte-identical at sf10).
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS, threshold=MINHASH_THRESHOLD,
        hash_fn="xxhash64",
    ).persist()
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    comps = connected_components(pairs)

    survivors = corpus_gate(docs).join(losers, "doc_id", "left_anti")
    rep = F.coalesce(F.col("cluster_rep"), F.col("doc_id"))
    bucket = F.substring(F.md5(rep.cast("string")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_UB, "train").when(bucket < _VAL_UB, "val").otherwise("test")
    )
    tagged = (
        survivors.join(comps, "doc_id", "left")
        .select(
            "doc_id", "text", "lang", "source",
            token_count(F.col("text")).alias("n_tokens"),
            split.alias("split"),
        )
        .persist()
    )
    try:
        tagged.count()  # materialize while the pair graph is pinned
        pairs.unpersist()
        for s in SPLITS:
            writer = (
                tagged.filter(F.col("split") == s)
                .drop("split")
                .write.mode("overwrite")
            )
            if compression:
                writer = writer.option("compression", compression)
            writer.json(f"{out_dir.rstrip('/')}/{s}")
        if pack_train:
            from pyspark.sql import Window as W

            sized = tagged.filter(F.col("split") == "train").select(
                "doc_id",
                (F.col("doc_id") % N_PACK_SHARDS).alias("shard"),
                (F.col("n_tokens") + 1).alias("n_slots"),  # +1 separator
            )
            w = W.partitionBy("shard").orderBy("doc_id")
            start = (F.sum("n_slots").over(w) - F.col("n_slots")).alias("start_slot")
            layout = sized.select("doc_id", "shard", "n_slots", start).select(
                "doc_id",
                "shard",
                F.col("n_slots").cast("int").alias("n_slots"),
                F.floor(F.col("start_slot") / PACK_SEQ_LEN).cast("int").alias("seq_id"),
                (F.col("start_slot") % PACK_SEQ_LEN).cast("int").alias("offset"),
                (
                    F.floor((F.col("start_slot") + F.col("n_slots") - 1) / PACK_SEQ_LEN)
                    > F.floor(F.col("start_slot") / PACK_SEQ_LEN)
                ).alias("spans_boundary"),
            )
            layout.write.mode("overwrite").parquet(f"{out_dir.rstrip('/')}/train_layout")
        manifest = tagged.groupBy("split").agg(
            F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
        )
        manifest.write.mode("overwrite").parquet(f"{out_dir.rstrip('/')}/manifest")
        return spark.read.parquet(f"{out_dir.rstrip('/')}/manifest")
    finally:
        tagged.unpersist()
