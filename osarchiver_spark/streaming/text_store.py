"""Streaming TEXT-corpus dedup maintenance: the live twin of
operators/export.py::export_training_set_indexed's per-drop loop, and
the text sibling of streaming/vector_store.py.

Each micro-batch of arriving documents:

    → intra-batch MinHash-LSH pairs       (the drop's own near-dups)
    → cross probe vs the STANDING band index
      (minhash_lsh_incremental_indexed: banded batch broadcast,
       pushed band_key IN predicate — the corpus text is touched only
       for the candidate rows the exact-Jaccard verify needs)
    → append the batch's bands to the index, its raw rows to the
      corpus landing store, and its edges to the accumulated pair
      graph

With ingest-ordered doc ids, the accumulated {intra} ∪ {cross} edge
set equals the one-shot ``minhash_lsh_pairs`` graph row-for-row —
the same by-construction identity the batch indexed export proves
(band-bucket sharing is symmetric and batching-independent; the
exact verify is the same rounded expression) — pinned in
tests/test_streaming_text_store.py. Downstream consumers (loser
anti-join, connected components, split keys) read the pair graph
exactly as the batch pipeline does.

Restart safety mirrors the vector loop: BEGIN/DONE epoch markers —
a replayed DONE epoch is a no-op, a BEGIN-without-DONE epoch (crash
inside the multi-directory append window) raises instead of silently
double-appending; the BEGIN manifest + ``repair_torn_epochs`` rolls
the partial appends back, and the durable checkpoint
(``<pairs>__checkpoint``) replays the same epoch over the same input
files, so repair-then-restart is fingerprint-identical to a
never-crashed run (pinned in tests/test_streaming_text_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osarchiver_spark.streaming.vector_store import (
    _begin_epoch,
    _epoch_guard,
    _mark_epoch,
    _path_exists,
    repair_torn_epochs,
)

DOCUMENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def make_text_maintenance_batch_fn(
    spark: SparkSession,
    index_dir: str,
    corpus_dir: str,
    pairs_dir: str,
    threshold: float,
    lsh_kw: dict,
):
    """The per-micro-batch step, factored out for direct testing.
    ``lsh_kw``: shingle_n/num_hashes/bands/hash_fn passed through to
    every sketch call (one frozen parameterization — changing it
    invalidates the standing index, exactly like retraining an IVF
    model)."""
    from osarchiver_spark.operators.dedup import (
        minhash_lsh_incremental_indexed,
        minhash_lsh_index,
        minhash_lsh_pairs,
    )

    marker_dir = f"{pairs_dir.rstrip('/')}__epochs"
    edge_cols = ["doc_a", "doc_b"]

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if _epoch_guard(spark, marker_dir, epoch_id):
            return  # replayed epoch: its appends already landed
        if batch_df.isEmpty():
            _mark_epoch(spark, marker_dir, epoch_id)
            return
        batch = batch_df.localCheckpoint()
        edges = minhash_lsh_pairs(
            batch, "doc_id", "text", threshold=threshold, **lsh_kw
        ).select(*edge_cols)
        if _path_exists(spark, index_dir):
            # declared layouts: re-inferring the GROWING index/corpus
            # dirs' footers every micro-batch is pure latency (r11
            # optimization round; minhash_lsh_index's fixed columns,
            # long doc ids per DOCUMENTS_RAW_SCHEMA)
            standing = spark.read.schema(
                "corpus_id bigint, band_idx int, band_key string"
            ).parquet(index_dir)
            corpus = spark.read.schema(DOCUMENTS_RAW_SCHEMA).parquet(corpus_dir)
            cross = minhash_lsh_incremental_indexed(
                standing, corpus, batch, "doc_id", "text",
                threshold=threshold, **lsh_kw,
            ).select(
                F.col("corpus_id").alias("doc_a"),
                F.col("new_id").alias("doc_b"),
            )
            edges = edges.unionByName(cross)
        # materialize the edges BEFORE appending this batch's bands
        # (the lazily-planned probe must never observe files appended
        # after it — the capstone's checkpoint rule)
        edges = edges.localCheckpoint()
        # BEGIN only now — everything above is read-only; the manifest
        # snapshot bounds the torn window to the three appends below
        _begin_epoch(
            spark, marker_dir, epoch_id, [index_dir, corpus_dir, pairs_dir]
        )
        first = not _path_exists(spark, index_dir)
        minhash_lsh_index(batch, "doc_id", "text", **lsh_kw).write.mode(
            "overwrite" if first else "append"
        ).parquet(index_dir)
        batch.write.mode("overwrite" if first else "append").parquet(corpus_dir)
        edges.write.mode(
            "overwrite" if not _path_exists(spark, pairs_dir) else "append"
        ).parquet(pairs_dir)
        _mark_epoch(spark, marker_dir, epoch_id)

    return process_batch


def run_streaming_text_maintenance(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    corpus_dir: str,
    pairs_dir: str,
    threshold: float | None = None,
    max_files_per_trigger: int | None = None,
    auto_repair: bool = False,
    **lsh_overrides,
) -> DataFrame:
    """Stream the documents fixture through the maintenance loop and
    return the accumulated near-dup pair graph (doc_a, doc_b). LSH
    parameters default to the registry's production set
    (queries/dedup.py constants, xxhash64 sketches). Checkpoints under
    ``<pairs>__checkpoint`` so epoch ids are durable across restarts
    (the index/corpus/pairs/marker/checkpoint dirs form one unit);
    ``auto_repair`` rolls back a torn epoch before starting."""
    from osarchiver_spark.queries.dedup import (
        BANDS,
        MINHASH_THRESHOLD,
        NUM_HASHES,
    )
    from osarchiver_spark.sources.parquet import ensure_session_defaults
    from osarchiver_spark.streaming.pipeline import fixture_table_watch

    lsh_kw = dict(
        shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS, hash_fn="xxhash64"
    )
    lsh_kw.update(lsh_overrides)
    if threshold is None:
        threshold = MINHASH_THRESHOLD

    ensure_session_defaults(spark)
    watch_dir, glob = fixture_table_watch(sf_dir, "documents")
    reader = spark.readStream.format("parquet").schema(DOCUMENTS_RAW_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(watch_dir)

    if auto_repair:
        repair_torn_epochs(
            spark,
            f"{pairs_dir.rstrip('/')}__epochs",
            [index_dir, corpus_dir, pairs_dir],
        )
    process_batch = make_text_maintenance_batch_fn(
        spark, index_dir, corpus_dir, pairs_dir, threshold, lsh_kw
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", f"{pairs_dir.rstrip('/')}__checkpoint")
        .foreachBatch(process_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # an edge-free corpus writes only _SUCCESS markers (0-row parquet
    # writes produce no part files), which read as "unable to infer
    # schema" — hand back a typed empty graph for THAT case only; a
    # corrupted footer / permission error must still surface
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(pairs_dir)
    except AnalysisException:
        return spark.createDataFrame([], "doc_a long, doc_b long")
