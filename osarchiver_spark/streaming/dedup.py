"""Streaming deduplication — a custom stateful operator
(applyInPandasWithState) for the training-data pipeline: documents
whose fingerprint was seen in ANY earlier micro-batch are dropped;
the first occurrence (min doc_id within its arrival batch) is
emitted once.

This is the streaming twin of operators/dedup.py::exact_dedup: state
is one boolean per fingerprint group, partitioned by the groupBy —
at scale the state store shards with the shuffle, and a TTL (state
timeout) would bound it for unbounded streams; the fixture-driven
form keeps state forever (retention == run length).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from osarchiver_spark.functions.text import normalized_fingerprint

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("keep_id", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        return iter(())  # fingerprint already emitted in an earlier batch
    min_id = None
    for pdf in pdfs:
        batch_min = int(pdf["doc_id"].min())
        min_id = batch_min if min_id is None else min(min_id, batch_min)
    state.update((True,))
    if min_id is None:
        return iter(())
    return iter([pd.DataFrame({"fingerprint": [key[0]], "keep_id": [min_id]})])


def streaming_dedup_first_seen(stream: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """stream → (fingerprint, keep_id), one row per fingerprint ever
    seen, emitted on first arrival."""
    fp = stream.select(
        F.col(id_col).alias("doc_id"), normalized_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    return fp.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark: SparkSession,
    watch_dir: str,
    schema: T.StructType,
    path_glob: str | None = None,
) -> DataFrame:
    """Drive the stateful dedup over all files currently in watch_dir
    (optionally narrowed by a glob) and return the emitted rows as a
    batch DataFrame."""
    reader = spark.readStream.format("parquet").schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.load(watch_dir)
    from osarchiver_spark.streaming.pipeline import drain_stream_to_parquet

    out = streaming_dedup_first_seen(stream, "doc_id", "text")
    return drain_stream_to_parquet(out, "append", "sdedup")
