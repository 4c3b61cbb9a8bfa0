"""Byte-pair-encoding vocabulary induction (Sennrich et al., 2016 —
public algorithm) as a driver loop of DataFrame passes, plus the
apply path that segments a corpus with the learned merges.

The reference has no tokenizer-training analog (its value is archival
plumbing); this is a north-star LLM-pipeline operator. The existing
``bpe_merge_step`` query is the single pair-count step; this operator
runs the REAL iteration: count pairs → merge the argmax → recount —
so later merges combine previously-merged multi-char symbols.

The 100 TB shape:

- the corpus collapses to its VOCABULARY first (one map-combinable
  token-count agg); every training iteration then runs on |vocab|
  rows, never on the corpus again — for web-scale text |vocab| is
  millions of rows while the corpus is billions, so the loop costs a
  fixed small multiple of one vocabulary scan per merge.
- per step, exactly ONE row crosses to the driver (the argmax pair —
  the same model-sized-collect rule as k-means centroids).
- the merge rewrite is a row-local JVM fold (``F.aggregate`` over the
  symbol array — no shuffle, no Python): left-to-right greedy
  non-overlapping, the textbook BPE application order. A fold that
  checks "does the accumulated tail end with ``a``" is exactly greedy
  because a merged symbol ``a||b`` can never equal ``a``.
- the apply path (``bpe_segment``) never re-runs merges over
  documents: segmentation is a pure function of the word, so
  documents just equi-join the |vocab|-sized segmentation table
  (broadcast at realistic vocab sizes).

Determinism/oracle: the argmax pair tie-breaks (count desc, sym_a
asc, sym_b asc) and all counts are integers, so a SQL replay of the
same iterations (chained CTEs, one pair-count + one list_reduce fold
per step) is bit-identical — validated against an independent
pure-Python BPE trainer before registration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osarchiver_spark.functions.text import tokens

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType()),
        T.StructField("sym_a", T.StringType()),
        T.StructField("sym_b", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _char_syms(token: Column) -> Column:
    """Split a token into single-character symbols (code points —
    matches DuckDB substring semantics)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(token)), lambda i: token.substr(i, F.lit(1))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs; empty for
    single-symbol words (guarded — sequence(1, 0) would count DOWN)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"), F.element_at(syms, i + 1).alias("b")
        ),
    )
    empty = F.array().cast("array<struct<a:string,b:string>>")
    return F.when(F.size(syms) >= 2, pairs).otherwise(empty)


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left-to-right greedy non-overlapping merge of (a, b) -> a||b.
    F.get is 0-indexed and NULL-safe, so the empty-accumulator start
    falls through to append under ANSI mode."""
    merged = F.lit(a + b)
    zero = F.array().cast("array<string>")
    return F.aggregate(
        syms,
        zero,
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_vocab(docs: DataFrame, text_col: str = "text", lowercase: bool = True) -> DataFrame:
    """(token, freq, syms): the word-frequency table with initial
    character segmentation — the only corpus-sized pass BPE makes."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    tok = docs.select(F.explode(tokens(text)).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", _char_syms(F.col("token")))
    )


def _train_loop(
    docs: DataFrame, text_col: str, n_merges: int, lowercase: bool
) -> tuple[list[tuple[int, str, str, int]], DataFrame, DataFrame | None, bool]:
    """The shared merge loop. Returns (merges, vocab, parent, cached):

    - on a full run, ``vocab`` is the LAZY final generation (one
      un-materialized fold on top of ``parent``, the cached and
      already-materialized previous generation) — the caller decides
      whether to pay for materializing it (bpe_train with_vocab=True
      persists+counts it; bpe_segment_counts checkpoints only the
      2-column projection it joins on), then releases ``parent``;
    - on early exhaustion (vocabulary fully merged before n_merges),
      ``vocab`` is cached+materialized, ``parent`` is None, and
      ``cached`` is True — the caller must unpersist it when done.

    The final generation is deliberately NOT persisted inside the
    loop: doing so (pre-r5 shape) forced every caller to pay a full
    extra vocabulary materialization just to avoid leaking the pinned
    parent — the bpe_train/bpe_segment 1.4x regression in BENCH_r04."""
    v = bpe_vocab(docs, text_col, lowercase=lowercase).persist()
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    cached = True
    try:
        for step in range(1, n_merges + 1):
            top = (
                v.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            # this collect just materialized v's cache, so its parent
            # (one step behind) can go — no extra count() job per step
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break  # vocabulary fully merged — nothing adjacent left
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((step, a, b, n))
            folded = v.withColumn("syms", _merge_fold(F.col("syms"), a, b))
            if step < n_merges:
                prev, v = v, folded.persist()
            else:
                prev, v, cached = v, folded, False
    except Exception:
        if prev is not None:
            prev.unpersist()
        if cached:
            v.unpersist()
        raise
    return merges, v, prev, cached


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    lowercase: bool = True,
    with_vocab: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, vocab):
    merges = (step, sym_a, sym_b, n) — the model, n_merges rows;
    vocab  = (token, freq, syms) segmented with ALL learned merges —
    the apply-path lookup table.

    ``with_vocab=True``: vocab is returned persisted+materialized —
    the caller owns the cache entry and must ``unpersist()`` it.
    ``with_vocab=False``: the model is the only deliverable; vocab is
    returned as an UNCACHED lazy plan (materializing it would replay
    the fold chain) and nothing is left pinned — callers that only
    want ``merges`` skip a full vocabulary materialization."""
    spark = docs.sparkSession
    merges, v, parent, cached = _train_loop(docs, text_col, n_merges, lowercase)
    merges_df = spark.createDataFrame(merges, MERGE_SCHEMA)
    if not with_vocab:
        if parent is not None:
            parent.unpersist()
        if cached:
            v.unpersist()
        return merges_df, v
    if not cached:
        v = v.persist()
        v.count()  # materialize the final gen before dropping its parent
        if parent is not None:
            parent.unpersist()
    return merges_df, v


def bpe_segment_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 8,
    lowercase: bool = True,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, n_pieces): per-document BPE piece budget
    after ``n_merges`` merges — the sequence-length accounting a
    training pipeline provisions from. Documents never see the merge
    loop: they equi-join the segmented vocabulary."""
    if vocab is None:
        # only the (token, n_syms) projection is needed for the join,
        # so skip bpe_train's full-vocab materialization: checkpoint
        # the projection straight off the loop's lazy final fold (one
        # pass over the cached parent generation), then release every
        # loop cache before returning
        from osarchiver_spark.operators.cache import transient

        _, v, parent, cached = _train_loop(docs, text_col, n_merges, lowercase)
        seg = transient(v.select("token", F.size("syms").alias("n_syms")), eager=True)
        if parent is not None:
            parent.unpersist()
        if cached:
            v.unpersist()
    else:
        seg = vocab.select("token", F.size("syms").alias("n_syms"))
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    dtok = docs.select(F.col(id_col), F.explode(tokens(text)).alias("token"))
    return (
        dtok.join(seg, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_pieces"),
        )
    )
