"""Deduplication operators over a text column (north-star).

Four families, all Spark-built-ins only (whole-stage codegen, no
Python UDFs), each designed so candidate generation is an equi-join —
never an O(n²) cross join — which is what survives 100 TB:

- exact: hash-groupBy on a normalized fingerprint (one shuffle);
- MinHash+LSH: shingle → k-minhash signature → banded bucket keys →
  bucket equi-join for candidates → exact Jaccard verify on pairs;
- SimHash: 16-bit token-vote sketch, candidates = equal sketch;
- n-gram Jaccard: exact pairwise similarity on a bounded candidate
  set (for verification / small subsets).

Hashes are md5 (bit-identical in DuckDB) so every operator has an
exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osarchiver_spark.functions.text import (
    lsh_band_keys,
    minhash_signature,
    normalized_fingerprint,
    simhash16_from_hashed,
    token_hashes,
    word_shingles,
)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group docs by normalized-text fingerprint: (fingerprint,
    keep_id = min id, n_docs). One hash-aggregate shuffle; at scale
    this is the map-side-combinable groupBy Spark already optimizes."""
    return (
        df.select(F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated table: keep the min-id row per fingerprint.
    Window-free formulation (join on the group min) so the plan is a
    broadcastable semi-join at scale rather than a global sort."""
    keeps = exact_dedup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keeps, on=id_col, how="left_semi")


def _with_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # Shingling + hashing is CPU-bound: spread it across all cores
    # even when the source is a single small parquet split. (At real
    # scale the scan itself provides the splits and this repartition
    # is a cheap narrow-ish shuffle of raw text.)
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.col(id_col).alias("doc_id"), word_shingles(F.col(text_col), n).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )


def _pair_jaccard(pairs: DataFrame, shingled: DataFrame) -> DataFrame:
    """Attach exact Jaccard to (doc_a, doc_b) candidate pairs."""
    a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    with_sets = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return with_sets.select(
        "doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline: shingle → signature (k md5-permutation minima) → band
    keys → explode(band_idx, key) → self equi-join on the bucket →
    distinct candidate pairs → exact-Jaccard verify >= threshold.

    Hash-cost note: md5 is used so the DuckDB oracle can reproduce
    signatures bit-for-bit; a production deployment swaps ``perm`` in
    functions/text.py::minhash_signature to ``F.xxhash64(F.lit(i),
    s)`` (~5× cheaper, same operator shape, no oracle parity).

    The self-join is on (band_idx, band_key): at 100 TB the bucket
    key is high-cardinality, so the shuffle partitions evenly; AQE
    skew-join splits any hot bucket (e.g. a boilerplate shingle set).
    """
    rows = num_hashes // bands
    # shingled feeds three consumers (signature + both sides of the
    # verify join): cache the shingle arrays instead of recomputing
    # the tokenize+hash pipeline per consumer.
    shingled = _with_shingles(df, id_col, text_col, shingle_n).cache()
    sig = shingled.select(
        "doc_id", "shingles", minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
    banded = sig.select(
        "doc_id", F.posexplode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band_idx", "band_key")
    )
    left = banded.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    candidates = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    scored = _pair_jaccard(candidates, shingled)
    return scored.filter(F.col("jaccard") >= threshold)


def simhash_candidates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash near-dup candidates: pairs with identical 16-bit
    sketch. Candidates come from a groupable equi-join on the sketch
    value — the classic 'hamming distance 0 block' of a
    multi-probe scheme (rotations would add distance 1-2 probes)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    # token_hashes materialized below a repartition: the barrier both
    # spreads the md5 work across cores and stops projection collapse
    # from re-inlining the hashing into each of the 16 bit votes.
    hashed = df.select(
        F.col(id_col).alias("doc_id"), token_hashes(F.col(text_col)).alias("toks_h")
    ).repartition(par)
    sk = hashed.select("doc_id", simhash16_from_hashed(F.col("toks_h")).alias("simhash"))
    a = sk.select(F.col("doc_id").alias("doc_a"), "simhash")
    b = sk.select(F.col("doc_id").alias("doc_b"), "simhash")
    return (
        a.join(b, "simhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("simhash", "doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard over a (bounded) input set.

    The cross pair space is generated by a shingle-share equi-join
    (docs with zero shared shingles can't clear any threshold > 0),
    so even the 'exact' variant avoids a cross join.
    """
    shingled = _with_shingles(df, id_col, text_col, shingle_n).cache()
    ex = shingled.select("doc_id", F.explode("shingles").alias("s"))
    pairs = (
        ex.alias("x")
        .join(ex.alias("y"), "s")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return _pair_jaccard(pairs, shingled).filter(F.col("jaccard") >= threshold)


def embedding_neardup_pairs(df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force within a bounded
    set; the LSH-bucketed scale path is operators/similarity.py).
    Threshold compares the ROUNDED cosine so engine last-ulp noise
    can't flip membership."""
    from osarchiver_spark.functions.vectors import as_double, cosine

    base = df.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v"))
    # one side spread across cores (a small parquet file is a single
    # split — a serial cross join otherwise), the other broadcast
    par = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(par).select(F.col("vid").alias("vec_a"), F.col("v").alias("va"))
    b = F.broadcast(base.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb")))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
