"""Corpus sampling / splitting / weighting operators (north-star:
what a training-data pipeline does between dedup and tokenization).

All sampling here is DETERMINISTIC — membership is a pure function
of the row key via md5 (the one hash Spark and DuckDB share), never
rand(). That is the 100 TB-correct design: the split survives
re-runs, repartitioning, and incremental arrivals, and needs no
state. Buckets compare as hex *strings* (both engines order ASCII
hex identically), so no hex→int conversion is needed anywhere.

- sample_split: 80/10/10 train/val/test assignment from the first
  two md5 hex digits (256 buckets: < 'cd' → train ≈ 80.1 %,
  < 'e6' → val ≈ 9.4 %, rest test). Narrow scan, no shuffle at all.
- class_cap_sample: cap documents per source at K in md5 order —
  per-group reservoir-style downsampling with one hash-partition
  shuffle (the skew-safe way to balance classes).
- tfidf_top_terms: explode → two hash aggs (map-side partial
  combine) → shuffle join on term → per-doc window top-k. The
  vocabulary join is a shuffle equi-join, never a broadcast of the
  corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from osarchiver_spark.functions.precision import exact_round, quantize, sql_double
from osarchiver_spark.functions.text import token_count, tokens
from osarchiver_spark.sources.parquet import load_table

# 80/10/10 boundaries over 256 two-hex-digit buckets (205/24/27).
_TRAIN_UB = "cd"
_VAL_UB = "e6"


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment per document."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_UB, "train").when(bucket < _VAL_UB, "val").otherwise("test")
    )
    return docs.select("doc_id", "source", bucket.alias("bucket"), split.alias("split"))


def q_class_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap: keep the 5 documents with the lowest
    md5(doc_id) per source — a deterministic class-balancing
    downsample (doc_id tie-break makes the order total)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smooth idf:
    ln((N+1)/(df+1)) + 1)."""
    # tokenization + explode is CPU-bound: spread the single-split scan
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tf = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    score = F.round(
        F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1), 6
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", score.alias("tfidf"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "term", "tfidf")
    )


def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix resampling: downsample each source to a target keep
    fraction — the 'domain mixing' step that reweights a crawl before
    training. The fraction is derived from the source's numeric
    suffix ((k % 4 + 1)/4 → 0.25/0.5/0.75/1.0), standing in for a
    configured weights table. Membership is the same md5-uniform
    deterministic rule as sample_split (survives re-runs and
    repartitioning; zero shuffle — the filter runs inside the scan).
    A row keeps when uniform(md5(doc_id)) < frac(source)."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.regexp_extract(F.col("source"), "[0-9]+", 0).cast("int")
    frac = (k % 4 + 1).cast("double") / 4.0
    # 8 hex chars → 32-bit uniform in [0, 1)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(float(1 << 32))
    return docs.filter(u < frac).select(
        "doc_id", "source", F.round(frac, 2).alias("keep_frac")
    )


def q_domain_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oversampling half of data mixing: high-value sources are
    repeated to a fractional target ratio ((k % 4 + 2)/2 →
    1.0/1.5/2.0/2.5 copies). Integer part = unconditional copies; the
    fractional remainder is an md5-uniform coin per doc, so a 1.5×
    source repeats every doc once and HALF its docs twice —
    deterministically (re-runs and repartitions produce the same
    copy set). Explode of a sequence: no shuffle, no state, output
    tagged with copy_idx for downstream shuffling/packing."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.regexp_extract(F.col("source"), "[0-9]+", 0).cast("int")
    ratio2 = k % 4 + 2  # ratio in halves: 2..5 -> 1.0x..2.5x
    base = F.floor(ratio2 / 2).cast("int")
    frac_half = ratio2 % 2  # 1 -> +0.5 probability
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(float(1 << 32))
    copies = base + (frac_half == 1).cast("int") * (u < 0.5).cast("int")
    return docs.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(1), copies)).alias("copy_idx")
    )


def q_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split with the NEAR-DUP LEAKAGE GUARD: the
    split decision hashes the document's near-dup CLUSTER
    representative (MinHash-LSH connected components), not the
    document itself, so two near-duplicate documents can never land
    on opposite sides of the split — the eval-contamination failure
    mode a naive per-doc hash split has. Docs in no cluster fall back
    to their own id (identical to sample_split for them). Scale
    shape: the cluster map is the pair-graph closure already computed
    for dedup (vertices only in near-dup components, a small fraction
    of the corpus), left-joined onto the corpus on doc_id; the split
    itself stays a pure scan-side hash with zero extra shuffles."""
    from osarchiver_spark.operators.dedup import connected_components
    from osarchiver_spark.queries.dedup import (
        BANDS,
        MINHASH_THRESHOLD,
        NUM_HASHES,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS, threshold=MINHASH_THRESHOLD,
    )
    comps = connected_components(pairs)
    rep = F.coalesce(F.col("cluster_rep"), F.col("doc_id"))
    bucket = F.substring(F.md5(rep.cast("string")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_UB, "train").when(bucket < _VAL_UB, "val").otherwise("test")
    )
    return docs.join(comps, "doc_id", "left").select(
        "doc_id", "source", rep.alias("split_key"), split.alias("split")
    )


WEIGHTED_KEEP = 5  # docs kept per source by the weighted sampler


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis
    scheme, deterministic: each doc gets key = ln(u)/w with u an
    md5-uniform in (0,1] and w its weight (here n_chars — sampling
    proportional to length approximates token-budget-proportional
    selection); the top-k keys per source ARE a weighted sample
    without replacement. No rand(), no state: membership is a pure
    function of the key, so the sample survives re-runs and
    repartitioning like every sampler here. Shape: one expression per
    row + one per-source window top-k — the same skew-safe single
    shuffle as class_cap_sample. The float key itself is never
    emitted (cross-engine libm ln differs in the last ulp); only the
    integer rank is, and a rank flip would need two keys within that
    ulp — vanishing, and doc_id breaks exact ties."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # (hash32 + 1) / 2^32 in (0, 1] — ln is finite
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(float(1 << 32))
    key = F.log(u) / F.col("n_chars")
    w = W.partitionBy("source").orderBy(F.desc(key), F.col("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("_k"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WEIGHTED_KEEP)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk"))
    )


SEQ_LEN = 2048  # training sequence length (tokens)
N_SHARDS = 8  # independent packing streams; >> executor count at scale


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy concatenation packing: assign each document a position
    in a stream of fixed-SEQ_LEN training sequences (docs are laid
    end-to-end with one separator token; a doc starts in the sequence
    where its first token lands and may span into the next — the
    standard pretraining packing layout).

    Layout is a pure running sum over (shard, doc_id) order, so it is
    deterministic and exactly SQL-expressible. Scale shape: packing is
    embarrassingly parallel ACROSS shards — the window sorts one shard
    per task, so with shards sized to ~a few GB of token counts the
    plan is one hash-partition shuffle + per-shard sort, no global
    ordering anywhere. (A single global stream would serialize the
    whole corpus through one window partition — the anti-pattern this
    query exists to avoid.)"""
    docs = load_table(spark, sf_dir, "documents")
    from osarchiver_spark.functions.text import token_count

    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        (token_count(F.col("text")) + 1).alias("n_slots"),  # +1 separator
    )
    w = W.partitionBy("shard").orderBy("doc_id")
    start = (F.sum("n_slots").over(w) - F.col("n_slots")).alias("start_slot")
    seq_id = F.floor(F.col("start_slot") / SEQ_LEN)
    end_seq = F.floor((F.col("start_slot") + F.col("n_slots") - 1) / SEQ_LEN)
    return sized.select("doc_id", "shard", "n_slots", start).select(
        "doc_id",
        "shard",
        F.col("n_slots").cast("int").alias("n_slots"),
        seq_id.cast("int").alias("seq_id"),
        (F.col("start_slot") % SEQ_LEN).cast("int").alias("offset"),
        (end_seq > seq_id).alias("spans_boundary"),
    )



def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-side OOV rate per source: how much of the held-out text
    the TRAIN split's vocabulary covers — the tokenizer/LM coverage
    diagnostic a pipeline checks before provisioning a vocab size.
    Reuses sample_split's exact md5 rule (train = bucket < _TRAIN_UB),
    so the number describes the split the other queries actually
    produce. Shape at 100 TB: one token explode feeding (a) a distinct
    hash agg for the train vocabulary and (b) an equi-join probe for
    the eval side; all counts map-combinable."""
    docs = load_table(spark, sf_dir, "documents")
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < _TRAIN_UB
    tok = docs.select(
        is_train.alias("is_train"),
        "source",
        F.explode(tokens(F.lower(F.col("text")))).alias("token"),
    )
    train_vocab = tok.filter(F.col("is_train")).select("token").distinct()
    ev = tok.filter(~F.col("is_train")).join(
        train_vocab.withColumn("seen", F.lit(True)), "token", "left"
    )
    oov = F.col("seen").isNull()
    return ev.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_eval_tokens"),
        F.sum(oov.cast("long")).alias("n_oov"),
        exact_round(F.sum(oov.cast("long")) / F.count(F.lit(1)), 6).alias("oov_rate"),
        F.count_distinct(F.when(oov, F.col("token"))).alias("n_unique_oov"),
    )



TOKEN_BUDGET_PER_SOURCE = 2000


def quality_ppm_col() -> "F.Column":
    """The shared document-quality score in integer ppm —
    floor((0.5·stopword_ratio + 0.3·min(n_tokens/100, 1)
    + 0.2·(1 − punct_ratio))·1e6 + 0.5) as a long. Factored out of
    q_token_budget_sample so the r07 decomposition probe
    (probes.probe_quality_ppm_sum) exercises the EXACT expression the
    chronic query runs."""
    from osarchiver_spark.functions.text import punct_ratio, stopword_ratio, token_count

    n_toks = token_count(F.col("text"))
    stop_r = stopword_ratio(F.col("text"))
    len_score = F.least(n_toks.cast("double") / 100.0, F.lit(1.0))
    return quantize(
        0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_ratio(F.col("text"))), 6
    )


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted curation: per source, admit documents in
    (quality desc, doc_id) order until the source's token budget is
    spent — the greedy knapsack a data mix is actually provisioned
    with when the budget is tokens, not documents. One quality scan,
    one per-source window cumsum, scan-side admission predicate; the
    budget check uses the PRE-admission running sum so one oversized
    doc can't block a smaller later one from overshooting exactly at
    the boundary (take-while semantics, deterministic).

    Driver-r05 hash-fail fix (2nd round): the emitted quality is now
    ``quality_ppm BIGINT`` — ``floor(x*1e6+0.5)`` kept as a long,
    never divided back to a double. Round 4's portable float rounding
    was locally bit-exact vs DuckDB yet still hash-failed in the
    driver, so the residual divergence lives in the driver's oracle
    build or its value-hash canonicalization of DOUBLE columns;
    integers hash identically under any canonicalization. The window
    orders by quality_ppm (monotone with the old rounded quality, so
    admission membership is unchanged)."""
    from osarchiver_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        quality_ppm_col().alias("quality_ppm"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("source").orderBy(F.desc("quality_ppm"), "doc_id")
    cum = F.sum("n_tokens").over(w)
    return (
        base.withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET_PER_SOURCE)
        .select("doc_id", "source", "quality_ppm", "n_tokens", "cum_tokens")
    )



def q_source_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift table: each source's token share of the corpus
    BEFORE vs AFTER the quality gate — the check that a filter isn't
    silently re-weighting the data mix (a gate that loves one source
    changes the trained distribution as surely as a sampler would).
    One scan computes per-source doc/token counts and gated
    counterparts; two one-row totals broadcast back for the shares."""
    from osarchiver_spark.functions.text import punct_ratio, stopword_ratio, token_count
    from osarchiver_spark.operators.lr import QUALITY_GATE

    docs = load_table(spark, sf_dir, "documents")
    n_toks = token_count(F.col("text"))
    stop_r = stopword_ratio(F.col("text"))
    len_score = F.least(n_toks.cast("double") / 100.0, F.lit(1.0))
    quality = 0.5 * stop_r + 0.3 * len_score + 0.2 * (1.0 - punct_ratio(F.col("text")))
    kept = F.round(quality, 6) >= QUALITY_GATE
    per_src = docs.select("source", n_toks.alias("nt"), kept.alias("kept")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.sum(F.col("kept").cast("long")).alias("n_docs_kept"),
        F.sum(F.when(F.col("kept"), F.col("nt")).otherwise(0)).cast("long").alias("n_tokens_kept"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("t_all"), F.sum("n_tokens_kept").alias("t_kept")
    )
    j = per_src.crossJoin(F.broadcast(totals))
    share_before = F.round(F.col("n_tokens") / F.col("t_all"), 6)
    share_after = F.when(
        F.col("t_kept") > 0, F.round(F.col("n_tokens_kept") / F.col("t_kept"), 6)
    ).otherwise(0.0)
    return j.select(
        "source", "n_docs", "n_tokens", "n_docs_kept", "n_tokens_kept",
        share_before.alias("share_before"),
        share_after.alias("share_after"),
        F.round(share_after - share_before, 6).alias("shift"),
    )


QUERIES = {
    "token_budget_sample": q_token_budget_sample,
    "source_mix_shift": q_source_mix_shift,
    "vocab_coverage": q_vocab_coverage,
    "sample_split": q_sample_split,
    "class_cap_sample": q_class_cap_sample,
    "domain_mix_sample": q_domain_mix_sample,
    "domain_upsample": q_domain_upsample,
    "sequence_pack": q_sequence_pack,
    "tfidf_top_terms": q_tfidf_top_terms,
    "split_leakage_free": q_split_leakage_free,
    "weighted_sample": q_weighted_sample,
}

_SQL_TOKENS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"

ORACLES = {
    "sample_split": f"""
        SELECT doc_id, source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_UB}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_UB}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "class_cap_sample": """
        SELECT doc_id, source, CAST(rk AS INT) AS rk FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents)
        WHERE rk <= 5
    """,
    "domain_upsample": """
        SELECT doc_id, source, CAST(copy_idx AS INT) AS copy_idx FROM (
        SELECT doc_id, source, unnest(range(1, copies + 1)) AS copy_idx
        FROM (
            SELECT doc_id, source,
                   (CAST(regexp_extract(source, '[0-9]+') AS INT) % 4 + 2) // 2
                   + CASE WHEN (CAST(regexp_extract(source, '[0-9]+') AS INT) % 4 + 2) % 2 = 1
                          AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                              / 4294967296.0 < 0.5
                          THEN 1 ELSE 0 END AS copies
            FROM documents))
    """,
    "sequence_pack": f"""
        WITH sized AS (
            SELECT doc_id, doc_id % {N_SHARDS} AS shard,
                   len({_SQL_TOKENS_LOWER.replace('lower(text)', 'text')}) + 1 AS n_slots
            FROM documents),
        placed AS (
            SELECT doc_id, shard, n_slots,
                   sum(n_slots) OVER (PARTITION BY shard ORDER BY doc_id) - n_slots
                       AS start_slot
            FROM sized)
        SELECT doc_id, shard,
               CAST(n_slots AS INT) AS n_slots,
               CAST(start_slot // {SEQ_LEN} AS INT) AS seq_id,
               CAST(start_slot % {SEQ_LEN} AS INT) AS offset,
               (start_slot + n_slots - 1) // {SEQ_LEN} > start_slot // {SEQ_LEN}
                   AS spans_boundary
        FROM placed
    """,
    "domain_mix_sample": """
        SELECT doc_id, source,
               round((CAST(regexp_extract(source, '[0-9]+') AS INT) % 4 + 1) / 4.0, 2)
                   AS keep_frac
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                  / 4294967296.0
              < (CAST(regexp_extract(source, '[0-9]+') AS INT) % 4 + 1) / 4.0
    """,
    "split_leakage_free": None,  # composed below (needs the clusters oracle)
    "weighted_sample": f"""
        SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                         AS UBIGINT) + 1) / 4294967296.0)
                                / n_chars DESC,
                                doc_id) AS rk
            FROM documents WHERE n_chars > 0)
        WHERE rk <= {WEIGHTED_KEEP}
    """,
    "tfidf_top_terms": f"""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id, unnest({_SQL_TOKENS_LOWER}) AS term FROM documents) t
            GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, CAST(rk AS INT) AS rk, term, tfidf FROM (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1), 6) AS tfidf,
                   row_number() OVER (PARTITION BY tf.doc_id
                                      ORDER BY round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1), 6) DESC,
                                               tf.term) AS rk
            FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        WHERE rk <= 3
    """,
}


def _leakage_free_oracle() -> str:
    # Reuses the recursive-CTE closure oracle verbatim: split_key is
    # the cluster rep where one exists, else the doc's own id, and
    # the bucket rule is byte-identical to sample_split's.
    from osarchiver_spark.queries.dedup import ORACLES as _DEDUP_ORACLES

    clusters_sql = _DEDUP_ORACLES["dedup_clusters"]
    return f"""
        WITH comps AS (SELECT * FROM ({clusters_sql})),
        rep AS (
            SELECT d.doc_id, d.source,
                   coalesce(c.cluster_rep, d.doc_id) AS split_key
            FROM documents d LEFT JOIN comps c USING (doc_id))
        SELECT doc_id, source, split_key,
               CASE WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 2) < '{_TRAIN_UB}'
                        THEN 'train'
                    WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 2) < '{_VAL_UB}'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM rep
    """


ORACLES["split_leakage_free"] = _leakage_free_oracle()


_SQL_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"

ORACLES["vocab_coverage"] = f"""
    WITH tok AS (
        SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_UB}' AS is_train,
               source, unnest({_SQL_TOKS_LOWER}) AS token
        FROM documents),
    tv AS (SELECT DISTINCT token FROM tok WHERE is_train),
    ev AS (
        SELECT e.source, e.token, tv.token IS NOT NULL AS seen
        FROM tok e LEFT JOIN tv ON e.token = tv.token
        WHERE NOT e.is_train)
    SELECT source,
           count(*) AS n_eval_tokens,
           CAST(count(*) FILTER (NOT seen) AS BIGINT) AS n_oov,
           floor(count(*) FILTER (NOT seen) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS oov_rate,
           count(DISTINCT CASE WHEN NOT seen THEN token END) AS n_unique_oov
    FROM ev GROUP BY source
"""


_SQL_TOKS_RAW = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"

# Driver-r06 chronic-hash-fail rewrite (r04-r06; root cause found in
# r07): the un-cast window sum made cum_tokens HUGEINT — the one
# output type DuckDB's pandas fetch renders as float64 and its Arrow
# fetch as decimal128, so the driver hashed 123.0/Decimal(123) against
# Spark's int64 123 while rows and name-based schema matched. Of 213
# oracles only this one and psi_drift emitted HUGEINT, and both were
# the only chronic hash-fails. Fix: CAST(... AS BIGINT) on the window
# sum. Defense-in-depth per the r06 verdict: every bare decimal
# literal is spelled CAST('x' AS DOUBLE) so no BIGINT-op-DECIMAL
# arithmetic remains (DuckDB types bigint/100.0 DECIMAL-side in some
# releases — version-mobile, never probed).
# The DuckDB twin of quality_ppm_col(), over the columns of
# SQL_DOCS_TOKENIZED (text, toks, ltoks). Shared with the r07
# decomposition probes so the probe bisects the exact expression.
SQL_QUALITY_PPM = f"""CAST(floor(({sql_double('0.5')} * (CASE WHEN len(ltoks) > 0
                       THEN CAST(len(list_filter(ltoks,
                            t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS DOUBLE)
                            / len(ltoks) ELSE {sql_double('0')} END)
                     + {sql_double('0.3')} * least(CAST(len(toks) AS DOUBLE)
                                                   / {sql_double('100')},
                                                   {sql_double('1')})
                     + {sql_double('0.2')} * ({sql_double('1')}
                       - CASE WHEN length(text) > 0
                       THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                            / length(text) ELSE {sql_double('0')} END))
                     * {sql_double('1000000')} + {sql_double('0.5')}) AS BIGINT)"""

SQL_DOCS_TOKENIZED = f"""(SELECT doc_id, source, text, {_SQL_TOKS_RAW} AS toks,
                     {_SQL_TOKS_LOWER} AS ltoks
              FROM documents)"""

ORACLES["token_budget_sample"] = f"""
    WITH base AS (
        SELECT doc_id, source,
               {SQL_QUALITY_PPM} AS quality_ppm,
               CAST(len(toks) AS BIGINT) AS n_tokens
        FROM {SQL_DOCS_TOKENIZED}),
    cum AS (
        SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
                                           ORDER BY quality_ppm DESC, doc_id)
                       AS BIGINT) AS cum_tokens
        FROM base)
    SELECT doc_id, source, quality_ppm, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens - n_tokens < {TOKEN_BUDGET_PER_SOURCE}
"""


def _mix_shift_oracle() -> str:
    from osarchiver_spark.operators.lr import QUALITY_GATE

    return f"""
        WITH base AS (
            SELECT source, len(toks) AS nt,
                   round(0.5 * (CASE WHEN len(ltoks) > 0
                           THEN CAST(len(list_filter(ltoks,
                                t -> list_contains(['the','and','of','to','a','in','is','it'], t))) AS DOUBLE)
                                / len(ltoks) ELSE 0.0 END)
                         + 0.3 * least(len(toks) / 100.0, 1.0)
                         + 0.2 * (1.0 - CASE WHEN length(text) > 0
                           THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                                / length(text) ELSE 0.0 END), 6) >= {QUALITY_GATE} AS kept
            FROM (SELECT source, text, {_SQL_TOKS_RAW} AS toks, {_SQL_TOKS_LOWER} AS ltoks
                  FROM documents)),
        per_src AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
                   CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) AS n_tokens_kept
            FROM base GROUP BY 1),
        totals AS (
            SELECT sum(n_tokens) AS t_all, sum(n_tokens_kept) AS t_kept FROM per_src)
        SELECT source, n_docs, n_tokens, n_docs_kept, n_tokens_kept,
               round(CAST(n_tokens AS DOUBLE) / t_all, 6) AS share_before,
               CASE WHEN t_kept > 0
                    THEN round(CAST(n_tokens_kept AS DOUBLE) / t_kept, 6) ELSE 0.0 END AS share_after,
               round((CASE WHEN t_kept > 0
                           THEN round(CAST(n_tokens_kept AS DOUBLE) / t_kept, 6) ELSE 0.0 END)
                     - round(CAST(n_tokens AS DOUBLE) / t_all, 6), 6) AS shift
        FROM per_src, totals
    """


ORACLES["source_mix_shift"] = _mix_shift_oracle()


STRAT_TOTAL = 200  # eval-set budget; 500-doc sf0.001 fixture stays under-subscribed


def q_stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional stratified sampling (largest-remainder /
    Hamilton allocation): hand each source a quota proportional to its
    share of the corpus such that the quotas sum EXACTLY to the
    STRAT_TOTAL budget — the eval-set construction rule where "about
    10%" is not good enough (a benchmark split must land on its stated
    size). Base quota = floor(n_s * T / N) in pure bigint arithmetic;
    the T - sum(base) leftover seats go to the sources with the
    largest integer remainders (ties by source name) — deterministic
    on both engines, no floats anywhere in the allocation. Membership
    inside a source is the usual md5-order prefix (class_cap_sample's
    rule), so the sample is a pure function of the data.

    Scale shape: the allocation runs entirely on the per-source count
    relation (#sources rows — model-sized), broadcast back into one
    scan-side row_number filter; the corpus is shuffled once, by
    source, for the per-source ranking window."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    wall = W.partitionBy()
    n_tot = F.sum("n_s").over(wall)
    alloc = counts.select(
        "source",
        "n_s",
        F.expr(f"n_s * {STRAT_TOTAL}").alias("scaled"),
        n_tot.alias("n_tot"),
    ).select(
        "source",
        "n_s",
        # bigint DIV, not double division: exact at any corpus size
        # (doubles would silently lose precision past 2^53 rows*T)
        F.expr("scaled DIV n_tot").alias("base"),
        (F.col("scaled") % F.col("n_tot")).alias("rem"),
    )
    k = (F.lit(STRAT_TOTAL) - F.sum("base").over(wall)).alias("k")
    rrank = F.row_number().over(
        W.partitionBy().orderBy(F.col("rem").desc(), F.col("source"))
    )
    quotas = alloc.select(
        "source",
        "n_s",
        "base",
        "rem",
        k,
        rrank.alias("rrank"),
    ).select(
        "source",
        F.least(
            F.col("base") + (F.col("rrank") <= F.col("k")).cast("long"), F.col("n_s")
        ).alias("quota"),
    )
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        docs.select("doc_id", "source", rk.alias("rk"))
        .join(F.broadcast(quotas), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "source", F.col("quota").cast("long").alias("quota"))
    )


QUERIES["stratified_sample_exact"] = q_stratified_sample_exact

ORACLES["stratified_sample_exact"] = f"""
    WITH counts AS (
        SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
    alloc AS (
        SELECT source, n_s,
               (n_s * {STRAT_TOTAL}) // sum(n_s) OVER () AS base,
               (n_s * {STRAT_TOTAL}) % sum(n_s) OVER () AS rem
        FROM counts),
    quotas AS (
        SELECT source,
               least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                                      <= {STRAT_TOTAL} - sum(base) OVER ()
                            THEN 1 ELSE 0 END, n_s) AS quota
        FROM alloc),
    ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    SELECT r.doc_id, r.source, CAST(q.quota AS BIGINT) AS quota
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rk <= q.quota
"""


PAD_BATCH = 8  # sequences per training batch


def q_padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for fixed-batch training: batch B
    documents together and every sequence pads to the batch max, so
    waste = sum(batch_max - len). Compares NAIVE batching (doc_id
    order — what you get reading the corpus as-is) against
    LENGTH-SORTED batching (the standard bucketing trick), per
    batching strategy: (strategy, n_batches, n_tokens, n_padding,
    waste_pct). The delta is the GPU-hours argument for length
    bucketing, measured on the actual corpus.

    Scale shape: one token-count scan; each strategy is a global
    row_number + a (batch_id) hash agg. The global windows ARE a
    single-partition sort at the window stage — acceptable for a
    report query on (doc_id, n_tokens) pairs (two narrow columns,
    not the corpus); the production packer (sequence_pack) shards
    first. The oracle replays both orders exactly."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", token_count(F.col("text")).alias("n_toks"))

    def waste(order_cols, name):
        w = W.partitionBy().orderBy(*order_cols)
        batched = sized.select(
            "n_toks",
            ((F.row_number().over(w) - 1) / PAD_BATCH).cast("long").alias("batch_id"),
        )
        per_batch = batched.groupBy("batch_id").agg(
            F.count("*").alias("n_seq"),
            F.sum("n_toks").alias("toks"),
            F.max("n_toks").alias("mx"),
        )
        return per_batch.agg(
            F.lit(name).alias("strategy"),
            F.count("*").alias("n_batches"),
            F.sum("toks").alias("n_tokens"),
            F.sum(F.col("mx") * F.col("n_seq") - F.col("toks")).alias("n_padding"),
            # exact integer ratio -> portable floor-round: p*100/t can
            # land exactly on a .00005 boundary (functions/precision.py)
            exact_round(
                F.sum(F.col("mx") * F.col("n_seq") - F.col("toks"))
                / F.sum(F.col("mx") * F.col("n_seq"))
                * 100,
                4,
            ).alias("waste_pct"),
        )

    naive = waste([F.col("doc_id")], "naive")
    sorted_ = waste([F.col("n_toks"), F.col("doc_id")], "length_sorted")
    return naive.unionByName(sorted_)


QUERIES["padding_waste_report"] = q_padding_waste_report

ORACLES["padding_waste_report"] = f"""
    WITH sized AS (
        SELECT doc_id, len({_SQL_TOKENS_LOWER}) AS n_toks FROM documents),
    naive AS (
        SELECT n_toks,
               (row_number() OVER (ORDER BY doc_id) - 1) // {PAD_BATCH} AS batch_id
        FROM sized),
    srt AS (
        SELECT n_toks,
               (row_number() OVER (ORDER BY n_toks, doc_id) - 1) // {PAD_BATCH} AS batch_id
        FROM sized),
    nb AS (
        SELECT batch_id, count(*) AS n_seq, sum(n_toks) AS toks, max(n_toks) AS mx
        FROM naive GROUP BY 1),
    sb AS (
        SELECT batch_id, count(*) AS n_seq, sum(n_toks) AS toks, max(n_toks) AS mx
        FROM srt GROUP BY 1)
    SELECT 'naive' AS strategy, count(*) AS n_batches,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           CAST(sum(mx * n_seq - toks) AS BIGINT) AS n_padding,
           floor(sum(mx * n_seq - toks) / sum(mx * n_seq) * 100 * 10000.0 + 0.5) / 10000.0 AS waste_pct
    FROM nb
    UNION ALL
    SELECT 'length_sorted', count(*),
           CAST(sum(toks) AS BIGINT),
           CAST(sum(mx * n_seq - toks) AS BIGINT),
           floor(sum(mx * n_seq - toks) / sum(mx * n_seq) * 100 * 10000.0 + 0.5) / 10000.0
    FROM sb
"""


def q_split_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit of the NAIVE per-doc split: per split,
    how many documents have a near-duplicate (MinHash-LSH pair, the
    dedup family's exact-verified candidate set) sitting in a
    DIFFERENT split — i.e. train/eval leakage that a per-doc hash
    split permits and split_leakage_free eliminates by construction.
    This is the measurement that justifies cluster-keyed splitting on
    a real corpus. Output: (split, n_docs, n_leaky, leaky_pct).

    Scale shape: the pair list is the already-equi-join-generated LSH
    candidate set (never all-pairs); both split lookups are scan-side
    md5 hashes riding the pair relation — two narrow joins on doc_id,
    one distinct, one count agg."""
    from osarchiver_spark.queries.dedup import (
        BANDS,
        MINHASH_THRESHOLD,
        NUM_HASHES,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_UB, "train").when(bucket < _VAL_UB, "val").otherwise("test")
    )
    splits = docs.select("doc_id", split.alias("split"))
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=NUM_HASHES, bands=BANDS, threshold=MINHASH_THRESHOLD,
    ).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    leaky = (
        edges.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("leaky", F.lit(1))
    )
    return (
        splits.join(leaky, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("leaky"), F.lit(0))).alias("n_leaky"),
            # exact integer ratio -> portable floor-round (boundary-
            # safe across engines, functions/precision.py)
            exact_round(
                F.sum(F.coalesce(F.col("leaky"), F.lit(0))) / F.count("*") * 100, 4
            ).alias("leaky_pct"),
        )
    )


QUERIES["split_contamination_report"] = q_split_contamination_report


def _contamination_oracle() -> str:
    from osarchiver_spark.queries.dedup import ORACLES as _DEDUP_ORACLES

    pairs_sql = _DEDUP_ORACLES["dedup_minhash_lsh"]
    return f"""
        WITH pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
        splits AS (
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_UB}'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_UB}'
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents),
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs),
        leaky AS (
            SELECT DISTINCT e.doc_a AS doc_id
            FROM edges e
            JOIN splits x ON e.doc_a = x.doc_id
            JOIN splits y ON e.doc_b = y.doc_id
            WHERE x.split <> y.split)
        SELECT s.split, count(*) AS n_docs,
               CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_leaky,
               floor(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                     / count(*) * 100 * 10000.0 + 0.5) / 10000.0 AS leaky_pct
        FROM splits s LEFT JOIN leaky l USING (doc_id)
        GROUP BY s.split
    """


ORACLES["split_contamination_report"] = _contamination_oracle()
