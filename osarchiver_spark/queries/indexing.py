"""Corpus-structure queries (north-star extension): CCNet-style
boilerplate-line removal and an inverted index — the two
"structure the corpus by its repeated content" operators a training
pipeline runs between raw ingest and dedup.

The fixture corpus has no newline structure, so "lines" are
fixed 8-token windows (same normalization as the chunker in
operators/chunking.py — the algorithm is identical when real
newlines exist: hash the unit, count distinct documents per unit,
drop units above the share threshold, reassemble).

Scale design:

- ``boilerplate_lines``: tokenize + window inside one codegen'd
  projection (no explode-then-regroup for line assembly — the line
  array is built per row with higher-order functions, so assembly
  costs zero shuffles). The only shuffles are the line-frequency
  count (map-combinable) and the doc reassembly agg. The frequent
  set is joined back by line hash — an equi-join that AQE can
  broadcast when the boilerplate set is small (the common case).
- ``inverted_index``: (term, doc) partial counts combine map-side;
  postings are truncated to the top 8 documents per term *before*
  any per-term list is materialized (window row_number, then a
  bounded sort_array/collect), so a 100 TB stop-word posting list
  never concentrates in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osarchiver_spark.functions.precision import exact_round
from osarchiver_spark.functions.text import tokens
from osarchiver_spark.sources.parquet import load_table

LINE_TOKENS = 8
BOILER_MIN_DOCS = 2  # fixture-scale; production: a corpus-share threshold
POSTINGS_PER_TERM = 8

_SQL_TOKENS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"


def _doc_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, line_no, line): non-overlapping LINE_TOKENS-token
    windows, assembled row-locally (no shuffle). Docs with zero
    tokens yield zero lines (mirrors the oracle, where empty docs
    produce no token rows)."""
    toks = tokens(F.lower(F.col("text")))
    n_lines = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "),
    )
    return docs.filter(F.size(toks) > 0).select(
        "doc_id", F.posexplode(lines_arr).alias("line_no", "line")
    )


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate report + cleaned text: a line is
    boilerplate when it occurs in >= BOILER_MIN_DOCS distinct
    documents; the cleaned text is the in-order concatenation of the
    surviving lines (order restored by sort_array over (line_no,
    line) structs — deterministic under any partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    # both the frequency count and the flag-back join consume the
    # exploded lines; cache so tokenize+window runs once (CCNet's
    # two passes over the same materialized line table) — transient so
    # the blocks release when the returned report is dropped
    from osarchiver_spark.operators.cache import transient

    lines = transient(_doc_lines(docs))
    freq = lines.groupBy("line").agg(F.count_distinct("doc_id").alias("nd"))
    # NOTE (measured, sf10): joining back a filtered nd>=threshold
    # subset as a LEFT join reads as the obvious optimization — on a
    # real corpus the boiler subset is tiny and AQE broadcasts it —
    # but on the K-fold rehearsal fixture EVERY line is boilerplate
    # (100-wide duplicate clusters), the "subset" is all distinct
    # lines, and the variant measured 75.8 s vs 40.8 s for this
    # shuffle join. A collect_list-per-line single-shuffle form was
    # also rejected: a universally repeated line at 100 TB becomes
    # one unbounded in-memory array (the hot-bucket hazard this repo
    # gates everywhere else).
    flagged = lines.join(freq, "line").withColumn(
        "is_boiler", (F.col("nd") >= BOILER_MIN_DOCS).cast("int")
    )
    kept_struct = F.when(
        F.col("is_boiler") == 0, F.struct(F.col("line_no"), F.col("line"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum("is_boiler").alias("n_boiler"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            " ",
        ).alias("clean_text"),
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term -> (document frequency, collection frequency, top-8
    postings by tf desc / doc_id asc, comma-joined)."""
    docs = load_table(spark, sf_dir, "documents")
    # df/cf stats and the top-k ranking both read the tf relation;
    # cache (transient, auto-released) so tokenize+explode+first-agg
    # runs once
    from osarchiver_spark.operators.cache import transient

    tf = transient(
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col("doc_id"))
    top = tf.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= POSTINGS_PER_TERM
    )
    postings = top.groupBy("token").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "doc_id"))),
                lambda s: s["doc_id"].cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    return stats.join(postings, "token").select("token", "df", "cf", "postings")


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# query terms: df-rank 11..15 (ties by token) — high-df enough to hit
# many documents, past the stop-word head where rankings are flat
BM25_TERM_LO, BM25_TERM_HI = 11, 15


def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: the top-10 documents for each of five
    corpus-derived query terms — the retrieval half of the inverted
    index (Robertson/Sparck-Jones BM25, the classic probabilistic
    ranking function; public formula, k1=1.2 b=0.75).

    score(t, D) = idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*|D|/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)). idf and the final score are
    rounded to 6 decimals on BOTH engines (ln noise discipline), and
    the top-k window orders by the ROUNDED score desc, doc_id asc, so
    the ranking is engine-identical.

    Scale shape: one tokenize+explode into a map-combinable (term,
    doc) tf agg; doc lengths ride the same pass via a per-doc agg;
    N/avgdl is a one-row broadcast; the 5-term query relation is a
    broadcast semi-filter, so the scoring scan touches only matching
    postings; the only wide shuffle is the tf groupBy. The top-k
    window truncates per term BEFORE any collect."""
    tf, dl, corpus, qterms = _bm25_parts(spark, sf_dir)
    return _bm25_ranking(tf, dl, corpus, qterms)


def _bm25_parts(spark: SparkSession, sf_dir: str):
    """The shared retrieval stage (tf / dl / corpus stats / query
    terms) consumed by both the BM25 ranking and rrf_fusion's density
    ranking — the transient tf cache means one tokenize+explode+
    groupBy shuffle feeds every consumer (the psi_probs shared-stage
    pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    from osarchiver_spark.operators.cache import transient

    tf = transient(
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    drank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("df").desc(), F.col("token"))
    )
    qterms = (
        df_.select("token", "df", drank.alias("drank"))
        .filter(F.col("drank").between(BM25_TERM_LO, BM25_TERM_HI))
        .drop("drank")
    )
    return tf, dl, corpus, qterms


def _bm25_ranking(tf, dl, corpus, qterms) -> DataFrame:
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.round(
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    # portable floor-round: idf is an exact 1e-6 multiple, so the
    # score is rational and CAN land exactly on a .5e-6 boundary,
    # where decimal round() diverges across engines (precision.py)
    score = exact_round(
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    w = Window.partitionBy("token").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.select("token", "doc_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("token", F.col("rank").cast("int").alias("rank"), "doc_id", "score")
    )


RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack et
# al.'s k=60 — public formula: score = sum over rankers of 1/(k+rank))


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the standard way a
    pipeline merges two rankers' top-k lists without score calibration
    (rrf = Σ 1/(k+rank), k=60; a document missing from one list simply
    contributes nothing). Fuses the BM25 ranking with a TF-density
    ranker (tf/|D| — a deliberately different lexical signal, so the
    fused order is non-trivial) for the same five corpus-derived query
    terms. In production the second list is typically the dense-ANN
    top-k (knn_* over an embedding of the query); RRF is
    ranker-agnostic, which is exactly why it is registered on two
    rankings whose exact SQL twins both already exist. Both rankers
    read the SAME shared stage (_bm25_parts: one cached tf shuffle),
    so fusion adds no second corpus tokenize.

    Float discipline: 1/(60+rank) is one correctly-rounded IEEE
    division per ranker and ONE addition — deterministic cross-engine
    with no rounding needed. Scale shape: both rankers' top-k lists
    are window-truncated per term BEFORE the fusion join, so the
    fused relation is ≤ 2·topk rows per query term regardless of
    corpus size."""
    tf, dl, corpus, qterms = _bm25_parts(spark, sf_dir)
    bm25 = _bm25_ranking(tf, dl, corpus, qterms).select(
        "token", "doc_id", F.col("rank").alias("rank_a")
    )
    dens = (
        tf.join(F.broadcast(qterms.select("token")), "token")
        .join(dl, "doc_id")
        .select(
            "token", "doc_id",
            (F.col("tf").cast("double") / F.col("dl").cast("double")).alias("dens"),
        )
    )
    wb = Window.partitionBy("token").orderBy(F.col("dens").desc(), F.col("doc_id"))
    ranked_b = (
        dens.withColumn("rank_b", F.row_number().over(wb))
        .filter(F.col("rank_b") <= BM25_TOPK)
        .select("token", "doc_id", "rank_b")
    )

    fused = bm25.join(ranked_b, ["token", "doc_id"], "full_outer").select(
        "token",
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_b")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    wf = Window.partitionBy("token").orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return fused.select(
        "token",
        F.row_number().over(wf).cast("int").alias("rank"),
        "doc_id",
        "rrf_score",
    )


QUERIES = {
    "boilerplate_lines": q_boilerplate_lines,
    "inverted_index": q_inverted_index,
    "bm25_retrieval": q_bm25_retrieval,
    "rrf_fusion": q_rrf_fusion,
}

ORACLES = {
    "boilerplate_lines": f"""
        WITH d AS (
            SELECT doc_id, {_SQL_TOKENS_LOWER} AS toks FROM documents),
        tok AS (
            SELECT doc_id, generate_subscripts(toks, 1) AS ord, unnest(toks) AS token
            FROM d),
        lines AS (
            SELECT doc_id, CAST((ord - 1) // {LINE_TOKENS} AS INT) AS line_no,
                   string_agg(token, ' ' ORDER BY ord) AS line
            FROM tok GROUP BY 1, 2),
        freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY 1),
        flagged AS (
            SELECT l.doc_id, l.line_no, l.line,
                   CASE WHEN f.nd >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END AS is_boiler
            FROM lines l JOIN freq f ON l.line = f.line)
        SELECT doc_id, count(*) AS n_lines,
               CAST(sum(is_boiler) AS BIGINT) AS n_boiler,
               coalesce(string_agg(line, ' ' ORDER BY line_no)
                            FILTER (WHERE is_boiler = 0), '') AS clean_text
        FROM flagged GROUP BY doc_id
    """,
    "inverted_index": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_SQL_TOKENS_LOWER}) AS token FROM documents),
        tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        stats AS (
            SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
            FROM tf GROUP BY 1),
        rk AS (
            SELECT token, doc_id, tf,
                   row_number() OVER (PARTITION BY token
                                      ORDER BY tf DESC, doc_id) AS rn
            FROM tf),
        postings AS (
            SELECT token,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS postings
            FROM rk WHERE rn <= {POSTINGS_PER_TERM} GROUP BY 1)
        SELECT s.token, s.df, s.cf, p.postings
        FROM stats s JOIN postings p ON s.token = p.token
    """,
    "bm25_retrieval": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_SQL_TOKENS_LOWER}) AS token FROM documents),
        tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        qterms AS (
            SELECT token, df FROM (
                SELECT token, df,
                       row_number() OVER (ORDER BY df DESC, token) AS drank
                FROM dfreq)
            WHERE drank BETWEEN {BM25_TERM_LO} AND {BM25_TERM_HI}),
        scored AS (
            SELECT t.token, t.doc_id,
                   floor(round(ln(1.0 + (c.n_docs - q.df + 0.5) / (q.df + 0.5)), 6)
                         * (t.tf * ({BM25_K1} + 1.0))
                         / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                                                + {BM25_B} * d.dl / c.avgdl))
                         * 1000000.0 + 0.5) / 1000000.0 AS score
            FROM tf t
            JOIN qterms q ON t.token = q.token
            JOIN dl d ON t.doc_id = d.doc_id
            CROSS JOIN corpus c)
        SELECT token, CAST(rank AS INT) AS rank, doc_id, score FROM (
            SELECT token, doc_id, score,
                   row_number() OVER (PARTITION BY token
                                      ORDER BY score DESC, doc_id) AS rank
            FROM scored)
        WHERE rank <= {BM25_TOPK}
    """,
}


# RRF oracle: the bm25 oracle rides in whole as a CTE; the density
# ranker re-derives tf/dl/qterms (same CTE shapes); the fusion is one
# full outer join + one IEEE division per side + one addition — no
# rounding needed (see q_rrf_fusion).
ORACLES["rrf_fusion"] = f"""
    WITH bm25 AS ({ORACLES["bm25_retrieval"]}),
    tok2 AS (
        SELECT doc_id, unnest({_SQL_TOKENS_LOWER}) AS token FROM documents),
    tf2 AS (SELECT token, doc_id, count(*) AS tf FROM tok2 GROUP BY 1, 2),
    dl2 AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf2 GROUP BY 1),
    dfreq2 AS (SELECT token, count(*) AS df FROM tf2 GROUP BY 1),
    qterms2 AS (
        SELECT token FROM (
            SELECT token, row_number() OVER (ORDER BY df DESC, token) AS drank
            FROM dfreq2)
        WHERE drank BETWEEN {BM25_TERM_LO} AND {BM25_TERM_HI}),
    dens AS (
        SELECT t.token, t.doc_id,
               CAST(t.tf AS DOUBLE) / CAST(d.dl AS DOUBLE) AS dens
        FROM tf2 t
        JOIN qterms2 q ON t.token = q.token
        JOIN dl2 d ON t.doc_id = d.doc_id),
    brank AS (
        SELECT token, doc_id, rank_b FROM (
            SELECT token, doc_id,
                   row_number() OVER (PARTITION BY token
                                      ORDER BY dens DESC, doc_id) AS rank_b
            FROM dens)
        WHERE rank_b <= {BM25_TOPK}),
    fused AS (
        SELECT coalesce(a.token, b.token) AS token,
               coalesce(a.doc_id, b.doc_id) AS doc_id,
               coalesce(1.0 / ({RRF_K} + a.rank), 0)
                 + coalesce(1.0 / ({RRF_K} + b.rank_b), 0) AS rrf_score
        FROM bm25 a
        FULL OUTER JOIN brank b ON a.token = b.token AND a.doc_id = b.doc_id)
    SELECT token,
           CAST(row_number() OVER (PARTITION BY token
                                   ORDER BY rrf_score DESC, doc_id) AS INT) AS rank,
           doc_id, rrf_score
    FROM fused
"""
