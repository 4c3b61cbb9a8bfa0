"""Firing-behaviour tests for the training-data pipeline queries whose
fixture runs are degenerate (the synthetic corpus is digit-free, so
pii_scrub redacts nothing there) plus distribution checks for the
mix-sampling and centroid queries. Oracle parity for all of these runs
separately in test_oracle_parity.py."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from osarchiver_spark.functions.text import PII_EMAIL, PII_IPV4, PII_PHONE
from osarchiver_spark.queries.sampling import q_domain_mix_sample
from osarchiver_spark.queries.similarity import q_label_centroids
from osarchiver_spark.queries.text import q_pii_scrub, q_unigram_logprob
from osarchiver_spark.sources.parquet import load_table


def test_pii_scrub_redacts_synthetic_pii(spark, sf_small, tmp_path, monkeypatch):
    rows = [
        (1, "contact alice@example.com or bob.smith+x@sub.example.org today"),
        (2, "server at 10.0.42.7 answered, backup at 192.168.0.1"),
        (3, "call +4915123456789 or 0800123456 now"),
        (4, "no personal data here at all"),
        (5, "mix: eve@corp.io from 172.16.0.3 dialed 5551234567"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    t1 = F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    scrubbed = df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(PII_IPV4), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.regexp_replace(t2, PII_PHONE, "<PHONE>").alias("clean_text"),
    )
    got = {r["doc_id"]: r for r in scrubbed.collect()}
    assert got[1]["n_emails"] == 2 and "<EMAIL>" in got[1]["clean_text"]
    assert "alice" not in got[1]["clean_text"].replace("alice@example.com", "")
    assert got[2]["n_ips"] == 2 and got[2]["clean_text"].count("<IP>") == 2
    assert got[3]["n_phones"] == 2 and got[3]["clean_text"].count("<PHONE>") == 2
    assert got[4]["clean_text"] == "no personal data here at all"
    assert (got[5]["n_emails"], got[5]["n_ips"], got[5]["n_phones"]) == (1, 1, 1)
    # ordering: the IP's digit runs must not be re-matched as phones
    assert "<IP>" in got[5]["clean_text"] and "<PHONE>" in got[5]["clean_text"]

    # the fixture corpus is digit- and @-free: the registered query
    # must be a no-op there (clean_text == text, zero counts)
    q = q_pii_scrub(spark, sf_small)
    assert q.filter("n_emails + n_ips + n_phones > 0").count() == 0


def test_domain_mix_sample_hits_target_fractions(spark, sf_medium):
    kept = q_domain_mix_sample(spark, sf_medium)
    docs = load_table(spark, sf_medium, "documents")
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {
        (r["source"], r["keep_frac"]): r["n"]
        for r in kept.groupBy("source", "keep_frac").agg(F.count("*").alias("n")).collect()
    }
    for (source, frac), n in got.items():
        k = int("".join(c for c in source if c.isdigit()))
        assert frac == (k % 4 + 1) / 4.0
        if frac == 1.0:  # keep-all sources must survive intact
            assert n == totals[source]
        else:  # md5-uniform: binomial around frac (25 docs/source at sf0.01)
            assert abs(n / totals[source] - frac) < 0.35
    # determinism: a re-run and a repartitioned run keep identical ids
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in q_domain_mix_sample(spark, sf_medium).repartition(7).collect()
    )
    assert a == b


def test_label_centroids_match_numpy(spark, sf_small):
    got = q_label_centroids(spark, sf_small).collect()
    emb = load_table(spark, sf_small, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(np.asarray(r["embedding"], dtype=np.float64))
    for row in got:
        vecs = by_label[row["label"]]
        assert row["n_vecs"] == len(vecs)
        expect = float(np.mean([v[row["dim"]] for v in vecs]))
        assert math.isclose(row["centroid"], round(expect, 6), abs_tol=1e-6)
    dims = {r["dim"] for r in got}
    assert dims == set(range(64))


def test_unigram_logprob_orders_rare_below_common(spark, sf_small):
    scored = {r["doc_id"]: r["avg_logprob"] for r in q_unigram_logprob(spark, sf_small).collect()}
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text").collect()
    # every score is a mean of log10(p<=1) -> non-positive
    assert all(s <= 0 for s in scored.values())
    # cross-check one document end-to-end against a python count
    from collections import Counter

    counts: Counter = Counter()
    for r in docs:
        counts.update(r["text"].lower().split())
    total = sum(counts.values())
    r0 = docs[0]
    toks = r0["text"].lower().split()
    expect = sum(math.log10(counts[t] / total) for t in toks) / len(toks)
    assert math.isclose(scored[r0["doc_id"]], round(expect, 4), abs_tol=2e-4)


def test_sequence_pack_invariants(spark, sf_medium):
    from osarchiver_spark.queries.sampling import N_SHARDS, SEQ_LEN, q_sequence_pack

    rows = q_sequence_pack(spark, sf_medium).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["offset"] < SEQ_LEN
        assert r["shard"] == r["doc_id"] % N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(N_SHARDS))
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        # contiguity: each doc starts exactly where the previous ended
        pos = 0
        for r in shard_rows:
            assert r["seq_id"] * SEQ_LEN + r["offset"] == pos
            end_seq = (pos + r["n_slots"] - 1) // SEQ_LEN
            assert r["spans_boundary"] == (end_seq > r["seq_id"])
            pos += r["n_slots"]


def test_repeated_span_report_finds_planted_passage(spark):
    from osarchiver_spark.operators.dedup import repeated_span_report

    boiler = "All rights reserved. Redistribution of this document requires written permission from the publisher. " * 2
    rows = [
        (1, "unique prefix one " * 10 + boiler + "unique suffix one " * 10),
        (2, "different opening text " * 12 + boiler + "другой хвост " * 8),
        (3, "this document shares nothing with the others " * 12),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = repeated_span_report(df, "doc_id", "text", window=64, stride=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # the un-shared doc reports nothing
    assert 3 not in by_doc
    # docs 1 and 2 each report exactly one merged span covering the passage
    for doc, text in ((1, rows[0][1]), (2, rows[1][1])):
        spans = by_doc[doc]
        assert len(spans) == 1
        s = spans[0]
        start = text.index(boiler)
        # the merged span covers the planted passage (windows are
        # strided, so edges are within one stride + window)
        assert s.span_start <= start + 16
        assert s.span_end >= start + len(boiler) - 16 - 64


def test_repeated_span_report_xxhash64_mode_matches_md5(spark):
    """Both hash modes select different positions, but ABOVE the
    recall-guarantee length (window + 2*stride + 6) detection is
    certain in either mode, so they must flag the same documents.
    (Below that length detection is anchor-dependent and the modes
    may legitimately differ — fixture docs 89/114 do.)"""
    import random

    from osarchiver_spark.operators.dedup import repeated_span_report

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    passage = "".join(rng.choice(alpha) for _ in range(140))
    mk = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    rows = [
        (1, mk(33) + passage + mk(50)),
        (2, mk(18) + passage + mk(90)),
        (3, mk(260)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    md5_docs = {
        r.doc_id
        for r in repeated_span_report(df, "doc_id", "text").select("doc_id").distinct().collect()
    }
    xx_docs = {
        r.doc_id
        for r in repeated_span_report(df, "doc_id", "text", hash_fn="xxhash64")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert md5_docs == xx_docs == {1, 2}


def test_split_leakage_free_keeps_clusters_together(spark, sf_medium):
    """The defining property: every near-dup cluster lands entirely in
    ONE split, and unclustered docs get exactly sample_split's
    assignment."""
    from osarchiver_spark.queries.sampling import q_sample_split, q_split_leakage_free

    guarded = q_split_leakage_free(spark, sf_medium)
    per_key = guarded.groupBy("split_key").agg(
        F.count_distinct("split").alias("n_splits"), F.count("*").alias("n_docs")
    )
    assert per_key.filter(F.col("n_splits") > 1).count() == 0
    # some real multi-doc clusters exist at this scale, or the guard is vacuous
    assert per_key.filter(F.col("n_docs") > 1).count() > 0

    naive = q_sample_split(spark, sf_medium).select("doc_id", F.col("split").alias("naive"))
    singles = (
        guarded.filter(F.col("split_key") == F.col("doc_id"))
        .join(naive, "doc_id")
        .filter(F.col("split") != F.col("naive"))
    )
    assert singles.count() == 0


def test_bigram_logprob_on_hand_corpus(spark):
    """Hand-checkable LM: corpus 'a b', 'a b', 'a c' => V=3,
    c(a·)=3, c(a b)=2, c(a c)=1."""
    from osarchiver_spark.queries import all_queries
    import math

    rows = [(1, "a b"), (2, "a b"), (3, "a c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # call the underlying plan through a shim sf_dir-free path: rebuild
    # the same expression stack directly
    from osarchiver_spark.functions.text import tokens

    t = tokens(F.lower(F.col("text")))
    big = df.filter(F.size(t) >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
            )
        ).alias("_p"),
    ).select("doc_id", "_p.w1", "_p.bg")
    c2 = big.groupBy("bg").agg(F.count("*").alias("n2"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("n1"))
    vocab = df.select(F.explode(t).alias("tok")).agg(F.count_distinct("tok").alias("v"))
    scored = {
        r.doc_id: r.lp
        for r in big.join(c2, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(F.log10((F.col("n2") + 1).cast("double") / (F.col("n1") + F.col("v"))))
                , 4
            ).alias("lp")
        )
        .collect()
    }
    # p(b|a) = (2+1)/(3+3) = 0.5 ; p(c|a) = (1+1)/(3+3) = 1/3
    assert scored[1] == scored[2] == round(math.log10(0.5), 4)
    assert scored[3] == round(math.log10(1 / 3), 4)


def test_weighted_sample_determinism_and_weight_dominance(spark, sf_small):
    from osarchiver_spark.queries.sampling import WEIGHTED_KEEP, q_weighted_sample

    out = q_weighted_sample(spark, sf_small)
    rows = sorted(map(tuple, out.collect()))
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= WEIGHTED_KEEP for r in per_src)
    # deterministic: a second planning/run yields the identical sample
    assert rows == sorted(map(tuple, q_weighted_sample(spark, sf_small).collect()))

    # Efraimidis-Spirakis dominance: an overwhelming weight wins rank 1
    # (key = ln(u)/w -> ~0 for huge w; a tiny-weight doc would need
    # u > exp(ln(u_heavy) * w_light / w_heavy) ~ 1 to beat it)
    heavy = spark.createDataFrame(
        [(i, "s", 5) for i in range(1, 40)] + [(99, "s", 10**9)],
        ["doc_id", "source", "n_chars"],
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        + 1
    ) / F.lit(float(1 << 32))
    key = F.log(u) / F.col("n_chars")
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(F.desc(key), F.col("doc_id"))
    top = heavy.withColumn("rk", F.row_number().over(w)).filter("rk = 1").collect()
    assert top[0].doc_id == 99
