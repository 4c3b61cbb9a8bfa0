"""End-to-end export: the written training set must agree with the
oracle-checked query twins of each stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from osarchiver_spark.operators.export import export_training_set
from osarchiver_spark.queries.sampling import q_split_leakage_free
from osarchiver_spark.queries.text import q_corpus_pipeline


def test_export_matches_query_twins_and_roundtrips(spark, sf_small, tmp_path):
    out = str(tmp_path / "train_set")
    manifest = export_training_set(spark, sf_small, out)
    m = {r.split: (r.n_docs, r.n_tokens) for r in manifest.collect()}
    assert sum(n for n, _ in m.values()) > 0

    # survivors == the oracle-checked corpus_pipeline survivor set
    expected = {r.doc_id for r in q_corpus_pipeline(spark, sf_small).collect()}
    back = {
        s: spark.read.json(f"{out}/{s}")
        for s in m
    }
    exported = set()
    for s, df in back.items():
        ids = {r.doc_id for r in df.select("doc_id").collect()}
        assert len(ids) == m[s][0]
        exported |= ids
    assert exported == expected

    # split assignment == the leakage-free split query for survivors
    guard = {
        r.doc_id: r.split
        for r in q_split_leakage_free(spark, sf_small).collect()
        if r.doc_id in expected
    }
    for s, df in back.items():
        for r in df.select("doc_id").collect():
            assert guard[r.doc_id] == s

    # re-run writes the identical membership (idempotent export)
    export_training_set(spark, sf_small, out)
    again = set()
    for s in m:
        again |= {r.doc_id for r in spark.read.json(f"{out}/{s}").collect()}
    assert again == exported


def test_cli_export_training_set(spark, sf_small, tmp_path):
    from osarchiver_spark.main import run

    out = str(tmp_path / "cli_set")
    assert run(["--export-training-set", out, "--sf-dir", sf_small]) == 0
    assert spark.read.parquet(f"{out}/manifest").count() > 0
