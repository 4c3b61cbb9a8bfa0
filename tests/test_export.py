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


def test_export_train_layout_packs_exactly_the_train_split(spark, sf_small, tmp_path):
    from osarchiver_spark.operators.export import PACK_SEQ_LEN

    out = str(tmp_path / "packed")
    export_training_set(spark, sf_small, out)
    layout = spark.read.parquet(f"{out}/train_layout")
    train_ids = {r.doc_id for r in spark.read.json(f"{out}/train").collect()}
    assert {r.doc_id for r in layout.collect()} == train_ids
    # per-shard invariants: offsets valid, starts strictly increasing in doc order
    rows = sorted(
        ((r.shard, r.doc_id, r.seq_id, r.offset, r.n_slots) for r in layout.collect())
    )
    for shard in {r[0] for r in rows}:
        start_prev = -1
        for _, _, seq_id, offset, n_slots in (r for r in rows if r[0] == shard):
            start = seq_id * PACK_SEQ_LEN + offset
            assert start > start_prev and 0 <= offset < PACK_SEQ_LEN and n_slots >= 1
            start_prev = start


def test_indexed_export_is_row_identical(spark, sf_small, tmp_path):
    """The incremental-index build (id-ordered drops probing and
    appending a persisted band index) must produce the SAME training
    set as the one-shot pair-graph build — every split's full row set,
    the packing layout, and the manifest. This is the parity claim
    that licenses the 100 TB maintenance story: a crawl pipeline can
    switch from corpus-wide re-sketching to per-drop probes without
    changing a single exported row."""
    from osarchiver_spark.operators.export import export_training_set_indexed

    out_a = str(tmp_path / "one_shot")
    out_b = str(tmp_path / "indexed")
    idx = str(tmp_path / "band_index")
    export_training_set(spark, sf_small, out_a)
    export_training_set_indexed(spark, sf_small, out_b, idx, n_batches=3)

    def rows(path, reader):
        try:
            df = reader(path)
        except Exception:
            return None  # empty split: no files written
        return sorted(tuple(r) for r in df.collect())

    for split in ("train", "val", "test"):
        a = rows(f"{out_a}/{split}", spark.read.json)
        b = rows(f"{out_b}/{split}", spark.read.json)
        assert a == b, f"split {split} diverged"
    assert rows(f"{out_a}/train_layout", spark.read.parquet) == rows(
        f"{out_b}/train_layout", spark.read.parquet
    )
    assert rows(f"{out_a}/manifest", spark.read.parquet) == rows(
        f"{out_b}/manifest", spark.read.parquet
    )
