"""Document chunking: the built-in (codegen) chunker is the scale
path; the Python UDTF twin pins the §2.10 table-function surface to
identical output, and chunks must reassemble to the original text."""

from __future__ import annotations

from collections import defaultdict

from osarchiver_spark.operators.chunking import (
    CHUNK_STEP,
    chunk_documents,
    chunk_documents_udtf,
)
from osarchiver_spark.sources.parquet import load_table


def test_udtf_chunker_matches_builtin(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    builtin = sorted(map(tuple, chunk_documents(docs, "doc_id", "text").collect()))
    udtf = sorted(map(tuple, chunk_documents_udtf(docs, "doc_id", "text").collect()))
    assert builtin == udtf
    assert builtin, "fixture should produce chunks"


def test_chunks_reassemble_to_document(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    originals = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    by_doc = defaultdict(list)
    for r in chunk_documents(docs, "doc_id", "text").collect():
        by_doc[r.doc_id].append((r.start, r.chunk))
    assert set(by_doc) == set(originals)
    for doc_id, parts in by_doc.items():
        parts.sort()
        # the non-overlapping prefix of each chunk tiles the document
        rebuilt = "".join(c[:CHUNK_STEP] for _, c in parts[:-1]) + parts[-1][1]
        assert rebuilt == originals[doc_id], doc_id
