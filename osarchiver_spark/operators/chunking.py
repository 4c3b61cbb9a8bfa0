"""Document chunking — fixed-size overlapping character windows, the
standard pre-tokenization step of an LLM training / RAG ingestion
pipeline (SURVEY §2.10 UDTF surface + north-star text family).

Two implementations with identical output:

- ``chunk_documents``: pure built-ins (sequence → explode →
  substring), whole-stage codegen, no Python — the 100 TB path. The
  explode multiplies rows ~len/step× but never widens beyond one
  chunk per output row, so memory per task stays bounded and no
  shuffle is introduced (chunking is embarrassingly parallel).
- ``chunk_documents_udtf``: the same operator as a Python UDTF
  (lateral join), demonstrating the user-extensible table-function
  surface the reference lacks entirely (its extension points are
  import-by-name backend plugins, osarchiver/common/__init__.py:11-28).
  Arrow-batched, but still Python-per-row — kept as the API example,
  not the hot path; tests pin equality with the built-in form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_CHARS = 400
CHUNK_STEP = 300  # chunk_chars - overlap (100-char overlap)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = CHUNK_CHARS,
    step: int = CHUNK_STEP,
) -> DataFrame:
    """Overlapping character-window chunks per document.

    Output: (doc_id, chunk_id, start, chunk) — start is 1-based so
    the DuckDB oracle (generate_series + substr) reproduces it
    verbatim; empty documents yield one empty chunk, keeping every
    doc represented downstream."""
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_text"),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            (((F.col("start") - 1) / step).cast("int")).alias("chunk_id"),
            "start",
            F.substring(F.col("_text"), F.col("start"), chunk_chars).alias("chunk"),
        )
    )


def chunk_documents_udtf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The same chunker via the Python UDTF surface (lateral join).

    Fixed CHUNK_CHARS/CHUNK_STEP (UDTF classes take column args, not
    closures); equality with chunk_documents is pinned in
    tests/test_chunking.py."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, start int, chunk string")
    class ChunkText:
        def eval(self, text: str):
            text = text or ""
            for start in range(1, max(len(text), 1) + 1, CHUNK_STEP):
                yield (
                    (start - 1) // CHUNK_STEP,
                    start,
                    text[start - 1 : start - 1 + CHUNK_CHARS],
                )

    spark = df.sparkSession
    spark.udtf.register("chunk_text", ChunkText)
    df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "_chunk_input"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.start, c.chunk "
        "FROM _chunk_input d, LATERAL chunk_text(d.text) c"
    )
