"""Differential parity for the tokenization primitives.

A dozen oracles assume `functions/text.py::tokens` and the SQL
fragment `list_filter(regexp_split_to_array(trim(text),'\\s+'), ...)`
agree byte-for-byte, and likewise for shingles and the normalized
fingerprint. The fixtures only contain plain ASCII words; this test
feeds 300 seeded-random adversarial strings (unicode letters, mixed
whitespace runs, tabs/newlines, empty/blank, repeated tokens) through
BOTH engines and compares elementwise."""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from osarchiver_spark.functions.text import normalized_fingerprint, tokens, word_shingles

_ALPHABETS = [
    string.ascii_lowercase,
    string.ascii_uppercase + string.digits,
    "äöüßéèñç",
    "жзиклмн",
    "点线面体积",
    ".,;:!?()[]#@$%",
]
_WS = [" ", "  ", "\t", "\n", " \t ", "\r\n", "   "]


def _random_text(rng: random.Random) -> str:
    n = rng.randint(0, 12)
    parts = []
    for _ in range(n):
        alpha = rng.choice(_ALPHABETS)
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        parts.append(word)
        parts.append(rng.choice(_WS))
    if rng.random() < 0.3:
        parts.insert(0, rng.choice(_WS))
    return "".join(parts)


def test_tokens_shingles_fingerprint_match_duckdb(spark):
    rng = random.Random(20260813)
    rows = [(i, _random_text(rng)) for i in range(300)]
    rows += [(1000, ""), (1001, "   "), (1002, "a"), (1003, "x y"), (1004, "a  b\tc\nd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["toks"], r["sh"], r["fp"])
        for r in df.select(
            "doc_id",
            tokens(F.col("text")).alias("toks"),
            word_shingles(F.col("text"), 3).alias("sh"),
            normalized_fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    sql_toks = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"
    sql_sh = f"""
        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       for i in range(1, greatest(len(toks) - 2, 0) + 1)])
    """
    expect = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"""
            WITH t AS (SELECT doc_id, text, {sql_toks} AS toks FROM docs)
            SELECT doc_id, toks, {sql_sh} AS sh,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM t
            """
        ).fetchall()
    }
    assert set(got) == set(expect)
    for doc_id in got:
        g_t, g_s, g_f = got[doc_id]
        e_t, e_s, e_f = expect[doc_id]
        assert g_t == e_t, f"tokens diverge for {doc_id}: {g_t} vs {e_t}"
        assert sorted(g_s) == sorted(e_s), f"shingles diverge for {doc_id}"
        assert g_f == e_f, f"fingerprint diverges for {doc_id}"
