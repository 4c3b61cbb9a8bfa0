"""Synthesize a larger scale-factor fixture from sf0.1 by K-fold
duplication with key remapping — the 10x/100x rehearsal data the
driver does not ship (TESTDATA.md tops out at sf0.1).

Semantics of the scale-up (chosen to preserve each operator family's
workload *shape*, not just its byte count):

- **Fact tables scale, dimensions don't** (TPC-H convention):
  orders/lineitem/events/documents/embeddings get K copies with
  remapped primary keys; region/nation/part/supplier stay 1x;
  customer scales with orders so the FK graph stays closed.
- **Per-entity history depth is preserved**: events remap user_id per
  copy, so windows/sessionization see 10x more users, not 10x-deeper
  per-user timelines (which sf10 of the real generator wouldn't
  produce either).
- **Documents become NEAR-duplicates, not exact ones**: copy k != 0
  appends a ' vK' marker token, so MinHash/SimHash/Jaccard see
  realistic near-dup clusters of size K (bucket stress for LSH)
  instead of a degenerate all-exact-dup corpus.
- **Embeddings are perturbed** in their last coordinate by k*1e-3 for
  the same reason: ANN gets K-sized near-neighbor clusters, the
  brute-force top-k stays non-trivial.
- **The time span is unchanged** (retention predicates and window
  widths keep their selectivity; only row density grows).

Usage: python tools/make_scale_fixture.py [FACTOR] [SRC] [DST]
Defaults: 10 /root/testdata/sf0.1 .scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

N_ORDERS = 150_000
N_CUST = 15_000
N_EVENTS = 100_000
N_USERS = 1_500
N_DOCS = 5_000
N_VECS = 2_000


def build(factor: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(table: str, select_sql: str, fanout: bool) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        if fanout:
            # cross join the copy index; write multi-file so Spark
            # gets file-level parallelism on the scan
            os.makedirs(out, exist_ok=True)
            con.execute(
                f"COPY ({select_sql}) TO '{out}' "
                "(FORMAT PARQUET, PER_THREAD_OUTPUT TRUE, ROW_GROUP_SIZE 262144)"
            )
        else:
            con.execute(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        print(f"  {table}: {con.execute(select_sql.replace(chr(10),' ').join(['SELECT count(*) FROM (',') t'])).fetchone()[0]} rows")

    k = f"CROSS JOIN range({factor}) r(k)"
    t = lambda name: f"read_parquet('{src}/{name}.parquet')"  # noqa: E731

    for dim in ["region", "nation", "part", "supplier"]:
        copy(dim, f"SELECT * FROM {t(dim)}", fanout=False)

    copy(
        "customer",
        f"""SELECT c_custkey + k * {N_CUST} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {t('customer')} {k}""",
        fanout=True,
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + k * {N_ORDERS} AS o_orderkey,
                   o_custkey + k * {N_CUST} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {t('orders')} {k}""",
        fanout=True,
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + k * {N_ORDERS} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM {t('lineitem')} {k}""",
        fanout=True,
    )
    copy(
        "events",
        f"""SELECT event_id + k * {N_EVENTS} AS event_id, ts,
                   user_id + k * {N_USERS} AS user_id,
                   event_type, value, props
            FROM {t('events')} {k}""",
        fanout=True,
    )
    copy(
        "documents",
        f"""SELECT doc_id + k * {N_DOCS} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE text || ' v' || CAST(k AS VARCHAR) END AS text,
                   lang, source,
                   CAST(length(CASE WHEN k = 0 THEN text
                        ELSE text || ' v' || CAST(k AS VARCHAR) END) AS BIGINT)
                       AS n_chars
            FROM {t('documents')} {k}""",
        fanout=True,
    )
    copy(
        "embeddings",
        f"""SELECT vec_id + k * {N_VECS} AS vec_id,
                   CAST(embedding[1:len(embedding)-1]
                        || [embedding[len(embedding)] + 0.001 * k]
                        AS FLOAT[]) AS embedding,
                   label
            FROM {t('embeddings')} {k}""",
        fanout=True,
    )
    con.close()


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else ".scale/sf1"
    print(f"building {factor}x of {src} -> {dst}")
    build(factor, src, dst)
