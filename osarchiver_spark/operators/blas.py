"""Shared Arrow/BLAS scoring kernel for ANN operators.

Dense per-row linear algebra is the sanctioned Pandas case: the JVM
higher-order-function cosine evaluates interpreted outside
whole-stage codegen, which benches 3-4× slower than one matmul per
group (see operators/ivf.py and the round-1 dedup_embedding
measurement). This module holds the one cogroup scorer both IVF and
hyperplane-LSH re-ranking share.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def vec_matrix(series: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype="float64") for v in series.to_numpy()])


def cosine_pair_schema(id_type: T.DataType) -> T.StructType:
    """Output schema keyed on the CALLER's id type — string/uuid doc
    ids ride through the Arrow path unchanged (no silent long cast)."""
    return T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )


def cogroup_topk_cosine(queries: DataFrame, corpus: DataFrame, key: str, k: int) -> DataFrame:
    """Per-``key`` group BLAS re-rank: for every key group, score the
    group's queries (columns query_id, qv) against the group's corpus
    members (columns neighbor_id, v) with one matmul and emit each
    query's local top-(k+1) by (rounded cosine desc, neighbor_id asc),
    self-matches dropped. Only candidate IDS leave Python; the caller
    finishes with a global window (top-k selection is associative
    under the same ordering, so group-local pre-selection is exact).
    """
    take = k + 1  # headroom for the self-match row
    id_type = queries.schema["query_id"].dataType

    def score_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # empty cogroup sides arrive column-less
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    "neighbor_id": pd.Series([], dtype=object),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        Q = vec_matrix(left["qv"])
        V = vec_matrix(right["v"])
        qn = np.sqrt((Q * Q).sum(axis=1))
        vn = np.sqrt((V * V).sum(axis=1))
        qn = np.where(qn > 0, qn, np.inf)  # zero-norm -> cosine 0, like vectors.cosine
        vn = np.where(vn > 0, vn, np.inf)
        S = np.round((Q @ V.T) / np.outer(qn, vn), 6)  # n_q × n_v
        qids = left["query_id"].to_numpy()
        nids = right["neighbor_id"].to_numpy()
        n_take = min(take, S.shape[1])
        order = np.lexsort((np.broadcast_to(nids, S.shape), -S), axis=1)[:, :n_take]
        rows_q = np.repeat(qids, n_take)
        rows_n = nids[order].reshape(-1)
        rows_s = np.take_along_axis(S, order, axis=1).reshape(-1)
        keep = rows_q != rows_n
        return pd.DataFrame(
            {"query_id": rows_q[keep], "neighbor_id": rows_n[keep], "cosine": rows_s[keep]}
        )

    return (
        queries.groupBy(key)
        .cogroup(corpus.groupBy(key))
        .applyInPandas(score_group, schema=cosine_pair_schema(id_type))
    )


def cogroup_threshold_cosine(
    queries: DataFrame, corpus: DataFrame, key: str, threshold: float
) -> DataFrame:
    """Per-``key`` group BLAS THRESHOLD scorer: same cogroup/matmul
    shape as :func:`cogroup_topk_cosine`, but emits EVERY
    (query, neighbor) pair in the group with rounded cosine >=
    ``threshold`` (self-matches dropped) instead of a local top-k —
    the candidate generator for threshold dedup over a blocked/
    probed candidate space (near-dup pairs are sparse, so the output
    stays pair-shaped, never group-quadratic, at any corpus size the
    blocking keeps groups bounded)."""
    thr = float(threshold)
    id_type = queries.schema["query_id"].dataType

    def score_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    "neighbor_id": pd.Series([], dtype=object),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        Q = vec_matrix(left["qv"])
        V = vec_matrix(right["v"])
        qn = np.sqrt((Q * Q).sum(axis=1))
        vn = np.sqrt((V * V).sum(axis=1))
        qn = np.where(qn > 0, qn, np.inf)  # zero-norm -> cosine 0, like vectors.cosine
        vn = np.where(vn > 0, vn, np.inf)
        all_qids = left["query_id"].to_numpy()
        all_nids = right["neighbor_id"].to_numpy()
        # Block over the QUERY rows (same discipline as pq._adc_shortlist):
        # peak memory is block × n_v doubles instead of n_q × n_v. In
        # export_vector_store the per-cell query side is corpus-scale, so
        # the whole-group matmul's allocation grows group-quadratic — the
        # exact memory cliff the ADC scorer was rewritten to avoid. The
        # emitted pairs are identical per block (nonzero scans rows in
        # order), so output equals the unblocked form row-for-row.
        block = 256
        out_q, out_n, out_s = [], [], []
        for s in range(0, len(Q), block):
            S = np.round(
                (Q[s : s + block] @ V.T) / np.outer(qn[s : s + block], vn), 6
            )  # block × n_v
            qi, vi = np.nonzero(S >= thr)
            qids = all_qids[s + qi]
            nids = all_nids[vi]
            keep = qids != nids
            out_q.append(qids[keep])
            out_n.append(nids[keep])
            out_s.append(S[qi, vi][keep])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_s),
            }
        )

    return (
        queries.groupBy(key)
        .cogroup(corpus.groupBy(key))
        .applyInPandas(score_group, schema=cosine_pair_schema(id_type))
    )
