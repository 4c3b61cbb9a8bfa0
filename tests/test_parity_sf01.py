"""Oracle parity at BENCH scale (sf0.1) for the heavy queries.

The driver's correctness gate runs at sf0.01; this sweep re-checks the
expensive plans at 10× that, catching anything scale-sensitive
(rounding drift on bigger sums, recall of swept LSH parameters,
window-frame edge cases on longer partitions). ~7 min wall, so it only
runs when SPARK_GRAFT_SLOW=1 (round 3 ran it green on 2026-08-13)."""

from __future__ import annotations

import os

import pytest

from osarchiver_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare_query

HEAVY = [
    "q1_pricing_summary",
    "q9_product_profit",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "session_window",
    "tfidf_top_terms",
    "contamination_check",
    "sequence_pack",
    "unigram_logprob",
    "knn_bruteforce",
    "dedup_incremental",
    "hashed_features",
    "gapfill_hourly",
    "domain_upsample",
    "restore_candidates",
    "scd2_history",
    "streaming_outer_interval_join",
    "funnel_analysis",
    "cohort_retention",
    "dedup_substring_spans",
    "event_cooccurrence",
    "rolling_active_users",
    "source_overlap",
    "source_divergence",
    "bpe_merge_step",
    "embedding_quantization",
    "cdc_apply",
    "incremental_rollup",
    "time_weighted_avg",
    "zorder_locality",
    "snapshot_diff",
    # round-5: every query hardened with the fixed-point discipline
    # (functions/precision.py) re-checked at 10x the driver's scale
    "psi_drift",
    "token_budget_sample",
    "zscore_outliers",
    "ab_test_report",
    "survival_curve",
    "attribution_time_decay",
    "quantile_normalize",
    "point_in_time_features",
    "embedding_outliers",
    "padding_waste_report",
    "split_contamination_report",
    "ngram_novelty",
    "lang_confusion",
    "bm25_retrieval",
]

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="sf0.1 parity sweep is slow; set SPARK_GRAFT_SLOW=1",
)


@pytest.mark.parametrize("name", HEAVY)
def test_sf01_parity(spark, name):
    compare_query(spark, name, all_queries()[name], all_oracles()[name], "/root/testdata/sf0.1")
