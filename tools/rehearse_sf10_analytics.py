"""Second 100x rehearsal wave: the relational/analytics/trainer/text
families at sf10 (60M lineitem / 10M events / 500k docs), complementing
tools/rehearse_sf10.py's dedup/ANN wave.

Purpose is scale-defect discovery, not adjudication: every query here
is already oracle-green at sf0.01; this run answers "does the PLAN
survive 100x" — shuffle sizing, window-partition width, trainer loop
cost, checkpoint volume — and records wall times so a future regression
at scale is measurable.

Usage: python tools/rehearse_sf10_analytics.py [SF_DIR]
Writes BENCH_SF10_ANALYTICS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osarchiver_spark.queries import all_queries  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402

# Ordered roughly cheap-to-expensive within family so an early failure
# in a family still leaves the rest of the board populated.
SUBSET = [
    # TPC-H relational joins/aggs on the 60M-row lineitem
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "q17_small_quantity",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "outer_join_agg",
    "distinct_agg",
    "percentiles",
    "skew_salted_join",
    "skew_salted_agg",
    # events analytics on the 10M-row timeline
    "latest_event_per_user",
    "sessionize",
    "funnel_analysis",
    "cohort_retention",
    "event_cooccurrence",
    "markov_transitions",
    "session_paths",
    "rolling_active_users",
    "time_weighted_avg",
    "winsorize_events",
    "psi_drift",
    "attribution_time_decay",
    "survival_curve",
    "point_in_time_features",
    "label_horizon",
    "ab_test_report",
    "value_histogram",
    # text / sampling / indexing over 500k documents
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "tfidf_top_terms",
    "inverted_index",
    "boilerplate_lines",
    "bm25_retrieval",
    "ngram_novelty",
    "unigram_logprob",
    "bigram_logprob",
    "token_budget_sample",
    "stratified_sample_exact",
    "sequence_pack",
    "weighted_sample",
    "quality_curriculum",
    # iterative trainers / graph
    "lr_train",
    "adaboost_train",
    "als_factors",
    "bpe_train",
    "pagerank",
    # streaming (checkpoint volume now 100x)
    "streaming_tumbling",
    "streaming_incremental_rollup",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("osarchiver_spark_sf10_analytics")
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()
    registry = all_queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    total = 0.0
    for name in SUBSET:
        fn = registry[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = dt
            total += dt
            print(f"  {name:32s} {dt:8.2f} s", flush=True)
        except Exception:
            failures[name] = traceback.format_exc()[-2000:]
            print(f"  {name:32s}   FAILED", flush=True)
        spark.catalog.clearCache()
    out = {
        "metric": "osarchiver_spark sf10 rehearsal (relational/analytics/trainers)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "failures": sorted(failures),
        "sf": 10.0,
    }
    print(json.dumps(out))
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "BENCH_SF10_ANALYTICS.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    for name, tb in failures.items():
        print(f"\n=== {name} ===\n{tb}")


if __name__ == "__main__":
    main()
