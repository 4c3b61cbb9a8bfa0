"""A/B the r07 exact-rational quantile shape against engine
``percentile`` at sf10 (10M events) — VERDICT r07 item 6.

The exact-quantile rewrite (operators/quantiles.py) took a 1.8–2.1x
constant-factor hit at sf0.1 vs the ``percentile(value, q)`` it
replaced, justified by an architectural claim: the histogram shape
shuffles ONE ROW PER DISTINCT VALUE (then windows over the histogram)
while ``percentile`` buffers and sorts EVERY ROW per group, so the
exact shape should win — or at least stop losing — as rows-per-
distinct-value grows. This rehearsal measures that claim at 100x the
adjudicated scale, on the same events fixture the real queries read.

Three measurements, each timed twice (cold then warm), A/B pairs:

  band      A: exact_quantile_nums(event_type, cents, {p05,p95})
            B: percentile(value, [0.05, 0.95]) per event_type
  winsorize A: the registered q_winsorize_events (exact bands)
            B: the same clip topology with percentile doubles
  cardinality: distinct cents per event_type (the histogram width the
            window pass actually sees — the claimed scale bound)

Usage: python tools/rehearse_sf10_quantiles.py [SF_DIR]
Writes BENCH_SF10_QUANTILES.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osarchiver_spark.operators.quantiles import exact_quantile_nums  # noqa: E402
from osarchiver_spark.functions.precision import quantize  # noqa: E402
from osarchiver_spark.queries import all_queries  # noqa: E402
from osarchiver_spark.sources.parquet import load_table  # noqa: E402
from osarchiver_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("rehearse-sf10-quantiles")
    ev = load_table(spark, sf_dir, "events")
    evc = ev.select(
        "event_id", "event_type", "value", quantize(F.col("value"), 2).alias("c")
    )
    results: dict[str, object] = {"sf_dir": sf_dir}

    # Histogram width: the quantity the exact shape's window pass
    # scales with (percentile's buffer scales with group ROW count).
    card = (
        evc.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("c").alias("distinct_cents"),
        )
        .collect()
    )
    results["cardinality"] = {
        r["event_type"]: {"rows": r["rows"], "distinct_cents": r["distinct_cents"]}
        for r in card
    }

    def band_exact():
        return exact_quantile_nums(
            evc.select("event_type", "c"), "event_type", "c",
            {"p05": (1, 20), "p95": (19, 20)},
        ).count()

    def band_engine():
        return (
            evc.groupBy("event_type")
            .agg(F.percentile("value", F.lit([0.05, 0.95])).alias("band"))
            .count()
        )

    def winsorize_exact():
        return all_queries()["winsorize_events"](spark, sf_dir).count()

    def winsorize_engine():
        bands = evc.groupBy("event_type").agg(
            F.percentile("value", F.lit(0.05)).alias("p05"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        j = evc.join(F.broadcast(bands), "event_type")
        clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
        return j.select(
            "event_id",
            F.round(clipped, 4).alias("value_winsorized"),
            ((F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))).alias(
                "was_clipped"
            ),
        ).count()

    for label, fn in [
        ("band_exact", band_exact),
        ("band_engine_percentile", band_engine),
        ("winsorize_exact", winsorize_exact),
        ("winsorize_engine_percentile", winsorize_engine),
    ]:
        cold, n = timed(fn)
        warm, _ = timed(fn)
        results[label] = {"cold_s": cold, "warm_s": warm, "rows": n}
        print(f"{label}: cold {cold}s warm {warm}s rows {n}", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_SF10_QUANTILES.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, default=str)
    print(json.dumps(results, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
