"""Per-query isolation profiler for the optimization rounds.

Runs the named headline queries (bench overrides applied, same as
bench.py) in ONE fresh session, each timed with the noop sink, twice
(cold-in-session + steady-state), labelled via setJobDescription, and
optionally dumps .explain("formatted") to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/profile_queries.py q1_pricing_summary approx_sketches
    python tools/profile_queries.py --plans r11 --suffix before approx_sketches
    python tools/profile_queries.py --reps 2 --all-heavy
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "knn_ivf_pq_reindexed",
    "approx_sketches",
    "knn_ivf_pq_indexed",
    "streaming_vector_maintenance",
    "knn_ivf_reindexed",
    "dedup_incremental_indexed",
    "knn_ivf_pq",
    "lr_train",
    "adaboost_train",
    "streaming_kmv",
    "sampled_percentiles",
    "pagerank",
    "streaming_incremental_rollup",
    "bpe_train",
    "dedup_simhash_multiprobe",
    "bpe_segment",
    "streaming_tumbling",
    "knn_ivf_indexed",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_tag = None
    suffix = "before"
    reps = 2
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = HEAVY if "--all-heavy" in args else [a for a in args if not a.startswith("-")]

    from bench import BENCH_OVERRIDES
    from osarchiver_spark.queries import all_queries
    from osarchiver_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("osarchiver_profile")
    registry = all_queries()
    # same warm-up as bench.py
    spark.range(1_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd  # noqa: F401

    spark.range(1_000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    for name in names:
        fn = BENCH_OVERRIDES.get(name) or registry.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        walls = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if plans_tag and rep == 0:
                plan_dir = os.path.join(REPO, "plans", plans_tag)
                os.makedirs(plan_dir, exist_ok=True)
                with open(
                    os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
            spark.catalog.clearCache()
            # same residue hygiene as bench.py: release py4j-held
            # references so checkpoint blocks free between reps
            del df
            import gc

            gc.collect()
        out[name] = walls
        print(json.dumps({name: walls}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
