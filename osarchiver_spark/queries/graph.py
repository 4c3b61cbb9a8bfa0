"""Graph-analytics queries (north-star extension): PageRank over the
customer <-> supplier trade graph.

The oracle mirrors the power iteration step-for-step as chained CTEs
— same teleport expression, same float op order per term — so the
value-hash matches digit-for-digit after the shared 9-dp rounding
(ranks are ~1/N; cross-engine summation noise sits ~1e-15 relative,
far below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osarchiver_spark.operators.graph import DAMPING, ITERATIONS, pagerank, trade_graph_edges
from osarchiver_spark.sources.parquet import load_table


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations) over the
    undirected customer<->supplier graph induced by orders ⋈
    lineitem. See operators/graph.py for the scale contract."""
    edges = trade_graph_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    ranks = pagerank(edges)
    # ranks were computed on integer node ids; render the display form
    # (c<custkey> / s<suppkey>) only here, after all shuffles
    label = F.when(
        F.col("node") > 0, F.concat(F.lit("c"), (F.col("node") - 1).cast("string"))
    ).otherwise(F.concat(F.lit("s"), (-F.col("node") - 1).cast("string")))
    return ranks.select(label.alias("node"), F.round("rank", 9).alias("pr"))


def _pagerank_sql() -> str:
    d = DAMPING
    prev = "r0"
    iters = []
    for i in range(1, ITERATIONS + 1):
        iters.append(
            f"""r{i} AS (
            SELECT e.dst AS node,
                   (1.0 - {d}) / (SELECT n FROM nn) + {d} * sum(r.pr / dg.deg) AS pr
            FROM edges e
            JOIN {prev} r ON e.src = r.node
            JOIN deg dg ON dg.src = e.src
            GROUP BY e.dst)"""
        )
        prev = f"r{i}"
    chain = ",\n        ".join(iters)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT o_custkey + 1 AS src, -(l_suppkey + 1) AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT src, dst FROM pairs
                  UNION ALL SELECT dst, src FROM pairs),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
        {chain}
        SELECT CASE WHEN node > 0 THEN 'c' || CAST(node - 1 AS VARCHAR)
                    ELSE 's' || CAST(-node - 1 AS VARCHAR) END AS node,
               round(pr, 9) AS pr
        FROM {prev}
    """


QUERIES = {
    "pagerank": q_pagerank,
}

ORACLES = {
    "pagerank": _pagerank_sql(),
}
