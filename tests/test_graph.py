"""PageRank (operators/graph.py) on graphs with known structure.

Oracle parity on the fixture is covered by test_oracle_parity; these
pin the algorithm's invariants on constructed graphs where the
stationary structure is known analytically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osarchiver_spark.operators.graph import pagerank, trade_graph_edges


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_sums_to_one_and_star_center_dominates(spark):
    # star: hub h connected to 4 spokes — hub must outrank every spoke,
    # spokes are symmetric (equal ranks), total mass = 1
    edges = _sym(spark, [("h", f"s{i}") for i in range(4)])
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=6).collect()}
    assert ranks["h"] == max(ranks.values())
    spoke_ranks = {v for k, v in ranks.items() if k != "h"}
    assert len(spoke_ranks) == 1  # symmetry → identical spoke ranks
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: the uniform vector is stationary, so
    # every iteration count must return exactly 1/4 per node
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    ranks = [r.rank for r in pagerank(edges, iterations=3).collect()]
    assert ranks == pytest.approx([0.25] * 4, abs=1e-12)


def test_trade_graph_edges_are_symmetrized_and_distinct(spark, sf_small):
    from osarchiver_spark.sources.parquet import load_table

    edges = trade_graph_edges(
        load_table(spark, sf_small, "orders"), load_table(spark, sf_small, "lineitem")
    )
    n = edges.count()
    assert n == edges.distinct().count()  # no duplicate edges
    # symmetry: reversing every edge yields the same set
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert edges.exceptAll(rev).count() == 0
    # bipartite prefixes
    bad = edges.filter(~F.col("src").rlike("^[cs]\\d+$")).count()
    assert bad == 0
